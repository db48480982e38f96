"""SO(3)/SE(3) ops vs scipy oracle and reference semantics."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from slamtpu.ops import lie


def test_so3_exp_matches_scipy(rng):
    omegas = rng.normal(size=(32, 3))
    ours = np.asarray(lie.so3_exp(jnp.asarray(omegas)))
    oracle = Rotation.from_rotvec(omegas).as_matrix()
    np.testing.assert_allclose(ours, oracle, atol=1e-12)


def test_so3_exp_small_angle_identity():
    # Reference short-circuits below 1e-8 (bundle_adjustment.rs:15-17).
    out = np.asarray(lie.so3_exp(jnp.array([1e-12, 0.0, 0.0])))
    np.testing.assert_allclose(out, np.eye(3), atol=1e-11)


def test_so3_log_roundtrip(rng):
    # Principal range only: for |omega| > pi, log returns the wrapped
    # representative, so sample angles strictly inside (0, pi).
    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    omegas = axes * rng.uniform(1e-6, np.pi - 1e-3, size=(64, 1))
    recovered = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(omegas))))
    np.testing.assert_allclose(recovered, omegas, atol=1e-7)


def test_so3_log_near_pi():
    omega = np.array([0.0, 0.0, np.pi - 1e-7])
    recovered = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(omega))))
    np.testing.assert_allclose(recovered, omega, atol=1e-4)


def test_rotation_angle_matches_keyframe_formula(rng):
    # keyframe.rs:109-115: angle = acos(clamp((trace-1)/2)).
    omegas = rng.normal(size=(16, 3))
    rots = lie.so3_exp(jnp.asarray(omegas))
    ours = np.asarray(lie.rotation_angle(rots))
    oracle = np.linalg.norm(Rotation.from_matrix(np.asarray(rots)).as_rotvec(), axis=-1)
    np.testing.assert_allclose(ours, oracle, atol=1e-7)


def test_se3_matrix_and_inverse(rng):
    r = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
    t = rng.normal(size=3)
    m = np.asarray(lie.se3_matrix(jnp.asarray(r), jnp.asarray(t)))
    assert m.shape == (4, 4)
    np.testing.assert_allclose(m[:3, :3], r)
    np.testing.assert_allclose(m[:3, 3], t)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1])

    r_inv, t_inv = lie.se3_inverse(jnp.asarray(r), jnp.asarray(t))
    m_inv = np.asarray(lie.se3_matrix(r_inv, t_inv))
    np.testing.assert_allclose(m @ m_inv, np.eye(4), atol=1e-12)


def test_hat_antisymmetric(rng):
    w = rng.normal(size=(5, 3))
    h = np.asarray(lie.hat(jnp.asarray(w)))
    np.testing.assert_allclose(h, -np.swapaxes(h, -1, -2), atol=1e-15)
    v = rng.normal(size=(5, 3))
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", h, v), np.cross(w, v), atol=1e-12
    )
