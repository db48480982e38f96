"""SO(3)/SE(3) Lie-group operations as pure jnp functions.

TPU-native replacement for the reference's `lie` module
(/root/reference/src/mapping/bundle_adjustment.rs:9-22, Rodrigues exp map) and
the 4x4 homogeneous-transform plumbing in
/root/reference/src/odometry/trajectory.rs:32-69.

Everything here is shape-polymorphic over leading batch dimensions (written for
`vmap`), branch-free (the small-angle limit is handled with `jnp.where`, not
Python control flow), and dtype-preserving so the same code runs in f32 on TPU
and f64 under x64 for reference-grade numerics.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "hat",
    "so3_exp",
    "so3_log",
    "rotation_angle",
    "se3_matrix",
    "se3_inverse",
    "rt_from_matrix",
]

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix [w]x of a 3-vector. Batched over leading dims."""
    w = jnp.asarray(w)
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega):
    """Rodrigues' formula: angle-axis vector -> rotation matrix.

    Matches the reference exp_map (bundle_adjustment.rs:13-21) including its
    identity short-circuit below 1e-8, expressed branch-free: we evaluate the
    Taylor-safe coefficients sin(t)/t and (1-cos(t))/t^2 with a guarded theta
    so the small-angle limit is exact and differentiable.
    """
    omega = jnp.asarray(omega)
    theta_sq = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta_sq)
    small = theta < _EPS
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    # sin(t)/t -> 1,  (1-cos t)/t^2 -> 1/2 as t -> 0
    a = jnp.where(small, jnp.ones_like(theta), jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(
        small,
        jnp.full_like(theta, 0.5),
        (1.0 - jnp.cos(safe_theta)) / (safe_theta * safe_theta),
    )
    w_hat = hat(omega)
    w_hat_sq = w_hat @ w_hat
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a[..., None, None] * w_hat + b[..., None, None] * w_hat_sq


def so3_log(rotation):
    """Rotation matrix -> angle-axis vector (inverse of `so3_exp`).

    Stable for small angles; for angles near pi the axis is recovered from the
    diagonal of R (standard treatment).
    """
    rotation = jnp.asarray(rotation)
    trace = jnp.trace(rotation, axis1=-2, axis2=-1)
    cos_angle = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos_angle)

    # Generic case: axis from the antisymmetric part.
    vee = jnp.stack(
        [
            rotation[..., 2, 1] - rotation[..., 1, 2],
            rotation[..., 0, 2] - rotation[..., 2, 0],
            rotation[..., 1, 0] - rotation[..., 0, 1],
        ],
        axis=-1,
    )
    small = angle < _EPS
    near_pi = jnp.pi - angle < 1e-4
    safe_sin = jnp.where(small | near_pi, jnp.ones_like(angle), jnp.sin(angle))
    generic = vee * (angle / (2.0 * safe_sin))[..., None]

    # Near pi: |axis_i| from diagonal, signs from the off-diagonal sums.
    diag = jnp.diagonal(rotation, axis1=-2, axis2=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag - cos_angle[..., None]) / (1.0 - cos_angle[..., None] + 1e-12), 0.0, None))
    signs = jnp.sign(
        jnp.stack(
            [
                rotation[..., 2, 1] - rotation[..., 1, 2],
                rotation[..., 0, 2] - rotation[..., 2, 0],
                rotation[..., 1, 0] - rotation[..., 0, 1],
            ],
            axis=-1,
        )
    )
    signs = jnp.where(signs == 0.0, 1.0, signs)
    pi_branch = axis_abs * signs * angle[..., None]

    small_branch = 0.5 * vee  # first-order: log(R) ~ vee(R - R^T)/2
    out = jnp.where(small[..., None], small_branch, generic)
    return jnp.where(near_pi[..., None], pi_branch, out)


def rotation_angle(rotation):
    """Rotation angle in radians from trace(R) = 1 + 2 cos(theta).

    Mirrors rotation_matrix_to_angle (/root/reference/src/mapping/keyframe.rs:109-115)
    including the clamp for numerical stability.
    """
    trace = jnp.trace(rotation, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def se3_matrix(rotation, translation):
    """Build a 4x4 homogeneous transform from (R, t). Batched."""
    rotation = jnp.asarray(rotation)
    translation = jnp.asarray(translation)
    batch = jnp.broadcast_shapes(rotation.shape[:-2], translation.shape[:-1])
    rotation = jnp.broadcast_to(rotation, batch + (3, 3))
    translation = jnp.broadcast_to(translation, batch + (3,))
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=top.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(rotation, translation):
    """(R, t) -> (R^T, -R^T t): invert a world->camera pose to camera->world.

    The reference does this inline when lifting triangulated points to world
    coordinates (/root/reference/examples/point_cloud.rs:522-544).
    """
    r_inv = jnp.swapaxes(rotation, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, translation)
    return r_inv, t_inv


def rt_from_matrix(transform):
    """Split a 4x4 homogeneous transform into (R, t)."""
    return transform[..., :3, :3], transform[..., :3, 3]
