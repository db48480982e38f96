"""CameraIntrinsics vs reference unit tests (camera.rs:54-83)."""

import jax
import jax.numpy as jnp
import numpy as np

from slamtpu import CameraIntrinsics


def test_field_values():
    cam = CameraIntrinsics(1.0, 2.0, 3.0, 4.0)
    assert (cam.fx, cam.fy, cam.cx, cam.cy) == (1.0, 2.0, 3.0, 4.0)


def test_kitti_preset():
    cam = CameraIntrinsics.kitti()
    assert cam.fx == 718.856 and cam.fy == 718.856
    assert cam.cx == 607.1928 and cam.cy == 185.2157


def test_webcam_preset():
    cam = CameraIntrinsics.webcam_vga()
    assert (cam.fx, cam.fy, cam.cx, cam.cy) == (500.0, 500.0, 320.0, 240.0)


def test_to_matrix_shape_and_values():
    cam = CameraIntrinsics.kitti()
    k = np.asarray(cam.to_matrix(jnp.float64))
    assert k.shape == (3, 3)
    np.testing.assert_allclose(
        k, [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]]
    )


def test_project_normalize_roundtrip(rng):
    cam = CameraIntrinsics.webcam_vga()
    pts = rng.uniform(0.5, 5.0, size=(100, 3))
    pix = cam.project(jnp.asarray(pts))
    norm = np.asarray(cam.normalize(pix))
    np.testing.assert_allclose(norm, pts[:, :2] / pts[:, 2:3], atol=1e-12)


def test_pytree_roundtrip_through_jit():
    cam = CameraIntrinsics.kitti()

    @jax.jit
    def use(cam, p):
        return cam.project(p)

    out = use(cam, jnp.array([[0.0, 0.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(out), [[cam.cx, cam.cy]], atol=1e-6)
