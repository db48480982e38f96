"""Pinhole camera intrinsics as a JAX pytree.

TPU-native counterpart of /root/reference/src/odometry/camera.rs (struct
CameraIntrinsics, presets kitti()/webcam_vga(), to_matrix()). Registered as a
pytree so it can be closed over or passed through `jit`/`vmap` freely.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["CameraIntrinsics"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """fx/fy focal lengths and cx/cy principal point, in pixels.

    Mirrors camera.rs:5-16; presets mirror camera.rs:19-36.
    """

    fx: float
    fy: float
    cx: float
    cy: float

    @staticmethod
    def kitti() -> "CameraIntrinsics":
        """KITTI odometry grayscale left camera (camera.rs:19-26)."""
        return CameraIntrinsics(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157)

    @staticmethod
    def webcam_vga() -> "CameraIntrinsics":
        """Generic 640x480 webcam (camera.rs:29-36)."""
        return CameraIntrinsics(fx=500.0, fy=500.0, cx=320.0, cy=240.0)

    def to_matrix(self, dtype=jnp.float32):
        """3x3 calibration matrix K (camera.rs:39-51)."""
        fx, fy, cx, cy = (jnp.asarray(v, dtype=dtype) for v in (self.fx, self.fy, self.cx, self.cy))
        zero = jnp.zeros((), dtype=dtype)
        one = jnp.ones((), dtype=dtype)
        return jnp.stack(
            [
                jnp.stack([fx, zero, cx]),
                jnp.stack([zero, fy, cy]),
                jnp.stack([zero, zero, one]),
            ]
        )

    def project(self, points_cam):
        """Project camera-frame 3D points [..., 3] to pixels [..., 2].

        Same pinhole model as BundleAdjuster::project
        (/root/reference/src/mapping/bundle_adjustment.rs:85-100), but without
        the z<=0 rejection — callers apply their own cheirality masks, since
        control-flow skipping does not exist under jit.
        """
        points_cam = jnp.asarray(points_cam)
        z = points_cam[..., 2]
        u = self.fx * (points_cam[..., 0] / z) + self.cx
        v = self.fy * (points_cam[..., 1] / z) + self.cy
        return jnp.stack([u, v], axis=-1)

    def normalize(self, pixels):
        """Pixels [..., 2] -> normalized image coordinates (K^-1 applied)."""
        pixels = jnp.asarray(pixels)
        x = (pixels[..., 0] - self.cx) / self.fx
        y = (pixels[..., 1] - self.cy) / self.fy
        return jnp.stack([x, y], axis=-1)

    # pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.fx, self.fy, self.cx, self.cy), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)
