"""Two-view triangulation into map points.

TPU-native counterpart of /root/reference/src/mapping/triangulation.rs.
OpenCV's triangulate_points DLT (SVD per correspondence) becomes one batched
4x4 eigenproblem over all correspondences; the reference's per-point filters
(|w| > 1e-10 and cheirality in both cameras, triangulation.rs:126-137,186-196)
become masks. The reference declares but never enforces min_parallax_deg /
max_reproj_error (an explicit TODO, triangulation.rs:140-141) — both are
implemented here behind flags that default OFF for behavioral parity.

Poses are world-to-camera (R, t); triangulated points come out in the common
frame those poses are expressed in (triangulation.rs:91-114 semantics:
P_i = K [R_i | t_i]).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..ops.precision import f32_precision as _f32_precision
import numpy as np

from ..odometry.camera import CameraIntrinsics

__all__ = ["MapPoint", "MapPoints", "Triangulator", "triangulate_points"]


@dataclasses.dataclass
class MapPoint:
    """Eager map point mirroring triangulation.rs:12-49."""

    position: np.ndarray  # [3]
    descriptor: Optional[np.ndarray] = None  # [32] uint8
    observations: int = 1
    id: int = 0

    def add_observation(self):
        self.observations += 1


class MapPoints(NamedTuple):
    """Batched SoA map points (the jit-side representation)."""

    positions: jnp.ndarray  # [N, 3]
    descriptors: jnp.ndarray  # [N, 32] uint8 (zeros where absent)
    valid: jnp.ndarray  # [N] bool

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def _projection_matrix(intrinsics: CameraIntrinsics, rotation, translation, dtype):
    rt = jnp.concatenate(
        [jnp.asarray(rotation, dtype), jnp.asarray(translation, dtype)[..., :, None]], axis=-1
    )
    return intrinsics.to_matrix(dtype) @ rt  # [3, 4]



@_f32_precision
def triangulate_points(
    intrinsics: CameraIntrinsics,
    pose1,
    pose2,
    points1,
    points2,
    *,
    min_parallax_deg: float = 1.0,
    max_reproj_error: float = 4.0,
    enforce_parallax: bool = False,
    enforce_reproj: bool = False,
):
    """Batched DLT triangulation with the reference's acceptance masks.

    All contractions run at true f32 precision (`_f32_precision`): the DLT
    normal matrix and cheirality chains lose rank under TPU bf16-pass
    defaults, and implicit precision defaults have shifted under libtpu
    upgrades before (see ops/epipolar.py:27-45).

    pose1/pose2: (R [3,3], t [3]) world-to-camera. points1/points2: [N, 2]
    pixels. Returns (positions [N, 3], valid [N] bool).
    """
    p1 = jnp.asarray(points1)
    p2 = jnp.asarray(points2)
    dtype = p1.dtype if jnp.issubdtype(p1.dtype, jnp.floating) else jnp.float32
    p1, p2 = p1.astype(dtype), p2.astype(dtype)

    proj1 = _projection_matrix(intrinsics, pose1[0], pose1[1], dtype)
    proj2 = _projection_matrix(intrinsics, pose2[0], pose2[1], dtype)

    def rows(proj, pts):
        r0 = pts[:, 0, None] * proj[None, 2, :] - proj[None, 0, :]
        r1 = pts[:, 1, None] * proj[None, 2, :] - proj[None, 1, :]
        return jnp.stack([r0, r1], axis=1)  # [N, 2, 4]

    a = jnp.concatenate([rows(proj1, p1), rows(proj2, p2)], axis=1)  # [N, 4, 4]
    # Row normalization stabilizes the eigenproblem (cv2's SVD is scale-free).
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    ata = jnp.einsum("nij,nik->njk", a, a)
    from ..ops.epipolar import smallest_eigvec

    # block=1: the DLT system's null space is 1-D for any point with
    # parallax (unlike the 8-point refit's clustered spectrum), so
    # single-vector inverse iteration suffices — the block-3 Rayleigh-Ritz
    # chain was ~2/3 of the fused flagship's triangulation time.
    # iters=3: single-vector iteration occasionally needs one more round
    # than the block form on small-gap spectra (measured worst alignment
    # 1.4e-4 at iters=2, 1e-8 at 3; block-3 reference 4e-9).
    xh = smallest_eigvec(ata, block=1, iters=3)  # [N, 4] null direction

    w = xh[:, 3]
    w_ok = jnp.abs(w) > 1e-10  # triangulation.rs:126-128
    w_safe = jnp.where(w_ok, w, 1.0)
    xyz = xh[:, :3] / w_safe[:, None]

    def cam_z(pose, pts):
        return jnp.einsum("ij,nj->ni", jnp.asarray(pose[0], dtype), pts)[:, 2] + jnp.asarray(
            pose[1], dtype
        )[2]

    z1 = cam_z(pose1, xyz)
    z2 = cam_z(pose2, xyz)
    valid = w_ok & (z1 > 0.0) & (z2 > 0.0)  # cheirality both views (:131-137)

    if enforce_reproj:
        def reproj_err(pose, pts_px, xyz):
            pc = jnp.einsum("ij,nj->ni", jnp.asarray(pose[0], dtype), xyz) + jnp.asarray(pose[1], dtype)
            proj = intrinsics.project(pc)
            return jnp.linalg.norm(proj - pts_px, axis=-1)

        err = jnp.maximum(reproj_err(pose1, p1, xyz), reproj_err(pose2, p2, xyz))
        valid = valid & (err <= max_reproj_error)

    if enforce_parallax:
        c1 = -jnp.asarray(pose1[0], dtype).T @ jnp.asarray(pose1[1], dtype)
        c2 = -jnp.asarray(pose2[0], dtype).T @ jnp.asarray(pose2[1], dtype)
        ray1 = xyz - c1
        ray2 = xyz - c2
        cos = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12
        )
        angle = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
        valid = valid & (angle >= min_parallax_deg)

    return xyz, valid


class Triangulator:
    """Mirrors the reference API (triangulation.rs:51-80) with builders."""

    def __init__(self, intrinsics: CameraIntrinsics):
        self.intrinsics = intrinsics
        self.min_parallax_deg = 1.0
        self.max_reproj_error = 4.0
        self.enforce_parallax = False  # reference TODO — off for parity
        self.enforce_reproj = False

    def with_min_parallax(self, deg: float) -> "Triangulator":
        self.min_parallax_deg = deg
        return self

    def with_max_reproj_error(self, error: float) -> "Triangulator":
        self.max_reproj_error = error
        return self

    def with_enforcement(self, parallax: bool = True, reproj: bool = True) -> "Triangulator":
        """Opt into the filters the reference declares but skips."""
        self.enforce_parallax = parallax
        self.enforce_reproj = reproj
        return self

    def triangulate_batch(self, pose1, pose2, points1, points2, descriptors=None, mask=None) -> MapPoints:
        """Jit-side triangulation: fixed-shape MapPoints with validity mask."""
        xyz, valid = triangulate_points(
            self.intrinsics,
            pose1,
            pose2,
            points1,
            points2,
            min_parallax_deg=self.min_parallax_deg,
            max_reproj_error=self.max_reproj_error,
            enforce_parallax=self.enforce_parallax,
            enforce_reproj=self.enforce_reproj,
        )
        if mask is not None:
            valid = valid & jnp.asarray(mask, bool)
        n = xyz.shape[0]
        desc = (
            jnp.asarray(descriptors, jnp.uint8)
            if descriptors is not None
            else jnp.zeros((n, 32), jnp.uint8)
        )
        return MapPoints(positions=xyz, descriptors=desc, valid=valid)

    def triangulate(self, pose1, pose2, points1, points2, descriptors=None):
        """Eager API mirroring triangulation.rs:92-158: returns a list of
        MapPoint for accepted correspondences (descriptor row i attaches to
        point i)."""
        points1 = np.asarray(points1, np.float64)
        points2 = np.asarray(points2, np.float64)
        if points1.shape != points2.shape:
            raise ValueError("Point arrays must have the same length")
        if points1.shape[0] == 0:
            return []
        batch = self.triangulate_batch(pose1, pose2, points1, points2, descriptors)
        xyz = np.asarray(batch.positions)
        valid = np.asarray(batch.valid)
        out = []
        for i in np.nonzero(valid)[0]:
            mp = MapPoint(position=xyz[i], id=int(i))
            if descriptors is not None:
                mp.descriptor = np.asarray(descriptors)[i]
            out.append(mp)
        return out
