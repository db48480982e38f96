"""Two-view epipolar geometry: 8-point essential solver, Sampson error,
essential-matrix decomposition, and linear triangulation for cheirality.

TPU-native replacement for the OpenCV calls behind PoseEstimator
(/root/reference/src/odometry/pose.rs:47-114: find_essential_mat with RANSAC
and recover_pose_estimated). Everything is batched/vmapped, fixed-shape, and
branch-free.

Conventions (pinned to OpenCV so the oracle tests are direct comparisons):
  * Points are NORMALIZED image coordinates (K^-1 applied), shape [..., 2].
  * The relative pose (R, t) maps view-1 camera coordinates to view-2:
    p2 = R @ p1 + t.
  * E = [t]x R, and the epipolar constraint is x2^T E x1 = 0 with
    x_i = (x, y, 1) homogeneous normalized coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import hat

__all__ = [
    "eight_point",
    "sampson_error",
    "enforce_rank2",
    "decompose_essential",
    "triangulate_two_view",
    "cheirality_counts",
    "recover_pose_from_essential",
]


def _homogeneous(x):
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def eight_point(pts1, pts2, weights=None):
    """Linear (normalized) 8-point estimate of E from [..., N, 2] pairs.

    Builds the [..., N, 9] design matrix of the constraint x2^T E x1 = 0 with
    E flattened row-major, and returns the unit-norm minimizer of |A e| — the
    eigenvector of A^T A for its smallest eigenvalue. A 9x9 eigh per
    hypothesis batches cleanly on TPU and is exact; no iterative solver
    needed. `weights` ([..., N]) masks/wights rows (soft inlier refits).
    """
    x1 = _homogeneous(pts1)  # [..., N, 3]
    x2 = _homogeneous(pts2)
    # Row i = kron(x2_i, x1_i): A[..., i, 3j+k] = x2[j] * x1[k].
    a = x2[..., :, :, None] * x1[..., :, None, :]  # [..., N, 3, 3]
    a = a.reshape(*a.shape[:-2], 9)  # [..., N, 9]
    if weights is not None:
        a = a * weights[..., :, None]
    ata = jnp.einsum("...ni,...nj->...ij", a, a)  # [..., 9, 9]
    _, vecs = jnp.linalg.eigh(ata)  # ascending eigenvalues
    e = vecs[..., :, 0]  # smallest
    return e.reshape(*e.shape[:-1], 3, 3)


def sampson_parts(essential, pts1, pts2):
    """(algebraic residual x2^T E x1, gradient-norm^2 denominator), per pair."""
    x1 = _homogeneous(pts1)
    x2 = _homogeneous(pts2)
    ex1 = jnp.einsum("...ij,...nj->...ni", essential, x1)  # E x1
    etx2 = jnp.einsum("...ji,...nj->...ni", essential, x2)  # E^T x2
    num = jnp.einsum("...ni,...ni->...n", x2, ex1)  # x2^T E x1
    denom = ex1[..., 0] ** 2 + ex1[..., 1] ** 2 + etx2[..., 0] ** 2 + etx2[..., 1] ** 2
    return num, denom


def sampson_error(essential, pts1, pts2):
    """First-order geometric (Sampson) error of x2^T E x1 = 0, per pair.

    Returns [..., N] squared-distance-like values in normalized-coordinate
    units; compare against (threshold_px / focal)^2 to mirror OpenCV's
    pixel-threshold semantics (pose.rs:69-71: threshold 1.0 px).
    """
    num, denom = sampson_parts(essential, pts1, pts2)
    return num * num / jnp.maximum(denom, 1e-18)


def enforce_rank2(essential):
    """Project E onto the essential manifold: singular values (s,s,0)."""
    u, s, vt = jnp.linalg.svd(essential)
    mean = (s[..., 0] + s[..., 1]) * 0.5
    s_fixed = jnp.stack([mean, mean, jnp.zeros_like(mean)], axis=-1)
    return u @ (s_fixed[..., :, None] * vt)


def decompose_essential(essential):
    """E -> the four (R, t) candidates ((R1,t), (R1,-t), (R2,t), (R2,-t)).

    Standard SVD decomposition with W; R determinants are corrected to +1 so
    the candidates are proper rotations. Returns (rs [..., 4, 3, 3],
    ts [..., 4, 3]) with unit-norm t.
    """
    u, _, vt = jnp.linalg.svd(essential)
    # Make U, V^T proper rotations (det +1) — sign flips of a column/row.
    du = jnp.sign(jnp.linalg.det(u))
    dv = jnp.sign(jnp.linalg.det(vt))
    u = u * jnp.stack([jnp.ones_like(du), jnp.ones_like(du), du], axis=-1)[..., None, :]
    vt = vt * jnp.stack([jnp.ones_like(dv), jnp.ones_like(dv), dv], axis=-1)[..., :, None]

    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=essential.dtype)
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-18)

    rs = jnp.stack([r1, r1, r2, r2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return rs, ts


def triangulate_two_view(rotation, translation, pts1, pts2):
    """Linear two-view triangulation in view-1 coordinates.

    View 1 is [I|0]; view 2 is [R|t] (p2 = R p1 + t). Solves the stacked DLT
    normal equations per correspondence (4 rows, 3 unknowns after
    dehomogenizing is ill-posed — instead use the standard homogeneous 4x4
    system via normal equations on A^T A, smallest eigenvector).

    pts: [..., N, 2] normalized. Returns [..., N, 3] points in view-1 frame.
    """
    dtype = rotation.dtype
    p1 = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1),
        rotation.shape[:-2] + (3, 4),
    )
    p2 = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)  # [..., 3, 4]

    def rows(p, pts):
        # x * P[2] - P[0], y * P[2] - P[1]  -> [..., N, 2, 4]
        pr0 = p[..., None, 0, :]
        pr1 = p[..., None, 1, :]
        pr2 = p[..., None, 2, :]
        r0 = pts[..., :, 0, None] * pr2 - pr0
        r1 = pts[..., :, 1, None] * pr2 - pr1
        return jnp.stack([r0, r1], axis=-2)

    a = jnp.concatenate([rows(p1, pts1), rows(p2, pts2)], axis=-2)  # [..., N, 4, 4]
    ata = jnp.einsum("...nij,...nik->...njk", a, a)
    _, vecs = jnp.linalg.eigh(ata)
    x = vecs[..., :, 0]  # [..., N, 4]
    w = x[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return x[..., :3] / w_safe[..., None]


def cheirality_counts(rotation, translation, pts1, pts2, mask=None, max_depth=50.0):
    """Number of correspondences in front of BOTH cameras for a candidate.

    Mirrors OpenCV recoverPose's vote, including its far-point rejection
    (depth < `max_depth` in normalized units; OpenCV uses 50).
    """
    points = triangulate_two_view(rotation, translation, pts1, pts2)
    z1 = points[..., 2]
    p2 = jnp.einsum("...ij,...nj->...ni", rotation, points) + translation[..., None, :]
    z2 = p2[..., 2]
    ok = (z1 > 0) & (z2 > 0) & (z1 < max_depth) & (z2 < max_depth)
    if mask is not None:
        ok = ok & mask
    return jnp.sum(ok.astype(jnp.int32), axis=-1)


def recover_pose_from_essential(essential, pts1, pts2, mask=None):
    """Pick the (R, t) candidate with the best cheirality vote.

    TPU-native recover_pose (pose.rs:83-114): all four candidates are
    triangulated in a batch and the argmax vote wins. Returns
    (R [...,3,3], t [...,3], votes [...,4]).
    """
    rs, ts = decompose_essential(essential)
    votes = cheirality_counts(
        rs,
        ts,
        pts1[..., None, :, :] if pts1.ndim == rs.ndim - 1 else pts1,
        pts2[..., None, :, :] if pts2.ndim == rs.ndim - 1 else pts2,
        mask=None if mask is None else mask[..., None, :],
    )
    best = jnp.argmax(votes, axis=-1)
    r = jnp.take_along_axis(rs, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t = jnp.take_along_axis(ts, best[..., None, None], axis=-2)[..., 0, :]
    return r, t, votes
