"""Planar two-view geometry: homography RANSAC + calibrated decomposition.

The linear 8-point essential solver (ops/epipolar.py) is DEGENERATE when the
scene is (near-)planar — the reference inherits the same failure from
OpenCV's RANSAC when 5-point degrades, and road-dominated automotive scenes
hit it. The classical remedy (ORB-SLAM's initializer) is implemented here:
fit a homography alongside the essential matrix, pick the model with the
stronger inlier support, and recover (R, t) from H when the plane wins.

Everything reuses the TPU-native machinery from epipolar.py: the 4-point DLT
null vector comes from the same Cholesky/Rayleigh-Ritz `smallest_eigvec`,
and the decomposition (Ma-Soatto "Invitation to 3D Vision" Algorithm 5.2,
H = R + t n^T/d in normalized coordinates) uses the closed-form symmetric
3x3 eigendecomposition — no iterative SVD anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .epipolar import _f32_precision, _homogeneous, cheirality_counts, smallest_eigvec

__all__ = [
    "four_point_homography",
    "homography_transfer_error",
    "ransac_homography",
    "decompose_homography",
    "recover_pose_from_homography",
]


@_f32_precision
def four_point_homography(pts1, pts2, weights=None):
    """DLT homography from [..., N, 2] normalized correspondences (N >= 4).

    Returns [..., 3, 3] H with x2 ~ H x1 (up to scale).
    """
    x1 = _homogeneous(pts1)  # [..., N, 3]
    u2 = pts2[..., 0]
    v2 = pts2[..., 1]
    zeros = jnp.zeros_like(x1)
    # Two rows per correspondence of the standard DLT system.
    row_a = jnp.concatenate(
        [x1, zeros, -u2[..., None] * x1], axis=-1
    )  # [..., N, 9]
    row_b = jnp.concatenate(
        [zeros, x1, -v2[..., None] * x1], axis=-1
    )
    a = jnp.concatenate([row_a, row_b], axis=-2)  # [..., 2N, 9]
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=-1)
        a = a * w2[..., :, None]
    ata = jnp.einsum("...ni,...nj->...ij", a, a)
    h = smallest_eigvec(ata)
    return h.reshape(*h.shape[:-1], 3, 3)


def _inv3(m):
    """Closed-form 3x3 inverse (adjugate / det)."""
    det = jnp.linalg.det(m)
    adj = jnp.stack(
        [
            jnp.cross(m[..., 1, :], m[..., 2, :]),
            jnp.cross(m[..., 2, :], m[..., 0, :]),
            jnp.cross(m[..., 0, :], m[..., 1, :]),
        ],
        axis=-1,
    )
    det_safe = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    return adj / det_safe[..., None, None]


@_f32_precision
def homography_transfer_error(h, pts1, pts2):
    """Symmetric transfer error (squared, normalized units), [..., N]."""
    h_inv = _inv3(h)
    x1 = _homogeneous(pts1)
    x2 = _homogeneous(pts2)

    def transfer(hm, xs):
        y = jnp.einsum("...ij,...nj->...ni", hm, xs)
        w = y[..., 2]
        w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        return y[..., :2] / w_safe[..., None]

    fwd = jnp.sum((transfer(h, x1) - pts2) ** 2, axis=-1)
    bwd = jnp.sum((transfer(h_inv, x2) - pts1) ** 2, axis=-1)
    return fwd + bwd


def ransac_homography(key, pts1, pts2, mask=None, threshold_norm=1.0 / 700.0, iters=256,
                      refine_rounds=2, sigma=None):
    """Fixed-iteration vmapped homography RANSAC (4-point minimal samples).

    Same masked top-k-of-uniforms sampling as ransac_essential. The symmetric
    transfer threshold uses 2 * threshold^2 (two squared residuals summed).
    sigma: optional [N] per-point noise scale — widens the inlier band per
    point exactly like ransac_essential's, so the S_H/(S_H+S_E) model-
    selection ratio compares like with like when per-octave sigma is active.
    Returns (H [3,3], inliers [N] bool, num_inliers).
    """
    n = pts1.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    thresh = 2.0 * jnp.asarray(threshold_norm, pts1.dtype) ** 2
    if sigma is not None:
        thresh = thresh * jnp.asarray(sigma, pts1.dtype) ** 2  # [N]

    u = jax.random.uniform(key, (iters, n), dtype=jnp.float32)
    u = jnp.where(mask[None, :], u, -jnp.inf)
    _, sample_idx = jax.lax.top_k(u, 4)

    hyps = four_point_homography(pts1[sample_idx], pts2[sample_idx])
    errors = homography_transfer_error(hyps, pts1[None], pts2[None])
    inlier_mat = (errors < thresh) & mask[None, :]
    counts = jnp.sum(inlier_mat.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    h = hyps[best]
    inliers = inlier_mat[best]

    def refit(carry, _):
        h, inl = carry
        w = (inl & mask).astype(pts1.dtype)
        enough = jnp.sum(inl.astype(jnp.int32)) >= 4
        h_new = four_point_homography(pts1, pts2, weights=w)
        h_new = jnp.where(enough, h_new, h)
        err = homography_transfer_error(h_new, pts1, pts2)
        return (h_new, (err < thresh) & mask), None

    (h, inliers), _ = jax.lax.scan(refit, (h, inliers), None, length=refine_rounds)
    return h, inliers, jnp.sum(inliers.astype(jnp.int32))


def _eig3_full(s):
    """Closed-form full eigendecomposition of a symmetric [..., 3, 3] batch.

    Returns (eigenvalues descending [..., 3], eigenvectors as COLUMNS
    [..., 3, 3]). Same Cardano + annihilating-product construction as
    _eig3_smallest; assumes generically distinct eigenvalues (the homography
    decomposition's H^T H has lam1 > 1 > lam3 away from pure rotation).
    """
    dtype = s.dtype
    q = jnp.trace(s, axis1=-2, axis2=-1) / 3.0
    s_q = s - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p = jnp.sqrt(jnp.maximum(jnp.sum(s_q * s_q, axis=(-2, -1)) / 6.0, 1e-30))
    r = jnp.clip(jnp.linalg.det(s_q / p[..., None, None]) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)
    lam3 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam2 = 3.0 * q - lam1 - lam3

    eye = jnp.eye(3, dtype=dtype)

    def vec_for(la, lb, lc):
        m = (s - lb[..., None, None] * eye) @ (s - lc[..., None, None] * eye)
        norms = jnp.linalg.norm(m, axis=-2)
        col = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(m, col[..., None, None], axis=-1)[..., 0]
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)

    v1 = vec_for(lam1, lam2, lam3)
    v3 = vec_for(lam3, lam1, lam2)
    v2 = jnp.cross(v3, v1)  # right-handed, exactly orthogonal
    vals = jnp.stack([lam1, lam2, lam3], axis=-1)
    vecs = jnp.stack([v1, v2, v3], axis=-1)
    return vals, vecs


@_f32_precision
def decompose_homography(h):
    """Calibrated H = R + t n^T / d -> the 4 physical (R, t/d, n) candidates.

    Ma-Soatto Algorithm 5.2 via the closed-form symmetric eigendecomposition
    of H^T H (normalized so sigma_2(H) = 1). Returns (rs [..., 4, 3, 3],
    ts [..., 4, 3] (scaled by 1/d, unnormalized), ns [..., 4, 3]).
    """
    hth = jnp.einsum("...ji,...jk->...ik", h, h)
    vals, _ = _eig3_full(hth)
    # Normalize H so the middle singular value is 1.
    sigma2 = jnp.sqrt(jnp.maximum(vals[..., 1], 1e-30))
    h = h / sigma2[..., None, None]
    # det(H) must be +1-ish for the decomposition's orientation conventions.
    sign = jnp.sign(jnp.linalg.det(h))
    sign = jnp.where(sign == 0, 1.0, sign)
    h = h * sign[..., None, None]

    hth = jnp.einsum("...ji,...jk->...ik", h, h)
    vals, vecs = _eig3_full(hth)
    l1 = jnp.maximum(vals[..., 0], 1.0 + 1e-12)
    l3 = jnp.minimum(vals[..., 2], 1.0 - 1e-12)
    v1 = vecs[..., :, 0]
    v2 = vecs[..., :, 1]
    v3 = vecs[..., :, 2]

    a = jnp.sqrt(jnp.maximum(1.0 - l3, 0.0))
    b = jnp.sqrt(jnp.maximum(l1 - 1.0, 0.0))
    denom = jnp.sqrt(jnp.maximum(l1 - l3, 1e-30))[..., None]
    u1 = (a[..., None] * v1 + b[..., None] * v3) / denom
    u2 = (a[..., None] * v1 - b[..., None] * v3) / denom

    def solution(u):
        n = jnp.cross(v2, u)
        big_u = jnp.stack([v2, u, n], axis=-1)  # columns
        hv2 = jnp.einsum("...ij,...j->...i", h, v2)
        hu = jnp.einsum("...ij,...j->...i", h, u)
        big_w = jnp.stack([hv2, hu, jnp.cross(hv2, hu)], axis=-1)
        r = big_w @ jnp.swapaxes(big_u, -1, -2)
        t = jnp.einsum("...ij,...j->...i", h - r, n)
        return r, t, n

    r1, t1, n1 = solution(u1)
    r2, t2, n2 = solution(u2)
    # The (-t, -n) twins are the same R with the plane on the other side.
    rs = jnp.stack([r1, r1, r2, r2], axis=-3)
    ts = jnp.stack([t1, -t1, t2, -t2], axis=-2)
    ns = jnp.stack([n1, -n1, n2, -n2], axis=-2)
    return rs, ts, ns


def recover_pose_from_homography(h, pts1, pts2, mask=None):
    """Pick the physically valid (R, t) from H by cheirality voting.

    Returns (R [3,3], t [3] unit, votes [4]). The plane normal must face
    camera 1 (n_z > 0 in its frame) and triangulated inliers must land in
    front of both cameras.
    """
    rs, ts, ns = decompose_homography(h)
    t_norm = jnp.linalg.norm(ts, axis=-1, keepdims=True)
    ts_unit = ts / jnp.maximum(t_norm, 1e-18)

    votes = cheirality_counts(
        rs,
        ts_unit,
        pts1[..., None, :, :] if pts1.ndim == rs.ndim - 1 else pts1,
        pts2[..., None, :, :] if pts2.ndim == rs.ndim - 1 else pts2,
        mask=None if mask is None else mask[..., None, :],
    )
    # Visible plane: normal's z toward camera 1.
    facing = ns[..., 2] > 0
    votes = jnp.where(facing, votes, 0)
    best = jnp.argmax(votes, axis=-1)
    r = jnp.take_along_axis(rs, best[..., None, None, None], axis=-3)[..., 0, :, :]
    t = jnp.take_along_axis(ts_unit, best[..., None, None], axis=-2)[..., 0, :]
    return r, t, votes
