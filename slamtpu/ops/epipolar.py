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


import jax
import jax.numpy as jnp

from .precision import f32_precision as _f32_precision




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


def _eig3_smallest(s):
    """Closed-form smallest eigenvector of a symmetric [..., 3, 3] batch.

    Trigonometric (Cardano) eigenvalues, then the eigenvector from the
    column of (S - l2 I)(S - l3 I) with the largest norm. Branch-free;
    isotropic S (p ~ 0) falls back to e0.
    """
    dtype = s.dtype
    q = jnp.trace(s, axis1=-2, axis2=-1) / 3.0
    s_q = s - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(s_q * s_q, axis=(-2, -1))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_safe = jnp.where(p > 0, p, 1.0)
    b = s_q / p_safe[..., None, None]
    r = jnp.clip(jnp.linalg.det(b) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + two_pi_3)  # smallest
    lam2 = 3.0 * q - lam1 - lam3

    eye = jnp.eye(3, dtype=dtype)
    m = (s - lam1[..., None, None] * eye) @ (s - lam2[..., None, None] * eye)
    norms = jnp.linalg.norm(m, axis=-2)  # column norms [..., 3]
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(m, col[..., None, None], axis=-1)[..., 0]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
    v = jnp.where(vn > 1e-20, v / jnp.maximum(vn, 1e-30), fallback)
    del lam3
    return v


@_f32_precision
def _inv3x3_adj(a):
    """Batched closed-form (adjugate) 3x3 inverse — nine fused products."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _inv4x4_spd(m):
    """Batched SPD 4x4 inverse via block-Schur over the 3x3 adjugate form.

    m = [[A, b], [b^T, d]] with A [...,3,3] SPD: S = d - b^T A^-1 b,
    inv = [[A^-1 + u u^T / S, -u / S], [-u^T / S, 1 / S]] with u = A^-1 b.
    A handful of fused elementwise ops — no LAPACK-style loops.
    """
    a = m[..., :3, :3]
    b = m[..., :3, 3]
    d = m[..., 3, 3]
    a_inv = _inv3x3_adj(a)
    u = jnp.einsum("...ij,...j->...i", a_inv, b)
    s = d - jnp.einsum("...i,...i->...", b, u)
    s_inv = 1.0 / s
    top_left = a_inv + s_inv[..., None, None] * u[..., :, None] * u[..., None, :]
    top_right = -s_inv[..., None] * u
    row3 = jnp.concatenate([top_right, s_inv[..., None]], axis=-1)
    top = jnp.concatenate([top_left, top_right[..., :, None]], axis=-1)
    return jnp.concatenate([top, row3[..., None, :]], axis=-2)


def smallest_eigvec(ata, iters: int = 2, method: str = "chol", block: int = 3):
    """Unit eigenvector for the smallest eigenvalue of a PSD [..., D, D] batch.

    method="chol": BLOCK INVERSE ITERATION + Rayleigh-Ritz via batched
    Cholesky. Factor (A + eps*tr(A)*I) once, iterate a [D, block] subspace
    through `iters` rounds of triangular solves with orthonormalization,
    then solve the projected block x block symmetric eigenproblem in closed
    form. The block matters: an 8-point system built from SMALL-MOTION
    correspondences (x2 ~ x1) has a 3-dimensional near-null space (any
    antisymmetric E nearly satisfies the constraint), and single-vector
    inverse iteration returns an arbitrary mix of that cluster — measured 0
    RANSAC inliers on KITTI-scale frame pairs while `eigh` found 130+. The
    3-vector Rayleigh-Ritz step resolves the cluster exactly (same inlier
    counts as eigh) while staying ~7x faster than batched `eigh` on v5e
    (which lowers to a QR-iteration eigensolver).

    method="eigh": exact reference path.
    """
    if method == "eigh":
        _, vecs = jnp.linalg.eigh(ata)
        return vecs[..., :, 0]

    d = ata.shape[-1]
    eps_scale = 1e-6 if ata.dtype == jnp.float32 else 1e-12
    eps = eps_scale * jnp.trace(ata, axis1=-2, axis2=-1)[..., None, None]
    # Guard all-zero blocks (fully-masked refits): shift by 1 so the
    # factorization stays finite; callers discard those results.
    eps = jnp.where(eps > 0, eps, 1.0)
    shifted = ata + eps * jnp.eye(d, dtype=ata.dtype)

    if d == 4:
        # Closed-form SPD 4x4 inverse via the block-Schur identity over the
        # adjugate 3x3 inverse: batched jnp.linalg.cholesky +
        # triangular_solve lower to blocked row-loop routines on TPU whose
        # latency dominated the fused flagship's triangulation step
        # (~0.75 ms per 500-point DLT batch); this form is a handful of
        # fused elementwise ops. SPD + the eps shift keeps both the 3x3
        # leading block and its Schur complement invertible.
        a_inv = _inv4x4_spd(shifted)
        solve = lambda rhs: a_inv @ rhs
    else:
        chol = jnp.linalg.cholesky(shifted)

        def solve(rhs):
            y = jax.lax.linalg.triangular_solve(chol, rhs, left_side=True, lower=True)
            return jax.lax.linalg.triangular_solve(
                chol, y, left_side=True, lower=True, transpose_a=True
            )

    if block == 1:
        # Single-vector inverse iteration: right for GENERIC 1-D null
        # spaces (DLT triangulation), where the Rayleigh-Ritz block is pure
        # overhead. Callers with clustered spectra (8-point refits) must
        # keep block >= 3 — see the docstring.
        v1 = jnp.broadcast_to(
            jnp.full((d,), d ** -0.5, ata.dtype), ata.shape[:-1]
        )[..., None]
        for _ in range(iters):
            v1 = solve(v1)
            v1 = v1 / jnp.maximum(
                jnp.linalg.norm(v1, axis=-2, keepdims=True), 1e-30
            )
        return v1[..., 0]

    # Fixed orthonormal start: `block` distinct coordinate-ish directions.
    v0 = jnp.eye(d, dtype=ata.dtype)[:, :block]
    v = jnp.broadcast_to(v0, ata.shape[:-2] + (d, block))

    def orthonormalize(v):
        # Modified Gram-Schmidt over the (few) block columns, batched.
        cols = []
        for j in range(block):
            c = v[..., j]
            for prev in cols:
                c = c - jnp.sum(c * prev, axis=-1, keepdims=True) * prev
            c = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-30)
            cols.append(c)
        return jnp.stack(cols, axis=-1)

    for _ in range(iters):
        v = orthonormalize(solve(v))

    # Rayleigh-Ritz: project A onto the subspace, solve the small problem.
    av = ata @ v  # [..., D, block]
    s = jnp.einsum("...di,...dj->...ij", v, av)  # [..., block, block]
    w = _eig3_smallest(s)  # [..., block]
    e = jnp.einsum("...db,...b->...d", v, w)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-30)


@_f32_precision
def eight_point(pts1, pts2, weights=None, method: str = "chol", iters: int = 2):
    """Linear (normalized) 8-point estimate of E from [..., N, 2] pairs.

    Builds the [..., N, 9] design matrix of the constraint x2^T E x1 = 0 with
    E flattened row-major, and returns the unit-norm minimizer of |A e| — the
    smallest eigenvector of A^T A (see `smallest_eigvec` for the TPU-native
    solver choice). `weights` ([..., N]) masks/weights rows (inlier refits).
    """
    x1 = _homogeneous(pts1)  # [..., N, 3]
    x2 = _homogeneous(pts2)
    # Row i = kron(x2_i, x1_i): A[..., i, 3j+k] = x2[j] * x1[k].
    a = x2[..., :, :, None] * x1[..., :, None, :]  # [..., N, 3, 3]
    a = a.reshape(*a.shape[:-2], 9)  # [..., N, 9]
    if weights is not None:
        a = a * weights[..., :, None]
    ata = jnp.einsum("...ni,...nj->...ij", a, a)  # [..., 9, 9]
    e = smallest_eigvec(ata, iters=iters, method=method)
    return e.reshape(*e.shape[:-1], 3, 3)


@_f32_precision
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


def _essential_frames(essential):
    """Closed-form near-SVD frames of an (approximately) essential matrix.

    Returns (u1, u2, u3, v1, v2, v3, s1, s2): orthonormal left/right triads
    and the two nonzero singular-ish values. Exploits the essential
    structure sigma1 = sigma2: v3 is the well-separated smallest eigenvector
    of E^T E (closed-form 3x3, no iterative SVD — batched jnp.linalg.svd on
    TPU lowers to a QR-iteration solver that dominated recover_pose's
    profile); (v1, v2) is ANY orthonormal basis of its complement, which for
    sigma1 = sigma2 is a valid singular basis (the W-trick candidates are
    invariant to the in-plane rotation ambiguity); u's come from Gram-Schmidt
    on (E v1, E v2).
    """
    ete = jnp.einsum("...ji,...jk->...ik", essential, essential)
    v3 = _eig3_smallest(ete)

    # Branch-free complement basis: cross with the axis least aligned to v3.
    probe = jax.nn.one_hot(jnp.argmin(jnp.abs(v3), axis=-1), 3, dtype=v3.dtype)
    v1 = jnp.cross(v3, probe)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-30)
    v2 = jnp.cross(v3, v1)

    ev1 = jnp.einsum("...ij,...j->...i", essential, v1)
    ev2 = jnp.einsum("...ij,...j->...i", essential, v2)
    s1 = jnp.linalg.norm(ev1, axis=-1, keepdims=True)
    u1 = ev1 / jnp.maximum(s1, 1e-30)
    w = ev2 - jnp.sum(u1 * ev2, axis=-1, keepdims=True) * u1
    s2 = jnp.linalg.norm(w, axis=-1, keepdims=True)
    u2 = w / jnp.maximum(s2, 1e-30)
    u3 = jnp.cross(u1, u2)
    return u1, u2, u3, v1, v2, v3, s1[..., 0], s2[..., 0]


@_f32_precision
def enforce_rank2(essential):
    """Project E onto the essential manifold: singular values (s, s, 0)."""
    u1, u2, _, v1, v2, _, s1, s2 = _essential_frames(essential)
    mean = 0.5 * (s1 + s2)
    return mean[..., None, None] * (
        u1[..., :, None] * v1[..., None, :] + u2[..., :, None] * v2[..., None, :]
    )


@_f32_precision
def decompose_essential(essential):
    """E -> the four (R, t) candidates ((R1,t), (R1,-t), (R2,t), (R2,-t)).

    Closed-form W-trick decomposition from `_essential_frames` — the cross-
    product constructions make det(U) = det(V) = +1 by construction, so the
    candidates are proper rotations without sign fix-ups, and no iterative
    SVD is involved. Returns (rs [..., 4, 3, 3], ts [..., 4, 3]), |t| = 1.
    """
    u1, u2, u3, v1, v2, v3, _, _ = _essential_frames(essential)
    u = jnp.stack([u1, u2, u3], axis=-1)  # columns
    vt = jnp.stack([v1, v2, v3], axis=-2)  # rows = V^T

    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=essential.dtype)
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u3 / jnp.maximum(jnp.linalg.norm(u3, axis=-1, keepdims=True), 1e-18)

    rs = jnp.stack([r1, r1, r2, r2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return rs, ts


@_f32_precision
def triangulate_two_view(rotation, translation, pts1, pts2):
    """Closed-form two-ray (midpoint) triangulation in view-1 coordinates.

    View 1 is [I|0]; view 2 is [R|t] (p2 = R p1 + t). Per correspondence,
    both viewing rays are expressed in view-1 coordinates — d1 = (x1, y1, 1),
    d2 = R^T (x2, y2, 1) from camera center c = -R^T t — and the depths
    minimizing |z1 d1 - (c + z2 d2)|^2 come from a 2x2 normal-equation solve.
    Pure elementwise math: the TPU-native replacement for the per-point 4x4
    DLT eigenproblem (which lowered to 64k tiny `eigh` calls in the
    cheirality vote and dominated recover_pose's profile). Accuracy is
    equivalent for cheirality voting; the mapping path keeps its DLT.

    pts: [..., N, 2] normalized. Returns [..., N, 3] midpoints in view-1
    frame (degenerate parallel-ray pairs produce large/far points, which the
    caller's depth bound rejects).
    """
    d1 = _homogeneous(pts1)  # [..., N, 3]
    d2_cam2 = _homogeneous(pts2)
    d2 = jnp.einsum("...ji,...nj->...ni", rotation, d2_cam2)  # R^T d2
    c = -jnp.einsum("...ji,...j->...i", rotation, translation)  # camera-2 center
    c = c[..., None, :]

    a11 = jnp.sum(d1 * d1, axis=-1)
    a12 = -jnp.sum(d1 * d2, axis=-1)
    a22 = jnp.sum(d2 * d2, axis=-1)
    b1 = jnp.sum(d1 * c, axis=-1)
    b2 = -jnp.sum(d2 * c, axis=-1)
    det = a11 * a22 - a12 * a12
    det_safe = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    z1 = (b1 * a22 - a12 * b2) / det_safe
    z2 = (a11 * b2 - a12 * b1) / det_safe

    p_on_ray1 = z1[..., None] * d1
    p_on_ray2 = c + z2[..., None] * d2
    return 0.5 * (p_on_ray1 + p_on_ray2)


@_f32_precision
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


@_f32_precision
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
