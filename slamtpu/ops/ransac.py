"""Fixed-iteration vmapped RANSAC for the essential matrix.

TPU-native replacement for OpenCV's find_essential_mat(RANSAC) call
(/root/reference/src/odometry/pose.rs:64-73: confidence 0.999, threshold
1.0 px, max 1000 iterations). Early-exit adaptive RANSAC does not exist under
jit, so all `iters` hypotheses run as one batch — which is exactly what the
hardware wants: 1000 independent 9x9 eigenproblems and a [iters, N] Sampson
error matrix are embarrassingly parallel.

Sampling without replacement per hypothesis uses the top-k-of-uniforms trick:
draw u ~ U[0,1)^N per hypothesis, push masked-out rows to -inf, take the
top-8 indices — a uniform 8-subset of the live correspondences with no
host-side loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .epipolar import eight_point, enforce_rank2, sampson_error, sampson_parts

__all__ = ["RansacConfig", "RansacResult", "ransac_essential"]


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Defaults mirror the OpenCV call in pose.rs:64-73. `threshold` is in
    pixels and is divided by the focal length at the call site (points here
    are already K-normalized). `confidence` is recorded for API parity but
    unused: iteration count is static under jit."""

    iters: int = 1000
    threshold: float = 1.0
    confidence: float = 0.999
    sample_size: int = 8
    refine_rounds: int = 2
    solver: str = "chol"  # smallest-eigvec method: "chol" (fast) or "eigh"
    # ORB-SLAM-style model selection: also fit a homography and take the
    # pose from its decomposition when its inlier share S_H/(S_H+S_E)
    # exceeds homography_ratio — rescues planar scenes, where the linear
    # essential solver is degenerate. Off by default (reference parity).
    homography_fallback: bool = False
    homography_ratio: float = 0.45
    homography_iters: int = 256


class RansacResult(NamedTuple):
    essential: jnp.ndarray  # [3, 3]
    inliers: jnp.ndarray  # [N] bool
    num_inliers: jnp.ndarray  # int32 scalar
    best_iter_inliers: jnp.ndarray  # int32 scalar — winner count before refit


def ransac_essential(key, pts1, pts2, mask=None, threshold_norm=1.0 / 700.0, config=RansacConfig()):
    """RANSAC essential-matrix fit on normalized correspondences.

    Args:
      key: jax PRNG key.
      pts1, pts2: [N, 2] K-normalized correspondences.
      mask: [N] bool validity (static-shape stand-in for a variable-length
        match list); None = all live.
      threshold_norm: inlier threshold in normalized units — pass
        threshold_px / fx to mirror OpenCV's pixel threshold.
      config: RansacConfig.

    Returns RansacResult. The winning hypothesis is refit `refine_rounds`
    times by weighted 8-point on its inlier set (OpenCV refines the final
    model similarly), then rank-2-projected.
    """
    n = pts1.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    mask_f = mask.astype(pts1.dtype)
    thresh_sq = jnp.asarray(threshold_norm, pts1.dtype) ** 2

    # --- hypothesis sampling: top-k of uniforms, masked ------------------
    u = jax.random.uniform(key, (config.iters, n), dtype=jnp.float32)
    u = jnp.where(mask[None, :], u, -jnp.inf)
    _, sample_idx = jax.lax.top_k(u, config.sample_size)  # [iters, 8]

    s1 = pts1[sample_idx]  # [iters, 8, 2]
    s2 = pts2[sample_idx]

    # --- solve + score all hypotheses at once ---------------------------
    hyps = eight_point(s1, s2, method=config.solver)  # [iters, 3, 3]
    errors = sampson_error(hyps, pts1[None], pts2[None])  # [iters, N]
    inlier_mat = (errors < thresh_sq) & mask[None, :]
    counts = jnp.sum(inlier_mat.astype(jnp.int32), axis=-1)

    best = jnp.argmax(counts)
    best_count = counts[best]
    best_e = hyps[best]
    best_inliers = inlier_mat[best]

    # --- iterative refit on the consensus set ---------------------------
    # Sampson-IRLS: weighting each row by 1/sqrt(gradient-norm) makes the
    # weighted algebraic least squares a first-order approximation of the
    # geometric (Sampson) minimizer — same effect as OpenCV's final
    # refinement, but as two fixed matmul/eigh rounds instead of an LM loop.
    def refit(carry, _):
        e, inl = carry
        _, denom = sampson_parts(e, pts1, pts2)
        irls = jax.lax.rsqrt(jnp.maximum(denom, 1e-18))
        w = inl.astype(pts1.dtype) * mask_f * irls
        # Guard: an 8-point refit needs >= 8 rows; keep the old model if the
        # consensus collapsed (weights all ~0 would make eigh degenerate).
        enough = jnp.sum(inl.astype(jnp.int32)) >= config.sample_size
        e_new = eight_point(pts1, pts2, weights=w, method=config.solver)
        e_new = jnp.where(enough, e_new, e)
        err = sampson_error(e_new, pts1, pts2)
        inl_new = (err < thresh_sq) & mask
        return (e_new, inl_new), None

    (refined_e, refined_inliers), _ = jax.lax.scan(
        refit, (best_e, best_inliers), None, length=config.refine_rounds
    )
    final_e = enforce_rank2(refined_e)
    final_err = sampson_error(final_e, pts1, pts2)
    final_inliers = (final_err < thresh_sq) & mask

    return RansacResult(
        essential=final_e,
        inliers=final_inliers,
        num_inliers=jnp.sum(final_inliers.astype(jnp.int32)),
        best_iter_inliers=best_count,
    )
