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
    # 3 rounds: each round stays on the essential manifold and only accepts
    # non-degrading updates, so it can never collapse the consensus.
    refine_rounds: int = 3
    # Consensus refinement algorithm:
    #   "gn"   — on-manifold Gauss-Newton on the Sampson residual,
    #            E(d) = exp(hat d_L) E exp(hat d_R)^T (default). Cuts
    #            per-pair variance WITHOUT the weighted-8-point refit's
    #            systematic direction bias: on composed trajectories the
    #            IRLS refit's correlated bias accumulates ~linearly while
    #            unbiased noise cancels (measured on the 80-frame forward
    #            corridor: ATE 1.14x the cv2 oracle with "irls", 0.47x
    #            without any refit — per-pair medians were BETTER with
    #            "irls", 4.33 vs 5.28 deg, i.e. pure bias-variance).
    #   "irls" — Sampson-IRLS weighted 8-point refit (the round-2 path).
    #   "none" — best minimal-sample model as-is (closest to OpenCV's
    #            find_essential_mat, which does not polish E).
    refit_method: str = "gn"
    solver: str = "chol"  # smallest-eigvec method: "chol" (fast) or "eigh"
    # Minimal solver per hypothesis: "8pt" (linear, needs 8 samples) or
    # "5pt" (Nistér — the solver OpenCV's find_essential_mat actually runs,
    # pose.rs:64-73; up to N_ROOT_SLOTS=18 candidate E slots per 5-point
    # sample: 10 sign-change brackets + 4 Newton seeds + 4 pair siblings).
    # 5pt needs fewer inlier samples per hypothesis, has no planar
    # degeneracy, and measured 0.35-0.95x the cv2-oracle ATE across the
    # fair lateral AND forward scenes at the pipeline config (see
    # VoConfig.ransac for the full table). Since the pivoted Gauss-Jordan
    # elimination replaced XLA's LU loop (five_point.py _solve_pivoted),
    # the throughput cost is modest, so the PIPELINE default (VoConfig)
    # runs 5pt — full reference parity. This low-level default stays 8pt
    # for direct RansacConfig() users who want the linear fast path at
    # OpenCV's max iteration count.
    min_solver: str = "8pt"
    # 5pt two-stage scoring: each 5-point sample fans out to up to
    # N_ROOT_SLOTS=18 candidate essentials; pre-score all slots on
    # `prescore_subset` correspondences (sampled from the live set), keep
    # only the best slot per hypothesis, and score those winners on the
    # full set. 0 (default) disables: MEASURED SLOWER on TPU at the bench
    # shape (N=500ish, iters=128: 483 -> 402 frames/s) — the subset
    # gather/top_k adds sequential latency inside the per-frame scan that
    # outweighs the scoring FLOPs it saves. Worth revisiting only for
    # dense-match regimes (N >= several thousand).
    prescore_subset: int = 0
    # ORB-SLAM-style model selection: also fit a homography and take the
    # pose from its decomposition when its inlier share S_H/(S_H+S_E)
    # exceeds homography_ratio — rescues planar scenes, where the linear
    # essential solver is degenerate. Off by default (reference parity).
    homography_fallback: bool = False
    homography_ratio: float = 0.45
    homography_iters: int = 256
    # Per-octave noise model: pipelines that know each match's pyramid level
    # pass sigma = scale^octave into ransac_essential (see its docstring).
    # Improves translation-direction accuracy on mixed-octave match sets
    # (coarse-level ORB keypoints carry ~scale^L px noise); OpenCV treats all
    # matches uniformly, so disable for strict oracle-semantics comparisons.
    octave_sigma: bool = True


class RansacResult(NamedTuple):
    essential: jnp.ndarray  # [3, 3]
    inliers: jnp.ndarray  # [N] bool
    num_inliers: jnp.ndarray  # int32 scalar
    best_iter_inliers: jnp.ndarray  # int32 scalar — winner count before refit


def ransac_essential(
    key, pts1, pts2, mask=None, threshold_norm=1.0 / 700.0, config=RansacConfig(), sigma=None
):
    """RANSAC essential-matrix fit on normalized correspondences.

    Args:
      key: jax PRNG key.
      pts1, pts2: [N, 2] K-normalized correspondences.
      mask: [N] bool validity (static-shape stand-in for a variable-length
        match list); None = all live.
      threshold_norm: inlier threshold in normalized units — pass
        threshold_px / fx to mirror OpenCV's pixel threshold.
      config: RansacConfig.
      sigma: optional [N] relative noise scale per correspondence (1.0 =
        nominal). ORB keypoints detected at pyramid level L carry ~scale^L
        localization noise in level-0 pixels; passing sigma_i =
        scale^max(L1_i, L2_i) makes the inlier band per-point
        (thresh * sigma_i, ORB-SLAM's per-octave chi2 scaling), weights the
        IRLS refit rows by 1/sigma_i, and biases hypothesis sampling toward
        precise points (Efraimidis-Spirakis weighted top-k of uniforms:
        u^(1/w) keys). None = uniform (exact OpenCV semantics).

    Returns RansacResult. The winning hypothesis is refined `refine_rounds`
    times on its inlier set by `config.refit_method` — on-manifold
    Gauss-Newton on the Sampson residual by default (see RansacConfig).
    """
    n = pts1.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    mask_f = mask.astype(pts1.dtype)
    thresh_sq = jnp.asarray(threshold_norm, pts1.dtype) ** 2
    if sigma is not None:
        thresh_sq = thresh_sq * jnp.asarray(sigma, pts1.dtype) ** 2  # [N]
        inv_sigma = 1.0 / jnp.maximum(jnp.asarray(sigma, pts1.dtype), 1e-6)
    else:
        inv_sigma = None

    # --- hypothesis sampling: top-k of uniforms, masked ------------------
    sample_size = 5 if config.min_solver == "5pt" else config.sample_size
    # fold_in (not split) keeps the hypothesis-sampling PRNG schedule
    # byte-identical to builds without the prescore stage.
    sub_key = jax.random.fold_in(key, 1)
    u = jax.random.uniform(key, (config.iters, n), dtype=jnp.float32)
    if inv_sigma is not None:
        # Weighted sampling without replacement: key = u^(1/w), w = 1/sigma^2.
        w = (inv_sigma * inv_sigma).astype(jnp.float32)
        u = jnp.exp(jnp.log(jnp.maximum(u, 1e-30)) / w[None, :])
    u = jnp.where(mask[None, :], u, -jnp.inf)
    _, sample_idx = jax.lax.top_k(u, sample_size)  # [iters, S]

    s1 = pts1[sample_idx]  # [iters, S, 2]
    s2 = pts2[sample_idx]

    # --- solve + score all hypotheses at once ---------------------------
    if config.min_solver == "5pt":
        from .five_point import five_point_candidates

        cands, cand_valid = five_point_candidates(s1, s2)  # [iters, R, 3, 3]
        n_sub = config.prescore_subset
        if 0 < n_sub < n:
            # Stage 1: pre-score every root slot on a random subset of the
            # live correspondences and keep the best slot per hypothesis.
            u_sub = jax.random.uniform(sub_key, (n,), dtype=jnp.float32)
            u_sub = jnp.where(mask, u_sub, -jnp.inf)
            _, sub_idx = jax.lax.top_k(u_sub, n_sub)  # [M]
            sub1 = pts1[sub_idx]
            sub2 = pts2[sub_idx]
            sub_thresh = (
                thresh_sq[sub_idx] if thresh_sq.ndim else thresh_sq
            )
            sub_mask = mask[sub_idx]
            sub_err = sampson_error(
                cands.reshape(-1, 3, 3), sub1[None], sub2[None]
            ).reshape(config.iters, -1, n_sub)
            sub_in = (sub_err < sub_thresh) & sub_mask[None, None, :]
            sub_counts = jnp.sum(sub_in.astype(jnp.int32), axis=-1)
            sub_counts = jnp.where(cand_valid, sub_counts, -1)
            best_slot = jnp.argmax(sub_counts, axis=-1)  # [iters]
            hyps = jnp.take_along_axis(
                cands, best_slot[:, None, None, None], axis=1
            )[:, 0]
            hyp_valid = jnp.take_along_axis(
                cand_valid, best_slot[:, None], axis=1
            )[:, 0]
        else:
            hyps = cands.reshape(-1, 3, 3)
            hyp_valid = cand_valid.reshape(-1)
        # Stage 2 (or the only stage): full scoring.
        errors = sampson_error(hyps, pts1[None], pts2[None])  # [H, N]
        inlier_mat = (errors < thresh_sq) & mask[None, :]
        counts = jnp.sum(inlier_mat.astype(jnp.int32), axis=-1)
        counts = jnp.where(hyp_valid, counts, -1)
    else:
        hyps = eight_point(s1, s2, method=config.solver)  # [iters, 3, 3]
        errors = sampson_error(hyps, pts1[None], pts2[None])  # [iters, N]
        inlier_mat = (errors < thresh_sq) & mask[None, :]
        counts = jnp.sum(inlier_mat.astype(jnp.int32), axis=-1)

    best = jnp.argmax(counts)
    best_count = counts[best]
    best_e = hyps[best]

    # --- iterative refinement on the consensus set ----------------------
    # Two algorithms (see RansacConfig.refit_method). Both carries stay ON
    # the essential manifold and both loops are monotone in post-update
    # inlier count. Scoring a raw linear refit instead is a trap: on
    # near-planar scenes it drifts inside the degenerate
    # (homography-consistent) family — it can keep a 100-inlier consensus as
    # a non-essential matrix that collapses to ~25 inliers once projected
    # (measured before this guard).
    def refit(carry, _):
        e, inl = carry
        _, denom = sampson_parts(e, pts1, pts2)
        irls = jax.lax.rsqrt(jnp.maximum(denom, 1e-18))
        w = inl.astype(pts1.dtype) * mask_f * irls
        if inv_sigma is not None:
            w = w * inv_sigma
        # Guard: an 8-point refit needs >= 8 rows; keep the old model if the
        # consensus collapsed (weights all ~0 would make eigh degenerate).
        enough = jnp.sum(inl.astype(jnp.int32)) >= config.sample_size
        e_new = enforce_rank2(eight_point(pts1, pts2, weights=w, method=config.solver))
        err = sampson_error(e_new, pts1, pts2)
        inl_new = (err < thresh_sq) & mask
        better = enough & (
            jnp.sum(inl_new.astype(jnp.int32)) >= jnp.sum(inl.astype(jnp.int32))
        )
        e_new = jnp.where(better, e_new, e)
        inl_new = jnp.where(better, inl_new, inl)
        return (e_new, inl_new), None

    def gn_round(carry, _):
        """One damped Gauss-Newton step on the Sampson residual, on-manifold.

        Parametrization E(d) = exp(hat d[:3]) E exp(hat d[3:])^T: left/right
        rotations preserve the singular values, so every iterate is exactly
        an essential matrix — no rank-2 re-projection, hence none of the
        consensus-collapse risk the linear refit has. The 6-dof chart
        over-covers the 5-dim tangent space by one redundant direction
        (twisting both frames about the translation axis); the LM damping
        below absorbs the resulting null direction.
        """
        from .lie import so3_exp

        e, inl = carry
        w = inl.astype(pts1.dtype) * mask_f
        if inv_sigma is not None:
            w = w * inv_sigma

        def residual(d):
            e_d = so3_exp(d[:3]) @ e @ so3_exp(d[3:]).T
            num, denom = sampson_parts(e_d, pts1, pts2)
            return w * num * jax.lax.rsqrt(jnp.maximum(denom, 1e-18))

        zero = jnp.zeros((6,), pts1.dtype)
        r0 = residual(zero)
        jac = jax.jacfwd(residual)(zero)  # [N, 6]
        jtj = jac.T @ jac
        damp = 1e-6 * (jnp.trace(jtj) / 6.0) + 1e-12
        delta = jnp.linalg.solve(
            jtj + damp * jnp.eye(6, dtype=pts1.dtype), -(jac.T @ r0)
        )
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        e_new = so3_exp(delta[:3]) @ e @ so3_exp(delta[3:]).T
        err = sampson_error(e_new, pts1, pts2)
        inl_new = (err < thresh_sq) & mask
        better = jnp.sum(inl_new.astype(jnp.int32)) >= jnp.sum(inl.astype(jnp.int32))
        e_new = jnp.where(better, e_new, e)
        inl_new = jnp.where(better, inl_new, inl)
        return (e_new, inl_new), None

    start_e = enforce_rank2(best_e)
    start_err = sampson_error(start_e, pts1, pts2)
    start_inliers = (start_err < thresh_sq) & mask
    rounds = 0 if config.refit_method == "none" else config.refine_rounds
    step_fn = gn_round if config.refit_method == "gn" else refit
    (final_e, final_inliers), _ = jax.lax.scan(
        step_fn, (start_e, start_inliers), None, length=rounds
    )

    return RansacResult(
        essential=final_e,
        inliers=final_inliers,
        num_inliers=jnp.sum(final_inliers.astype(jnp.int32)),
        best_iter_inliers=best_count,
    )
