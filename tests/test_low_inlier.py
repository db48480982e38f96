"""Low-inlier robustness gates (VERDICT r3 item 5).

Every other accuracy gate runs at ~100% post-filter inlier ratios; these
scenes degrade matching for real — repeated sprite texture (descriptors
collide, the Hamming ratio filter passes genuine OUTLIER matches) plus
horizontal motion blur — and gate pose success + ATE vs the cv2-oracle
pipeline there. This is the regime where a static 64-hypothesis budget is
most at risk vs the reference's confidence-0.999 adaptive RANSAC
(/root/reference/src/odometry/pose.rs:47-80, up to 1000 iterations).

Measured on this host (margin policy: gates carry >=15% headroom):
  degraded (14 texture ids, 3 px blur): inlier-ratio median 0.65; UNIFIED
    config 39/39 successes, ATE ratio 0.561x the oracle.
  harsh (8 texture ids, 4 px blur): UNIFIED ATE ratio 1.50x — the
    64-sample budget genuinely breaks here — while VoConfig.robust()
    (iters=256) measures 0.695x. The robust preset is the documented
    answer for known-poor match quality; the harsh gate pins both numbers
    so the failure mode stays measured, not hidden.
"""

import numpy as np
import pytest

from slamtpu.io.synthetic import render_sequence_cached as render_sequence
from slamtpu.pipeline.vo import VoConfig, run_vo

from oracle_vo import compose_positions, cv2_vo_relative_cached as cv2_vo_relative


def _degraded_scene(repeat_texture, motion_blur):
    return render_sequence(
        n_frames=40, height=480, width=640, n_points=3000, step=0.3,
        yaw_rate=0.003, seed=21, noise=1.5, motion="forward",
        forward_dir=(0.12, 0.06, 1.0), textured=True,
        repeat_texture=repeat_texture, motion_blur=motion_blur,
    )


def _ate_vs_oracle(scene, run):
    oracle_rel = cv2_vo_relative(scene.frames, scene.intrinsics, nfeatures=500)
    n_pairs = scene.frames.shape[0] - 1
    common = [i for i in range(n_pairs) if run.success[i] and i in oracle_rel]
    gt = compose_positions(
        [
            (
                scene.rel_rotations[i],
                scene.rel_translations[i] / np.linalg.norm(scene.rel_translations[i]),
            )
            for i in common
        ]
    )
    ours = compose_positions([(run.rotations[i], run.translations[i]) for i in common])
    oracle = compose_positions([oracle_rel[i] for i in common])
    ate_ours = float(np.sqrt(np.mean(np.sum((ours - gt) ** 2, axis=1))))
    ate_oracle = float(np.sqrt(np.mean(np.sum((oracle - gt) ** 2, axis=1))))
    return common, n_pairs, ate_ours, ate_oracle


def test_degraded_regime_unified_config():
    """Repeated texture + blur, UNIFIED config: the pipeline must stay at
    least as accurate as the reference. Measured: 39/39 successes,
    inlier-ratio median 0.65 (vs ~1.0 on clean gates — the degradation is
    real), ATE ratio 0.561 (gate 1.01 = 80% headroom)."""
    scene = _degraded_scene(repeat_texture=14, motion_blur=3.0)
    run = run_vo(scene.frames, scene.intrinsics, VoConfig(), chunk_size=32, seed=0)
    common, n_pairs, ate_ours, ate_oracle = _ate_vs_oracle(scene, run)

    assert run.successful_frames >= 0.9 * n_pairs
    assert len(common) >= 0.85 * n_pairs
    # Prove the regime is exercised: post-RANSAC inlier share well below 1.
    ok = run.success.astype(bool)
    inl_ratio = run.num_inliers[ok] / np.maximum(run.num_matches[ok], 1)
    assert np.median(inl_ratio) < 0.85, f"median inlier ratio {np.median(inl_ratio):.2f}"
    print(f"\ndegraded ATE: ours {ate_ours:.3f} vs oracle {ate_oracle:.3f}")
    assert ate_ours <= 1.01 * ate_oracle, (
        f"ours {ate_ours:.3f} vs oracle {ate_oracle:.3f}"
    )


@pytest.mark.slow
def test_harsh_regime_robust_preset():
    """Harsh repeated texture: the UNIFIED 64-hypothesis budget measurably
    breaks (ATE ratio ~1.50 on this host — pinned below so the failure mode
    stays visible), and VoConfig.robust() (iters=256) must beat the
    reference (measured 0.695, gate 1.01 = 31% headroom)."""
    scene = _degraded_scene(repeat_texture=8, motion_blur=4.0)

    run64 = run_vo(scene.frames, scene.intrinsics, VoConfig(), chunk_size=32, seed=0)
    _, n_pairs, ate64, ate_oracle = _ate_vs_oracle(scene, run64)
    print(f"\nharsh unified: {ate64:.3f} vs oracle {ate_oracle:.3f}")
    # Documentation pin, generous bounds: the unified config is WORSE than
    # 0.8x the oracle here (it measured 1.50x) — if this ever fails,
    # update the robust-preset guidance, don't delete the gate.
    assert ate64 > 0.8 * ate_oracle

    run256 = run_vo(
        scene.frames, scene.intrinsics, VoConfig.robust(), chunk_size=32, seed=0
    )
    common, n_pairs, ate256, ate_oracle = _ate_vs_oracle(scene, run256)
    assert run256.successful_frames >= 0.9 * n_pairs
    assert len(common) >= 0.85 * n_pairs
    print(f"harsh robust: {ate256:.3f} vs oracle {ate_oracle:.3f}")
    assert ate256 <= 1.01 * ate_oracle, (
        f"robust {ate256:.3f} vs oracle {ate_oracle:.3f}"
    )
