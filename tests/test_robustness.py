"""Failure handling under jit (SURVEY.md §5): a failed frame is masked
identity motion, never an exception, and the pipeline recovers after it."""

import numpy as np
import pytest

from slamtpu.feature.detector import OrbConfig
from slamtpu.io.synthetic import render_sequence_cached as render_sequence
from slamtpu.ops.ransac import RansacConfig
from slamtpu.pipeline.vo import VoConfig, run_vo


@pytest.fixture(scope="module")
def corrupted_run():
    scene = render_sequence(n_frames=18, height=192, width=256, n_points=500, step=0.5, seed=4)
    frames = scene.frames.copy()
    frames[7] = 0  # dead camera frame
    frames[12] = np.random.default_rng(0).integers(0, 2, size=frames[12].shape).astype(np.uint8)
    cfg = VoConfig(orb=OrbConfig(max_features=250), ransac=RansacConfig(iters=200))
    return scene, run_vo(frames, scene.intrinsics, cfg, seed=0)


def test_corrupt_frames_fail_gracefully(corrupted_run):
    scene, run = corrupted_run
    # Pairs touching the black frame (6->7 and 7->8) must fail, not raise.
    assert not run.success[6]
    assert not run.success[7]
    # The rest of the clip keeps working.
    clean = [i for i in range(17) if i not in (6, 7, 11, 12)]
    assert run.success[clean].mean() > 0.8


def test_failed_frames_are_identity_motion(corrupted_run):
    _, run = corrupted_run
    np.testing.assert_allclose(run.rotations[6], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(run.translations[6], 0.0, atol=1e-6)
    # Failed frames never become keyframes and never advance the trajectory.
    assert not run.is_keyframe[6]
    assert run.keyframe_count == int(run.is_keyframe.sum())


def test_fused_pipeline_survives_corrupt_frames():
    """The scan-fused flagship handles dead/noise frames like the host loop:
    failed pairs are masked (no keyframe, no map growth from them), the
    pipelines agree on the schedule, and nothing raises. Guards the fused
    scan's cond-masking under mid-clip VO failure."""
    from slamtpu.mapping.keyframe import KeyframeConfig
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.pipeline.point_cloud import (
        PointCloudConfig,
        run_point_cloud,
        run_point_cloud_fused,
    )
    from slamtpu.pipeline.vo import VoConfig

    scene = render_sequence(
        n_frames=14, height=120, width=160, n_points=400, step=0.25,
        intrinsics=CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0),
        seed=6, noise=1.0,
    )
    frames = scene.frames.copy()
    frames[6] = 0  # dead camera frame mid-clip
    cfg = PointCloudConfig(
        vo=VoConfig(
            orb=OrbConfig(max_features=128, n_levels=4),
            ransac=RansacConfig(iters=128),
            keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
        ),
        map_capacity=2048,
        max_obs_per_kf=1024,
    )
    host = run_point_cloud(frames, scene.intrinsics, cfg, chunk_size=8)
    fused = run_point_cloud_fused(frames, scene.intrinsics, cfg, chunk_size=8)

    np.testing.assert_array_equal(host.keyframe_frame_idx, fused.keyframe_frame_idx)
    assert host.successful_frames == fused.successful_frames
    # The dead frame's pairs (5->6 and 6->7) are not keyframes.
    assert 6 not in fused.keyframe_frame_idx
    assert 7 not in fused.keyframe_frame_idx
    # The pipeline recovered: keyframes exist on both sides of the dropout.
    idx = np.asarray(fused.keyframe_frame_idx)
    assert (idx > 7).any() and ((idx > 0) & (idx < 6)).any()
    assert int(np.asarray(fused.map_state.valid).sum()) > 50


def test_map_quality_against_ground_truth_landmarks():
    """Triangulated landmarks sit near TRUE scene points (up to the global
    scale ambiguity of monocular VO, fixed here by the unit-step convention
    matching step=1.0 rendering)."""
    from slamtpu.mapping.keyframe import KeyframeConfig
    from slamtpu.pipeline.point_cloud import PointCloudConfig, run_point_cloud
    from slamtpu.pipeline.vo import VoConfig

    scene = render_sequence(n_frames=14, height=240, width=320, n_points=600, step=1.0, seed=11)
    cfg = PointCloudConfig(
        vo=VoConfig(
            orb=OrbConfig(max_features=300),
            ransac=RansacConfig(iters=200),
            keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
        ),
        map_capacity=4096,
        max_ba_observations=1024,
    )
    res = run_point_cloud(scene.frames, scene.intrinsics, cfg, seed=0)
    pts = np.array([p.position for p in res.points() if p.observations >= 2])
    assert len(pts) > 50

    # Each stable landmark should be close to SOME true scene point; with
    # step=1.0 the estimated unit-step scale matches the world scale.
    # Accuracy is DEPTH-RELATIVE: per-step direction noise (~5 deg on this
    # forward-motion scene) drifts the pose chain, and triangulation error
    # scales with landmark range — a 20 m point placed 1.5 m off is the same
    # angular quality as a 5 m point placed 0.4 m off.
    d = np.linalg.norm(pts[:, None, :] - scene.points[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    ranges = np.linalg.norm(pts, axis=1)
    rel = nearest / np.maximum(ranges, 1.0)
    frac_close = (rel < 0.2).mean()
    assert np.median(rel) < 0.15, f"median relative landmark error {np.median(rel):.2f}"
    assert frac_close > 0.6, f"only {frac_close:.0%} of landmarks within 20% of range"
