"""Checkpoint/resume round trips (map save/load is a reference TODO)."""

import numpy as np

from slamtpu import CameraIntrinsics, Map
from slamtpu.io.checkpoint import (
    load_map,
    load_pipeline_state,
    save_map,
    save_pipeline_state,
)
from slamtpu.mapping.triangulation import MapPoint
from slamtpu.odometry.trajectory import Trajectory


def test_map_roundtrip(tmp_path, rng):
    m = Map(CameraIntrinsics.webcam_vga(), capacity=64)
    descs = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    m.add_points(
        [MapPoint(position=rng.normal(size=3) + [0, 0, 10], descriptor=descs[i]) for i in range(5)]
    )
    m.update_observations([(1, 0), (3, 0)])
    save_map(str(tmp_path / "map_ck"), m.state)

    restored = load_map(str(tmp_path / "map_ck"))
    np.testing.assert_array_equal(np.asarray(restored.valid), np.asarray(m.state.valid))
    np.testing.assert_allclose(np.asarray(restored.positions), np.asarray(m.state.positions))
    np.testing.assert_array_equal(np.asarray(restored.descriptors), np.asarray(m.state.descriptors))
    np.testing.assert_array_equal(np.asarray(restored.observations), np.asarray(m.state.observations))
    assert int(restored.next_id) == int(m.state.next_id)


def test_pipeline_state_roundtrip(tmp_path, rng):
    m = Map(CameraIntrinsics.kitti(), capacity=32)
    m.add_points([MapPoint(position=np.array([0.0, 0.0, 8.0]))])

    traj = Trajectory()
    traj.update(np.eye(3), [1.0, 0.0, 0.5], 1, 0.1)
    kf_r = np.stack([np.eye(3)] * 2)
    kf_t = rng.normal(size=(2, 3))
    obs = ([0, 1], [0, 0], [np.array([10.0, 20.0], np.float32), np.array([11.0, 21.0], np.float32)])

    save_pipeline_state(str(tmp_path / "pipe_ck"), m.state, kf_r, kf_t, [0, 5], traj, obs)
    state, r, t, frames, traj2, obs2 = load_pipeline_state(str(tmp_path / "pipe_ck"))

    assert int(state.size()) == 1
    np.testing.assert_allclose(r, kf_r)
    np.testing.assert_allclose(t, kf_t)
    assert frames == [0, 5]
    assert len(traj2) == 2
    np.testing.assert_allclose(traj2.global_pose, traj.global_pose)
    assert traj2.points[1].frame == 1
    assert obs2[0] == [0, 1] and obs2[1] == [0, 0]
    np.testing.assert_allclose(obs2[2][1], [11.0, 21.0])


def test_point_cloud_resume(tmp_path):
    """Split a clip in two: run -> checkpoint -> resume == map keeps growing."""
    from slamtpu.feature.detector import OrbConfig
    from slamtpu.io.synthetic import render_sequence_cached as render_sequence
    from slamtpu.mapping.keyframe import KeyframeConfig
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.pipeline.point_cloud import PointCloudConfig, run_point_cloud
    from slamtpu.pipeline.vo import VoConfig

    scene = render_sequence(n_frames=10, height=192, width=256, n_points=500, step=0.5, seed=9)
    cfg = PointCloudConfig(
        vo=VoConfig(
            orb=OrbConfig(max_features=200),
            ransac=RansacConfig(iters=150),
            keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
        ),
        map_capacity=2048,
        max_ba_observations=512,
    )
    first = run_point_cloud(scene.frames[:6], scene.intrinsics, cfg, seed=0)
    n_points_first = len(first.points())
    n_kf_first = first.keyframe_rotations.shape[0]
    assert n_points_first > 20
    first.save_checkpoint(str(tmp_path / "pc_ck"))

    resumed = run_point_cloud(
        scene.frames[5:], scene.intrinsics, cfg, seed=1, resume_from=str(tmp_path / "pc_ck")
    )
    assert resumed.keyframe_rotations.shape[0] > n_kf_first
    assert len(resumed.points()) > n_points_first
    # Trajectory carried over: starts with the checkpointed points.
    assert len(resumed.trajectory) > n_kf_first


def test_point_cloud_fused_resume_matches_host(tmp_path):
    """The fused pipeline resumes from the same checkpoint with the same
    semantics as the host loop: with BA disabled the two resumed runs share
    every numerical path, so chains, map census, and observation logs must
    agree exactly (mirrors test_fused_pipeline_no_ba_exact_match, but
    across a checkpoint boundary)."""
    from slamtpu.feature.detector import OrbConfig
    from slamtpu.io.synthetic import render_sequence_cached as render_sequence
    from slamtpu.mapping.keyframe import KeyframeConfig
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.pipeline.point_cloud import (
        PointCloudConfig,
        run_point_cloud,
        run_point_cloud_fused,
    )
    from slamtpu.pipeline.vo import VoConfig

    scene = render_sequence(
        n_frames=12, height=120, width=160, n_points=400, step=0.25,
        intrinsics=CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0),
        seed=4, noise=1.0,
    )
    cfg = PointCloudConfig(
        vo=VoConfig(
            orb=OrbConfig(max_features=128, n_levels=4),
            ransac=RansacConfig(iters=128),
            keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
        ),
        map_capacity=2048,
        max_obs_per_kf=1024,
        ba_interval=0,
    )
    first = run_point_cloud_fused(scene.frames[:6], scene.intrinsics, cfg, seed=0)
    first.save_checkpoint(str(tmp_path / "ck"))

    host = run_point_cloud(
        scene.frames[5:], scene.intrinsics, cfg, seed=1,
        resume_from=str(tmp_path / "ck"),
    )
    fused = run_point_cloud_fused(
        scene.frames[5:], scene.intrinsics, cfg, seed=1,
        resume_from=str(tmp_path / "ck"),
    )
    assert fused.keyframe_rotations.shape[0] > first.keyframe_rotations.shape[0]
    np.testing.assert_array_equal(host.keyframe_frame_idx, fused.keyframe_frame_idx)
    np.testing.assert_allclose(
        host.keyframe_rotations, fused.keyframe_rotations, atol=1e-12
    )
    np.testing.assert_allclose(
        host.keyframe_translations, fused.keyframe_translations, atol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(host.map_state.valid), np.asarray(fused.map_state.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(host.map_state.ids), np.asarray(fused.map_state.ids)
    )
    assert len(host.observations[0]) == len(fused.observations[0])
    assert len(fused.trajectory) == len(host.trajectory)


def test_point_cloud_fused_resume_with_ba(tmp_path):
    """The documented BA-enabled resume contract: the fused runner resumes,
    post-resume BA fires over post-resume keyframes only (empty ring), the
    map and chain keep growing, and the restored prefix of the chain is
    preserved verbatim (BA windows never reach back across the resume)."""
    from slamtpu.feature.detector import OrbConfig
    from slamtpu.io.synthetic import render_sequence_cached as render_sequence
    from slamtpu.mapping.keyframe import KeyframeConfig
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.pipeline.point_cloud import PointCloudConfig, run_point_cloud_fused
    from slamtpu.pipeline.vo import VoConfig

    scene = render_sequence(
        n_frames=14, height=120, width=160, n_points=400, step=0.25,
        intrinsics=CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0),
        seed=8, noise=1.0,
    )
    cfg = PointCloudConfig(
        vo=VoConfig(
            orb=OrbConfig(max_features=128, n_levels=4),
            ransac=RansacConfig(iters=128),
            keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
        ),
        map_capacity=2048,
        max_obs_per_kf=1024,
        ba_interval=3,
    )
    first = run_point_cloud_fused(scene.frames[:8], scene.intrinsics, cfg, seed=0)
    assert first.ba_runs >= 2
    first.save_checkpoint(str(tmp_path / "ck"))

    resumed = run_point_cloud_fused(
        scene.frames[7:], scene.intrinsics, cfg, seed=1,
        resume_from=str(tmp_path / "ck"),
    )
    n_first = first.keyframe_rotations.shape[0]
    assert resumed.keyframe_rotations.shape[0] > n_first
    assert resumed.ba_runs >= 1  # BA fired post-resume
    assert len(resumed.points()) > len(first.points())
    # Restored prefix untouched: post-resume BA windows only cover new
    # keyframes (the in-scan ring starts empty at the resume point).
    np.testing.assert_array_equal(
        resumed.keyframe_rotations[:n_first], first.keyframe_rotations
    )
    np.testing.assert_array_equal(
        resumed.keyframe_translations[:n_first], first.keyframe_translations
    )


def test_metrics_and_timer():
    from slamtpu.utils.metrics import MetricsLog, StepTimer

    log = MetricsLog(print_every=0)
    for i in range(5):
        log.log(i, matches=100 + i, inliers=80.0 + i)
    s = log.summary()
    assert abs(s["matches"] - 102.0) < 1e-9
    assert len(log.records) == 5

    timer = StepTimer()
    for _ in range(3):
        timer.start()
        timer.stop(items=2)
    assert len(timer.times) == 6
    assert timer.fps() > 0


def test_rerun_stub_noop():
    from slamtpu.utils.metrics import RerunLogger

    logger = RerunLogger()
    assert not logger.active  # rerun not installed here
    logger.log_trajectory(np.zeros((3, 3)))  # must not raise
    logger.log_points(np.zeros((3, 3)))
