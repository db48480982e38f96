"""RerunLogger against a fake `rerun` backend.

The reference gates its viewer behind the cargo `rerun` feature
(examples/point_cloud.rs:61-75); our analog gates on the `rerun` package,
absent from this image. These tests inject a recording fake so every logging
path executes for real: entity paths, payload shapes, colors/radii, the
per-frame time sequence, and the end-to-end wiring through run_point_cloud
(point_cloud.rs:149-394 cadence).
"""

import sys
import types

import numpy as np
import pytest

from slamtpu.io.synthetic import render_sequence_cached as render_sequence
from slamtpu.feature.detector import OrbConfig
from slamtpu.mapping.keyframe import KeyframeConfig
from slamtpu.ops.ransac import RansacConfig
from slamtpu.pipeline.point_cloud import PointCloudConfig, run_point_cloud
from slamtpu.pipeline.vo import VoConfig


class _Call:
    def __init__(self, kind, args, kwargs):
        self.kind = kind
        self.args = args
        self.kwargs = kwargs


def _archetype(kind):
    class A(_Call):
        def __init__(self, *args, **kwargs):
            super().__init__(kind, args, kwargs)

    A.__name__ = kind
    return A


@pytest.fixture
def fake_rerun(monkeypatch):
    rr = types.ModuleType("rerun")
    rr.events = []  # (entity_path, archetype _Call, static flag)
    rr.times = []  # set_time_sequence calls
    rr.inits = []
    rr.saves = []

    rr.init = lambda app_id, spawn=False: rr.inits.append(app_id)
    rr.save = lambda path: rr.saves.append(path)
    rr.spawns = []
    rr.spawn = lambda: rr.spawns.append(True)
    rr.set_time_sequence = lambda name, n: rr.times.append((name, int(n)))

    def log(entity, payload, static=False):
        rr.events.append((entity, payload, static))

    rr.log = log
    for kind in ("Image", "Points2D", "Points3D", "LineStrips3D", "Transform3D",
                 "TextDocument"):
        setattr(rr, kind, _archetype(kind))
    rr.ViewCoordinates = types.SimpleNamespace(RUB="RUB")

    monkeypatch.setitem(sys.modules, "rerun", rr)
    return rr


def _events(rr, entity, kind=None):
    return [
        (e, p) for e, p, _ in rr.events
        if e == entity and (kind is None or p.kind == kind)
    ]


def test_logger_unit_surface(fake_rerun):
    """Every method logs the reference's entity path with the reference's
    payload parameters (point_cloud.rs:546-770)."""
    from slamtpu.utils.metrics import RerunLogger

    logger = RerunLogger(save_path="/tmp/fake.rrd")
    assert logger.active
    assert fake_rerun.inits == ["slamtpu"]
    assert fake_rerun.saves == ["/tmp/fake.rrd"]
    # RUB view coordinates logged static on "world" (point_cloud.rs:149).
    assert any(e == "world" and s for e, _, s in fake_rerun.events)

    logger.set_frame(7)
    assert fake_rerun.times == [("frame", 7)]

    logger.log_frame(np.zeros((4, 6), np.uint8))
    ((_, img),) = _events(fake_rerun, "world/camera/image", "Image")
    assert img.args[0].shape == (4, 6, 3)  # gray expanded to RGB

    rot = np.eye(3)
    logger.log_camera(rot, np.array([1.0, 2.0, 3.0]))
    ((_, tf),) = _events(fake_rerun, "world/camera", "Transform3D")
    np.testing.assert_allclose(tf.kwargs["translation"], [-1, -2, -3])  # C->W inversion
    np.testing.assert_allclose(tf.kwargs["mat3x3"], np.eye(3))

    logger.log_matches_2d(np.zeros((150, 2)), np.ones((150, 2)))
    # Distinct child entities per point set: same-path logs of one archetype
    # at one timepoint overwrite each other under Rerun's latest-at
    # semantics, so prev/cur keypoints live at kp_prev / kp_cur.
    ((_, green),) = _events(fake_rerun, "world/camera/image/kp_prev", "Points2D")
    ((_, red),) = _events(fake_rerun, "world/camera/image/kp_cur", "Points2D")
    assert green.args[0].shape == (100, 2)  # capped at 100 (rs:608)
    assert green.kwargs["colors"] == [[0, 255, 0]]
    assert red.kwargs["colors"] == [[255, 0, 0]]
    assert green.kwargs["radii"] == [3.0]

    logger.log_matches_image(
        np.zeros((8, 10), np.uint8), np.zeros((8, 12), np.uint8),
        np.array([[2.0, 3.0]]), np.array([[4.0, 5.0]]),
    )
    ((_, mimg),) = _events(fake_rerun, "world/keyframe_matches", "Image")
    canvas = mimg.args[0]
    assert canvas.shape == (8, 22, 3)  # side-by-side
    assert (canvas == (0, 255, 0)).all(-1).any()  # a match line was drawn
    assert (canvas == (255, 0, 0)).all(-1).any()  # endpoint dots

    logger.log_points(np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 50.0]]))
    ((_, p3),) = _events(fake_rerun, "world/points", "Points3D")
    assert p3.kwargs["radii"] == [0.02]
    colors = np.asarray(p3.kwargs["colors"])
    np.testing.assert_array_equal(colors[0], [0, 0, 255])  # near = blue
    np.testing.assert_array_equal(colors[1], [255, 0, 0])  # far = red

    logger.log_trajectory(np.zeros((1, 3)))  # <2 points: skipped (rs:733)
    assert not _events(fake_rerun, "world/trajectory")
    logger.log_trajectory(np.zeros((5, 3)))
    ((_, strip),) = _events(fake_rerun, "world/trajectory", "LineStrips3D")
    assert strip.kwargs["colors"] == [[0, 255, 0]]
    assert strip.kwargs["radii"] == [0.01]


def test_logger_wired_through_point_cloud(fake_rerun):
    """run_point_cloud(rerun_logger=...) replays the reference cadence:
    an image per frame, a camera transform + match overlays per keyframe,
    map points + trajectory per keyframe tail (point_cloud.rs:169-394)."""
    from slamtpu.utils.metrics import RerunLogger

    scene = render_sequence(n_frames=10, height=120, width=160, n_points=400, step=0.4, seed=3)
    cfg = PointCloudConfig(
        vo=VoConfig(
            orb=OrbConfig(max_features=128, n_levels=4),
            ransac=RansacConfig(iters=96),
            keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),
        ),
        map_capacity=2048,
    )
    logger = RerunLogger()
    # Without a save path the logger must open a live sink (rr.spawn), or
    # every event dies in an unconnected in-memory recording.
    assert fake_rerun.spawns == [True]
    res = run_point_cloud(scene.frames, scene.intrinsics, cfg, rerun_logger=logger)

    n_kf = res.keyframe_frame_idx.shape[0] - 1  # minus keyframe 0
    assert n_kf >= 3

    frames_logged = _events(fake_rerun, "world/camera/image", "Image")
    assert len(frames_logged) == scene.frames.shape[0] - 1  # one per pair
    assert frames_logged[0][1].args[0].shape == (120, 160, 3)

    cams = _events(fake_rerun, "world/camera", "Transform3D")
    assert len(cams) == n_kf
    assert len(_events(fake_rerun, "world/keyframe_matches", "Image")) == n_kf
    assert len(_events(fake_rerun, "world/camera/image/kp_prev", "Points2D")) == n_kf
    assert len(_events(fake_rerun, "world/camera/image/kp_cur", "Points2D")) == n_kf
    assert len(_events(fake_rerun, "world/points", "Points3D")) == n_kf
    # Trajectory strips appear once >=2 points exist.
    assert len(_events(fake_rerun, "world/trajectory", "LineStrips3D")) >= n_kf - 1
    # Time sequence covered every frame.
    assert ("frame", 1) in fake_rerun.times
    assert ("frame", scene.frames.shape[0] - 1) in fake_rerun.times


def test_logger_inactive_without_rerun():
    """Without the package the logger is a no-op and run_point_cloud skips
    all logging calls (the `--features rerun` absent case, rs:73-75)."""
    from slamtpu.utils.metrics import RerunLogger

    assert "rerun" not in sys.modules
    logger = RerunLogger()
    assert not logger.active
    logger.set_frame(1)
    logger.log_frame(np.zeros((2, 2)))
    logger.log_camera(np.eye(3), np.zeros(3))
    logger.log_matches_2d(np.zeros((1, 2)), np.zeros((1, 2)))
    logger.log_matches_image(np.zeros((2, 2)), np.zeros((2, 2)), [], [])
    logger.log_points(np.zeros((1, 3)))
    logger.log_trajectory(np.zeros((3, 3)))
    logger.log_depth(np.zeros((2, 2)), np.zeros((2, 2, 3)), 0)


def test_depth_cli_rerun(fake_rerun, capsys):
    """depth_estimation --rerun logs the reference's three entities per
    processed frame: camera/rgb, camera/depth_colored, and a "Frame: N"
    text document (examples/depth_estimation.rs:306-343)."""
    from slamtpu.cli.depth_estimation import main

    main(["synthetic:2x96x128", "--random-init", "--batch", "2",
          "--width", "64", "--height", "32", "--rerun"])

    rgb = _events(fake_rerun, "camera/rgb", "Image")
    depth = _events(fake_rerun, "camera/depth_colored", "Image")
    info = _events(fake_rerun, "info", "TextDocument")
    assert len(rgb) == len(depth) == len(info) == 2
    assert rgb[0][1].args[0].shape == (96, 128, 3)  # input resolution, RGB
    d = depth[0][1].args[0]
    assert d.shape == (32, 64, 3) and d.dtype == np.uint8  # model resolution
    assert info[1][1].args[0] == "Frame: 1"
    assert ("frame", 1) in fake_rerun.times
