"""Semi-dense depth mapping with ground-truth depth as the predictor oracle."""

import numpy as np

from slamtpu.feature.detector import OrbConfig
from slamtpu.io.synthetic import render_sequence_cached as render_sequence
from slamtpu.ops.ransac import RansacConfig
from slamtpu.pipeline.depth_mapping import (
    align_depth_scale,
    backproject_depth,
    disp_to_depth,
    run_depth_mapping,
)
from slamtpu.pipeline.vo import VoConfig


def test_disp_to_depth_convention():
    import jax.numpy as jnp

    # disp 1 -> min_depth, disp 0 -> max_depth (monodepth2 layers.py).
    assert abs(float(disp_to_depth(jnp.asarray(1.0))) - 0.1) < 1e-6
    assert abs(float(disp_to_depth(jnp.asarray(0.0))) - 100.0) < 1e-4


def test_backproject_identity_pose():
    from slamtpu.odometry.camera import CameraIntrinsics

    cam = CameraIntrinsics.webcam_vga()
    depth = np.full((480, 640), 5.0, np.float32)
    pts, valid = backproject_depth(cam, depth, np.eye(3), np.zeros(3), stride=40)
    pts = np.asarray(pts)
    assert bool(np.asarray(valid).all())
    np.testing.assert_allclose(pts[:, 2], 5.0, atol=1e-5)
    # The principal-point ray hits (0, 0, 5).
    center = pts[np.argmin(np.abs(pts[:, 0]) + np.abs(pts[:, 1]))]
    assert abs(center[0]) < 0.4 and abs(center[1]) < 0.4


def test_scale_alignment():
    from slamtpu.odometry.camera import CameraIntrinsics

    cam = CameraIntrinsics.webcam_vga()
    rng = np.random.default_rng(0)
    pts_cam = np.stack([rng.uniform(-1, 1, 50), rng.uniform(-0.5, 0.5, 50), rng.uniform(3, 9, 50)], 1)
    depth = np.zeros((480, 640), np.float32)
    u = (cam.fx * pts_cam[:, 0] / pts_cam[:, 2] + cam.cx).astype(int)
    v = (cam.fy * pts_cam[:, 1] / pts_cam[:, 2] + cam.cy).astype(int)
    depth[v, u] = pts_cam[:, 2] / 2.5  # predictor is 2.5x too close
    s = align_depth_scale(depth, pts_cam, cam)
    assert abs(s - 2.5) < 1e-6


def test_semi_dense_cloud_matches_scene(tmp_path):
    scene = render_sequence(
        n_frames=12, height=192, width=256, n_points=500, step=1.0, seed=6, render_depth=True
    )

    def gt_depth(frame_idx_holder=[0]):
        def fn(frame):
            # Look up the frame by exact pixel match is fragile; the pipeline
            # calls depth_fn(frames[f]), so index via closure over the call
            # order instead: match on identity within the scene array.
            for i in range(scene.frames.shape[0]):
                if frame is scene.frames[i] or np.array_equal(frame, scene.frames[i]):
                    return scene.depths[i]
            raise AssertionError("unknown frame")

        return fn

    cfg = VoConfig(orb=OrbConfig(max_features=250), ransac=RansacConfig(iters=200))
    res = run_depth_mapping(
        scene.frames, scene.intrinsics, gt_depth(), vo_config=cfg, stride=6, keyframe_stride=2
    )
    assert len(res.points) > 300

    # With ground-truth depth and step=1.0 (unit-scale VO matches world
    # scale), back-projected points must lie near true sprites, with error
    # growing with range (pose drift).
    d = np.linalg.norm(res.points[:, None, :] - scene.points[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    rel = nearest / np.maximum(np.linalg.norm(res.points, axis=1), 1.0)
    assert np.median(rel) < 0.15, f"median relative error {np.median(rel):.3f}"

    res.save_ply(str(tmp_path / "semi.ply"))
    header = open(tmp_path / "semi.ply").read(100)
    assert header.startswith("ply")
