"""Applications-layer smoke tests: drive every CLI binary in-process.

The reference ships six binaries (SURVEY.md §1: main + five examples,
src/main.rs, examples/*.rs); they are the user-facing surface of the
framework, so each one gets an end-to-end smoke run here on a tiny
synthetic clip — flags parse, the pipeline runs, the printed summary
matches the reference's shape, and the artifacts land on disk.

Runs in-process (module `main(argv)`) so the conftest CPU mesh and the
persistent compilation cache apply; artifacts are redirected to tmp_path
via chdir.
"""

import json
import os

import numpy as np
import pytest

CLIP = "synthetic:10x120x160"


def test_main_smoke(capsys):
    from slamtpu.cli.main import main

    main(["synthetic:8x120x160", "--max-features", "128"])
    out = capsys.readouterr().out
    assert "Opened synthetic:8x120x160: 8 frames 120x160" in out
    mean = float(out.rsplit("mean features/frame:", 1)[1])
    assert mean > 16, out  # reference prints counts every 30 frames (main.rs:37-61)


def test_visualize_features_smoke(tmp_path, monkeypatch, capsys):
    cv2 = pytest.importorskip("cv2")
    from slamtpu.cli.visualize_features import main

    monkeypatch.chdir(tmp_path)
    main(
        ["synthetic:6x120x160", "--max-features", "128", "--max-frames", "6",
         "--save-overlays", str(tmp_path / "overlays")]
    )
    out = capsys.readouterr().out
    assert "Mean good matches/pair:" in out
    pngs = sorted((tmp_path / "overlays").glob("matches_*.png"))
    assert len(pngs) == 5  # one per frame pair
    img = cv2.imread(str(pngs[0]))
    assert img.shape == (120, 2 * 160, 3)  # side-by-side canvas


def test_visual_odometry_smoke(tmp_path, monkeypatch, capsys):
    pytest.importorskip("cv2")  # --plot renders through cv2
    from slamtpu.cli.visual_odometry import main

    monkeypatch.chdir(tmp_path)
    main([CLIP, "--max-features", "128", "--chunk", "8",
          "--output", str(tmp_path / "traj.json"),
          "--plot", str(tmp_path / "traj.png")])
    out = capsys.readouterr().out
    # Summary block mirrors visual_odometry.rs:224-239.
    for line in ("Total frames:", "Successful poses:", "Keyframes selected:",
                 "Average FPS:"):
        assert line in out
    traj = json.loads((tmp_path / "traj.json").read_text())
    assert len(traj) >= 1
    assert set(traj[0]) == {"frame", "position", "timestamp"}
    assert (tmp_path / "traj.png").exists()


def test_visual_odometry_config_file(tmp_path, monkeypatch, capsys):
    """--config loads a SlamConfig JSON (the reference's four config
    mechanisms unified, SURVEY.md §5); its knobs override the flag defaults."""
    import dataclasses
    import json as _json

    from slamtpu.cli.visual_odometry import main
    from slamtpu.feature.detector import OrbConfig
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.utils.config import SlamConfig, save_config

    cfg = SlamConfig(
        orb=OrbConfig(max_features=128, n_levels=4),
        ransac=RansacConfig(iters=128),
    )
    save_config(cfg, str(tmp_path / "slam.json"))
    # File survives a round trip with the distinctive knob intact.
    assert _json.loads((tmp_path / "slam.json").read_text())["orb"]["n_levels"] == 4

    monkeypatch.chdir(tmp_path)
    main([CLIP, "--chunk", "8", "--output", str(tmp_path / "t.json"),
          "--config", str(tmp_path / "slam.json")])
    out = capsys.readouterr().out
    assert "Successful poses:" in out
    assert (tmp_path / "t.json").exists()


def test_visual_odometry_gt_eval(tmp_path, monkeypatch, capsys):
    """--gt scores the run against a KITTI-format pose file (the ground-
    truth comparison the reference leaves as TODO.md:90)."""
    from slamtpu.cli.visual_odometry import main

    # Constant-velocity +z ground truth in the devkit's 3x4 row format.
    rows = []
    for i in range(10):
        p = np.hstack([np.eye(3), [[0.0], [0.0], [float(i)]]])
        rows.append(p.reshape(-1))
    np.savetxt(tmp_path / "poses.txt", np.asarray(rows))

    monkeypatch.chdir(tmp_path)
    main([CLIP, "--max-features", "128", "--chunk", "8",
          "--output", str(tmp_path / "t.json"), "--gt", str(tmp_path / "poses.txt")])
    out = capsys.readouterr().out
    assert "ATE vs ground truth" in out
    ate = float(out.split("keyframes):")[1].split("m")[0])
    # The synthetic clip IS constant-velocity forward motion: after Sim3
    # alignment the estimate must land near this ground truth.
    assert np.isfinite(ate) and ate < 1.0, out


def test_draw_trajectory_semantics():
    """The headless top-down plot mirrors visual_odometry.rs:300-391: white
    canvas, <2 points blank, green start dot, red end dot, blue->red
    gradient along the path."""
    pytest.importorskip("cv2")
    from slamtpu.odometry.trajectory import Trajectory
    from slamtpu.utils.viz import draw_trajectory

    traj = Trajectory()
    img = draw_trajectory(traj, 200, 150)
    assert img.shape == (150, 200, 3) and (img == 255).all()  # <2 points

    # Straight +z path: start at the bottom margin, end at the top.
    eye = np.eye(3)
    for i in range(1, 11):
        traj.update(eye, np.array([0.0, 0.0, 1.0]), i, float(i))
    img = draw_trajectory(traj, 200, 150)
    assert tuple(img[150 - 20, 20]) == (0, 255, 0)  # start dot, green
    assert tuple(img[150 - 20 - int(10 * (150 - 40) / 10.0), 20]) == (255, 0, 0)
    # Early path segments lean blue, late ones lean red.
    col = img[:, 20:23].reshape(-1, 3)
    line_px = col[(col != 255).any(axis=1)]
    assert (line_px[:, 2] > 0).any() and (line_px[:, 0] > 0).any()


@pytest.mark.parametrize("fused", [False, True], ids=["host", "fused"])
def test_point_cloud_smoke(tmp_path, monkeypatch, capsys, fused):
    from slamtpu.cli.point_cloud import main

    monkeypatch.chdir(tmp_path)
    main([CLIP, "--max-features", "128", "--chunk", "8",
          "--map-capacity", "2048", "--checkpoint", str(tmp_path / "ckpt")]
         + (["--fused"] if fused else []))
    out = capsys.readouterr().out
    # Summary mirrors point_cloud.rs:497-510.
    for line in ("Keyframes:", "3D map points:", "Bundle Adjustment runs:"):
        assert line in out
    for artifact in ("point_cloud.ply", "point_cloud.json", "trajectory_output.json"):
        assert (tmp_path / artifact).exists(), artifact
    header = (tmp_path / "point_cloud.ply").read_text().splitlines()
    assert header[0] == "ply" and "format ascii 1.0" in header[1]
    assert os.listdir(tmp_path / "ckpt")


def test_point_cloud_fused_rejects_rerun():
    from slamtpu.cli.point_cloud import main

    with pytest.raises(SystemExit):
        main([CLIP, "--fused", "--rerun"])


def test_bundle_adjustment_smoke(capsys):
    from slamtpu.cli.bundle_adjustment import main

    main(["--poses", "4", "--points", "4", "--iterations", "10"])
    out = capsys.readouterr().out
    initial = float(out.split("Initial reprojection error:")[1].split()[0])
    final = float(out.split("Final reprojection error:")[1].split()[0])
    assert final < 0.5 * initial, out  # example reports error reduction (:62-86)
    assert "Local BA (window=2)" in out


def test_depth_estimation_smoke(capsys):
    from slamtpu.cli.depth_estimation import main

    main(["synthetic:4x120x160", "--random-init", "--batch", "2"])
    out = capsys.readouterr().out
    assert "Frames processed: 4" in out
    ms = float(out.split("Average inference:")[1].split()[0])
    assert np.isfinite(ms) and ms > 0
