"""KITTI sequence plumbing on a fabricated mini-sequence."""

import os

import cv2
import numpy as np

from slamtpu.io.kitti import load_calib, load_poses, load_sequence, load_times


def make_sequence(root, n=5, h=40, w=60):
    seq = root / "00"
    (seq / "image_0").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    for i, f in enumerate(frames):
        cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), f)
    calib = (
        "P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0\n"
        "P1: 718.856 0 607.1928 -386.1448 0 718.856 185.2157 0 0 0 1 0\n"
    )
    (seq / "calib.txt").write_text(calib)
    (seq / "times.txt").write_text("".join(f"{0.1 * i:.6e}\n" for i in range(n)))
    return seq, frames


def test_load_sequence(tmp_path):
    seq, frames = make_sequence(tmp_path)
    out, cam, times = load_sequence(str(seq))
    np.testing.assert_array_equal(out, frames)
    assert abs(cam.fx - 718.856) < 1e-9
    assert abs(cam.cx - 607.1928) < 1e-9
    np.testing.assert_allclose(times, 0.1 * np.arange(5), atol=1e-9)


def test_load_calib_camera1(tmp_path):
    seq, _ = make_sequence(tmp_path)
    cam1 = load_calib(str(seq / "calib.txt"), camera=1)
    assert abs(cam1.fy - 718.856) < 1e-9


def test_load_poses(tmp_path):
    p = np.hstack([np.eye(3), np.array([[1.0], [2.0], [3.0]])])
    path = tmp_path / "00.txt"
    np.savetxt(path, np.stack([p.ravel(), p.ravel()]))
    poses = load_poses(str(path))
    assert poses.shape == (2, 3, 4)
    np.testing.assert_allclose(poses[0, :, 3], [1.0, 2.0, 3.0])


def test_max_frames(tmp_path):
    seq, frames = make_sequence(tmp_path, n=6)
    out, _, times = load_sequence(str(seq), max_frames=3)
    assert out.shape[0] == 3 and times.shape[0] == 3
