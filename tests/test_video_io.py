"""load_frames input specs: video files, image dirs, .npy stacks, synthetic.

The reference reads everything through OpenCV VideoCapture
(src/main.rs:37-61, examples/*); load_frames is our equivalent multiplexer
(slamtpu/io/video.py). Each accepted spec gets a round-trip test.
"""

import os

import numpy as np
import pytest

from slamtpu.io.video import load_frames


def test_synthetic_spec_shapes():
    frames, cam, fps = load_frames("synthetic:6x96x128")
    assert frames.shape == (6, 96, 128) and frames.dtype == np.uint8
    assert cam is not None and fps == 30.0
    # skip/max compose like the reference's --skip-frames/--max-frames.
    frames2, _, _ = load_frames("synthetic:6x96x128", max_frames=2, skip_frames=1)
    assert frames2.shape[0] == 2


def test_npy_spec(tmp_path):
    stack = (np.random.default_rng(0).uniform(0, 255, (5, 32, 48))).astype(np.uint8)
    path = str(tmp_path / "clip.npy")
    np.save(path, stack)
    frames, cam, fps = load_frames(path)
    np.testing.assert_array_equal(frames, stack)
    assert cam is None
    frames, _, _ = load_frames(path, max_frames=2, skip_frames=1)
    np.testing.assert_array_equal(frames, stack[::2][:2])


def test_video_file_roundtrip(tmp_path):
    """Write a short grayscale-content video with cv2, read it back through
    load_frames (the VideoCapture + BGR->GRAY path every reference binary
    uses), and check frame count, fps, and pixel content."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    h, w, t = 64, 80, 8
    frames = (rng.uniform(0, 256, (t, h, w)).astype(np.uint8) // 16) * 16

    path = str(tmp_path / "clip.avi")
    # FFV1/lossless first so pixel equality is exact; fall back to MJPG.
    for fourcc, lossless in (("FFV1", True), ("MJPG", False)):
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*fourcc), 10.0, (w, h), isColor=True
        )
        if writer.isOpened():
            break
        writer.release()
    else:  # pragma: no cover
        pytest.skip("no usable cv2 video codec in this environment")
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    writer.release()
    assert os.path.getsize(path) > 0

    out, cam, fps = load_frames(path)
    assert out.shape == (t, h, w)
    assert cam is None and abs(fps - 10.0) < 0.5
    err = np.abs(out.astype(np.int32) - frames.astype(np.int32))
    if lossless:
        assert err.max() <= 1  # BGR<->GRAY round trip can perturb by 1 LSB
    else:
        assert np.median(err) <= 4  # MJPG quantization

    skipped, _, _ = load_frames(path, max_frames=3, skip_frames=1)
    assert skipped.shape[0] == 3


def test_image_dir_mixed_formats(tmp_path):
    """A directory of .jpg images exercises the cv2 fallback branch (the
    native loader handles only PNG/PGM)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    imgs = [(rng.uniform(0, 255, (40, 56))).astype(np.uint8) for _ in range(3)]
    for i, img in enumerate(imgs):
        cv2.imwrite(str(tmp_path / f"{i:06d}.jpg"), img)
    frames, cam, _ = load_frames(str(tmp_path))
    assert frames.shape == (3, 40, 56)


def test_missing_input_raises():
    with pytest.raises(FileNotFoundError):
        load_frames("/nonexistent/clip.mp4")
