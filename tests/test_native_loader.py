"""Native C++ frame loader vs cv2 decoding oracle."""

import os

import cv2
import numpy as np
import pytest

from slamtpu.io.native_loader import NativeFrameLoader, load_frames_native, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="g++/zlib unavailable")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("frames")
    truth = []
    for i in range(12):
        img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        if i % 3 == 0:
            cv2.imwrite(str(d / f"f_{i:03d}.pgm"), img)
        elif i % 3 == 1:
            cv2.imwrite(str(d / f"f_{i:03d}.png"), img)  # gray PNG
        else:
            rgb = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"f_{i:03d}.png"), rgb)  # color PNG
            img = cv2.cvtColor(rgb, cv2.COLOR_BGR2GRAY)
        truth.append(img)
    return str(d), np.stack(truth)


def test_decodes_match_cv2(image_dir):
    d, truth = image_dir
    frames = load_frames_native(d)
    assert frames.shape == truth.shape
    # Gray PGM/PNG must be exact; RGB->gray may differ by 1 from cv2 rounding.
    diff = np.abs(frames.astype(int) - truth.astype(int))
    assert diff.max() <= 1
    exact = [i for i in range(12) if i % 3 != 2]
    np.testing.assert_array_equal(frames[exact], truth[exact])


def test_chunked_streaming_order(image_dir):
    d, truth = image_dir
    names = sorted(os.listdir(d))
    paths = [os.path.join(d, n) for n in names]
    with NativeFrameLoader(paths, threads=3, prefetch=4) as loader:
        got = [c for c in loader.chunks(5)]
    assert [c.shape[0] for c in got] == [5, 5, 2]
    stacked = np.concatenate(got)
    diff = np.abs(stacked.astype(int) - truth.astype(int))
    assert diff.max() <= 1


def test_resize_output(image_dir):
    d, truth = image_dir
    names = sorted(os.listdir(d))
    paths = [os.path.join(d, n) for n in names]
    with NativeFrameLoader(paths, out_size=(24, 32), threads=2) as loader:
        frames = loader.read(12)
    assert frames.shape == (12, 24, 32)
    # Nearest resize: each output pixel equals SOME input pixel.
    assert set(np.unique(frames[0])).issubset(set(np.unique(truth[0])))


def test_missing_file_yields_zero_frame(tmp_path, image_dir):
    d, _ = image_dir
    good = sorted(os.listdir(d))[0]
    paths = [os.path.join(d, good), str(tmp_path / "missing.png")]
    with NativeFrameLoader(paths) as loader:
        frames = loader.read(2)
    assert frames.shape[0] == 2
    assert frames[1].max() == 0
