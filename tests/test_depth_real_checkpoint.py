"""Real published-checkpoint smoke test for MonoDepth2 (skip-if-absent).

Mirrors the reference's self-skipping weights test
(/root/reference/src/depth/monodepth2.rs:435-467): it runs only when genuine
upstream `encoder.pth` / `depth.pth` checkpoints are present (this image has
no network egress, so they cannot be fetched here; drop them into
`weights/` or point SLAMTPU_WEIGHTS at their directory — see docs/weights.md)
and otherwise skips cleanly. When present it exercises depth/convert.py on
the GENUINE key layout — the thing the synthetic-oracle tests in
test_depth.py cannot cover — plus a plausibility check on the disparity.
"""

import os

import numpy as np
import pytest

_CANDIDATE_DIRS = [
    os.environ.get("SLAMTPU_WEIGHTS", ""),
    os.path.join(os.path.dirname(__file__), "..", "weights"),
    os.path.expanduser("~/weights"),
]


def _find_weights():
    for d in _CANDIDATE_DIRS:
        if not d:
            continue
        enc = os.path.join(d, "encoder.pth")
        dep = os.path.join(d, "depth.pth")
        if os.path.exists(enc) and os.path.exists(dep):
            return enc, dep
    return None


weights = _find_weights()
pytestmark = pytest.mark.skipif(
    weights is None,
    reason="published MonoDepth2 checkpoints not present "
    "(weights/encoder.pth + weights/depth.pth; see docs/weights.md)",
)


def test_real_checkpoint_roundtrip():
    enc_path, dep_path = weights
    from slamtpu.depth.convert import load_state_dict

    # The published encoder.pth carries the input geometry; honor it.
    enc_sd = load_state_dict(enc_path)
    height = int(enc_sd.get("height", 192))
    width = int(enc_sd.get("width", 640))

    from slamtpu.depth.monodepth2 import MonoDepth2

    model = MonoDepth2(
        encoder_path=enc_path, depth_path=dep_path, width=width, height=height
    )

    # A structured synthetic image: gradient sky + "ground plane" + blocks,
    # enough depth cues that a trained model must output non-trivial,
    # smooth disparity.
    rng = np.random.default_rng(0)
    img = np.zeros((height, width, 3), np.float32)
    for y in range(height):
        img[y, :, :] = 80.0 + 120.0 * y / height  # brighter toward the bottom
    for _ in range(12):
        y0, x0 = rng.integers(height // 3, height - 20), rng.integers(0, width - 40)
        img[y0 : y0 + 18, x0 : x0 + 36] = rng.uniform(0, 255)
    disp = np.asarray(model.predict(img))

    assert disp.shape == (height, width)
    assert np.isfinite(disp).all()
    assert 0.0 <= disp.min() and disp.max() <= 1.0
    # A real checkpoint produces structure, not a constant field.
    assert disp.std() > 0.01, f"disparity nearly constant (std {disp.std():.5f})"
    # Sigmoid head saturating everywhere would indicate a broken conversion.
    assert 0.02 < disp.mean() < 0.98
