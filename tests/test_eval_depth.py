"""tools/eval_depth.py — the ready-to-run MonoDepth2 accuracy eval
(VERDICT r2 next-round #6). The real checkpoints don't exist in this
environment, so these tests pin the PROTOCOL (Eigen crop, metric formulas,
disp->depth, median scaling) against hand-computed values and smoke the full
CLI on random-init weights + synthetic ground truth, so the tool is known
to run end-to-end the day weights and a KITTI GT dump land on disk."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import eval_depth  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_metrics_hand_values():
    gt = np.array([2.0, 4.0])
    pred = np.array([1.0, 5.0])
    m = eval_depth.compute_metrics(gt, pred)
    # abs_rel = mean(|2-1|/2, |4-5|/4) = mean(0.5, 0.25)
    assert np.isclose(m["abs_rel"], 0.375)
    # rmse = sqrt(mean(1, 1)) = 1
    assert np.isclose(m["rmse"], 1.0)
    # thresh = max(gt/p, p/gt) = (2, 1.25); a1 counts < 1.25 strictly
    assert np.isclose(m["a1"], 0.0)
    assert np.isclose(m["a2"], 0.5)
    assert np.isclose(m["a3"], 0.5)


def test_metrics_perfect_prediction():
    gt = np.linspace(1.0, 50.0, 100)
    m = eval_depth.compute_metrics(gt, gt.copy())
    assert m["abs_rel"] == 0.0 and m["rmse"] == 0.0
    assert m["a1"] == m["a2"] == m["a3"] == 1.0


def test_disp_to_depth_range():
    # Upstream layers.disp_to_depth: sigmoid 0 -> max_depth, 1 -> min_depth.
    assert np.isclose(eval_depth.disp_to_depth(np.array(0.0)), 100.0)
    assert np.isclose(eval_depth.disp_to_depth(np.array(1.0)), 0.1)
    d = eval_depth.disp_to_depth(np.linspace(0, 1, 11))
    assert np.all(np.diff(d) < 0)  # monotonically nearer


def test_eigen_crop_fractions():
    mask = eval_depth.eigen_crop_mask(375, 1242)  # full KITTI frame
    rows = np.nonzero(mask.any(axis=1))[0]
    cols = np.nonzero(mask.any(axis=0))[0]
    assert rows[0] == int(0.40810811 * 375) and rows[-1] == int(0.99189189 * 375) - 1
    assert cols[0] == int(0.03594771 * 1242) and cols[-1] == int(0.96405229 * 1242) - 1


def test_gt_loaders(tmp_path):
    depth = np.random.default_rng(0).uniform(1.0, 60.0, (48, 64))
    np.save(tmp_path / "a.npy", depth.astype(np.float32))
    assert np.allclose(eval_depth.load_gt(str(tmp_path / "a.npy")), depth, atol=1e-4)

    cv2 = pytest.importorskip("cv2")
    raw16 = (depth * 256.0).astype(np.uint16)
    cv2.imwrite(str(tmp_path / "b.png"), raw16)
    loaded = eval_depth.load_gt(str(tmp_path / "b.png"))
    assert np.allclose(loaded, raw16.astype(np.float64) / 256.0)


@pytest.mark.slow
def test_cli_smoke_random_init(tmp_path):
    """Full CLI run: random-init model, 3 synthetic images + .npy GT. Asserts
    the seven metrics print as finite numbers (plumbing, not accuracy)."""
    cv2 = pytest.importorskip("cv2")
    img_dir, gt_dir = tmp_path / "img", tmp_path / "gt"
    img_dir.mkdir(), gt_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        img = rng.integers(0, 255, (96, 320, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"f{i}.png"), img)
        np.save(gt_dir / f"f{i}.npy", rng.uniform(2.0, 70.0, (96, 320)).astype(np.float32))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_depth.py"),
         "--images", str(img_dir), "--gt", str(gt_dir), "--batch", "3"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RANDOM-INIT" in out.stderr
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert "evaluated 3 images" in lines[0]
    vals = [float(v) for v in lines[2].split()]
    assert len(vals) == 7 and np.all(np.isfinite(vals))
