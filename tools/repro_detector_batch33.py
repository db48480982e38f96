"""Minimized repro: fused ORB detector hard-crashes the TPU v5e worker at
batch >= 33 KITTI-sized frames per program.

Observed: "worker process crashed or restarted" (UNAVAILABLE) from the
runtime; batch <= 32 is solid; every stage passes in isolation at batch 33
(pyramid resize with either weight implementation, Pallas corner AND the XLA
corner path, top-k, patch slicing, BRIEF), so the fault is in the COMBINED
program's codegen/resource handling, not any single kernel (bisection notes:
slamtpu/feature/detector.py module docstring).

Usage (WARNING: expected to kill the TPU worker — run when nothing else is
using the chip; recovery takes ~2-5 min):

    SLAMTPU_ALLOW_BIG_BATCH=1 python tools/repro_detector_batch33.py [batch]

Writes the optimized-HLO for the failing program to
/tmp/detector_batch<k>.hlo.txt BEFORE executing, so the artifact survives
the crash for attaching to a backend report.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SLAMTPU_ALLOW_BIG_BATCH", "1")

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from slamtpu.feature.detector import OrbConfig, detect_and_compute  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 33
    h, w = 376, 1241  # KITTI odometry camera frame
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(batch, h, w), dtype=np.uint8)

    fn = jax.jit(detect_and_compute, static_argnames=("config",))
    cfg = OrbConfig(max_features=500)
    lowered = fn.lower(frames, cfg)
    hlo_path = f"/tmp/detector_batch{batch}.hlo.txt"
    try:
        with open(hlo_path, "w") as f:
            f.write(lowered.compile().as_text())
        print(f"optimized HLO written to {hlo_path}")
    except Exception as e:  # keep going: the crash itself is the repro
        print(f"HLO dump failed ({type(e).__name__}: {e}); executing anyway")

    print(f"executing fused detector at batch {batch} ({h}x{w})...")
    feats = fn(frames, cfg)
    n = np.asarray(feats.mask).sum()
    print(f"SURVIVED: {n} keypoints across {batch} frames — the backend "
          "fault appears fixed on this runtime; the detector-batch guard "
          "(detector.py TPU_MAX_DETECTOR_BATCH) can be re-evaluated.")


if __name__ == "__main__":
    main()
