"""Minimal smoke binary, mirroring /root/reference/src/main.rs:37-61:
open an input, detect ORB features, report counts every 30 frames."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="slamtpu smoke test")
    parser.add_argument("input", nargs="?", default="synthetic:60")
    parser.add_argument("--max-features", type=int, default=500)
    args = parser.parse_args(argv)

    from ..feature.detector import OrbConfig, detect_and_compute
    from ..io.video import load_frames

    frames, _, _ = load_frames(args.input)
    print(f"Opened {args.input}: {frames.shape[0]} frames {frames.shape[1]}x{frames.shape[2]}")

    feats = detect_and_compute(frames, OrbConfig(max_features=args.max_features))
    counts = np.asarray(feats.count())
    for f in range(0, frames.shape[0], 30):
        print(f"Frame {f:4}: {counts[f]} features")
    print(f"Done. mean features/frame: {counts.mean():.1f}")


if __name__ == "__main__":
    main()
