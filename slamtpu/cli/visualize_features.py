"""Feature visualization CLI, mirroring examples/visualize_features.rs.

Detects + matches consecutive frames; without a GUI it reports per-frame
keypoint/match counts and optionally writes match-overlay images (needs cv2).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="slamtpu feature visualization")
    parser.add_argument("input")
    parser.add_argument("--max-features", type=int, default=500)
    parser.add_argument("--max-frames", type=int, default=100)
    parser.add_argument("--save-overlays", metavar="DIR", help="write match images (needs cv2)")
    args = parser.parse_args(argv)

    import jax

    from ..feature.detector import OrbConfig, detect_and_compute
    from ..feature.matcher import FeatureMatcher
    from ..io.video import load_frames

    frames, _, _ = load_frames(args.input, max_frames=args.max_frames)
    config = OrbConfig(max_features=args.max_features)
    matcher = FeatureMatcher()

    feats = detect_and_compute(frames.astype(np.float32), config)
    counts = np.asarray(feats.count())
    total_matches = 0
    for t in range(1, frames.shape[0]):
        d1 = jax.tree_util.tree_map(lambda x: x[t - 1], feats)
        d2 = jax.tree_util.tree_map(lambda x: x[t], feats)
        good = matcher.filter_good_matches(
            matcher.match_descriptors(d1.descriptors, d2.descriptors, d1.mask, d2.mask)
        )
        n = int(good.count())
        total_matches += n
        if t % 10 == 0 or t == 1:
            print(f"Frame {t:4} | keypoints {counts[t]:4} | good matches {n:4}")
        if args.save_overlays:
            _save_overlay(args.save_overlays, t, frames[t - 1], frames[t], d1, d2, good)

    print(f"\nFrames: {frames.shape[0]}")
    print(f"Mean keypoints/frame: {counts.mean():.1f}")
    print(f"Mean good matches/pair: {total_matches / max(frames.shape[0] - 1, 1):.1f}")


def _save_overlay(outdir, t, img1, img2, f1, f2, good):
    import os

    import cv2

    os.makedirs(outdir, exist_ok=True)
    canvas = np.concatenate([img1, img2], axis=1)
    canvas = cv2.cvtColor(canvas, cv2.COLOR_GRAY2BGR)
    w = img1.shape[1]
    live = np.asarray(good.mask)
    xy1 = np.asarray(f1.xy)[live]
    xy2 = np.asarray(f2.xy)[np.asarray(good.train_idx)[live]]
    for (x1, y1), (x2, y2) in zip(xy1, xy2):
        cv2.line(canvas, (int(x1), int(y1)), (int(x2) + w, int(y2)), (0, 255, 0), 1)
    cv2.imwrite(os.path.join(outdir, f"matches_{t:05d}.png"), canvas)


if __name__ == "__main__":
    main()
