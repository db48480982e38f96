"""FAST-9/16 corner scores with non-maximum suppression.

The segment-test detector inside OpenCV's ORB (behind
/root/reference/src/feature/detector.rs:26-40; threshold 20, 9-contiguous of
16 circle pixels). Implemented as dense, branch-free map ops over [B, H, W]
images:

  * the 16 Bresenham-circle neighbors are materialized as rolled copies —
    XLA fuses the rolls into the consumer, so this is one pass over HBM;
  * the "9 contiguous of 16" test uses a min-tree over the circular index
    axis (windows of 2, 4, 8, then 9 via one extra min) — 4 rounds of
    elementwise minima instead of 16x9 comparisons;
  * the corner score is the classical one: max over the 16 arcs of the
    arc-minimum absolute difference (= the largest threshold at which the
    pixel remains a corner), which is what OpenCV's FAST NMS compares.

Everything is VPU-friendly elementwise math; no gathers, no data-dependent
shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["CIRCLE_OFFSETS", "fast_score", "nms3x3"]

# Bresenham circle of radius 3, clockwise from 12 o'clock ((dy, dx) pairs).
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

_ARC = 9  # contiguous run length for FAST-9


def _circular_window_min(d, window):
    """Min over circular windows of `window` consecutive entries along axis 0.

    d: [16, ...]. Returns [16, ...] where out[k] = min(d[k], ..., d[k+w-1])
    with wraparound. Doubling min-tree, then one overlapped combine for the
    non-power-of-two remainder: min[k, k+w) = min(minP[k], minP[k+w-P]) for
    the largest power of two P with 2P >= w — O(log w) rounds total.
    """
    min_p = d
    p = 1
    while p * 2 <= window:
        min_p = jnp.minimum(min_p, jnp.roll(min_p, -p, axis=0))
        p *= 2
    if p < window:
        assert 2 * p >= window, "overlapped combine needs 2P >= window"
        min_p = jnp.minimum(min_p, jnp.roll(min_p, -(window - p), axis=0))
    return min_p


@functools.partial(jax.jit, static_argnames=("threshold",))
def fast_score(images, threshold: float = 20.0):
    """FAST-9/16 corner score map.

    images: [B, H, W] float (grayscale intensities).
    Returns [B, H, W] float scores: 0 where not a corner, else the largest
    threshold at which the segment test still passes. A 3-pixel border is
    always 0 (the circle would leave the image).
    """
    diffs = jnp.stack(
        [jnp.roll(images, (-dy, -dx), axis=(1, 2)) - images for dy, dx in CIRCLE_OFFSETS],
        axis=0,
    )  # [16, B, H, W]; entry k = I(p + offset_k) - I(p)

    bright = _circular_window_min(diffs, _ARC)  # min over 9-arc of (neighbor - center)
    dark = _circular_window_min(-diffs, _ARC)  # min over 9-arc of (center - neighbor)

    score_bright = jnp.max(bright, axis=0)
    score_dark = jnp.max(dark, axis=0)
    score = jnp.maximum(score_bright, score_dark)
    score = jnp.where(score > threshold, score, 0.0)

    # Zero the 3-pixel border where rolls wrapped around.
    b, h, w = images.shape
    row = jnp.arange(h)[None, :, None]
    col = jnp.arange(w)[None, None, :]
    interior = (row >= 3) & (row < h - 3) & (col >= 3) & (col < w - 3)
    return jnp.where(interior, score, 0.0)


@jax.jit
def nms3x3(score):
    """3x3 non-maximum suppression: keep strictly-greater-than-neighbors maxima.

    score: [B, H, W]. Returns the score map with non-maxima zeroed. Exact-tie
    plateaus of equal adjacent scores are suppressed on BOTH sides (strict >):
    no raster-order tie-break, unlike cv2.FAST. Ties are vanishingly rare with
    float Harris/FAST scores, and the Pallas kernel matches this behavior, so
    backends stay consistent.
    """
    neighbor_max = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = jnp.roll(score, (-dy, -dx), axis=(1, 2))
            neighbor_max = shifted if neighbor_max is None else jnp.maximum(neighbor_max, shifted)
    keep = score > neighbor_max
    return jnp.where(keep, score, 0.0)
