"""Rotated BRIEF descriptors and intensity-centroid orientation.

The descriptor half of ORB (behind /root/reference/src/feature/detector.rs:
26-40: 256-bit rBRIEF over a 31x31 patch on the blurred image, steered by the
intensity-centroid angle).

The 256 point-pair sampling pattern is generated here from a fixed PRNG
(isotropic Gaussian with sigma = patch/5 per the BRIEF paper, clipped to the
patch), NOT copied from OpenCV's learned table — descriptors are therefore
not bit-compatible with cv2's, but the pipeline is self-consistent and
fidelity is asserted at the match/pose level (SURVEY.md §7 "compare at the
match/pose level, not the keypoint level").

All sampling is batched: per keypoint we slice one PATCH x PATCH window
(static size, dynamic offset) and index it with the rotated pattern — a
[K, 256, 2] gather from VMEM-resident patches, no image-wide gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "HALF_PATCH",
    "PATCH_RADIUS",
    "PATCH_SIZE",
    "brief_pattern",
    "extract_patches",
    "orientation",
    "brief_descriptors",
    "brief_descriptors_binned",
]

HALF_PATCH = 15  # orientation circle radius (OpenCV HALF_PATCH_SIZE)
_PATTERN_CLIP = 13  # pattern coordinates live in [-13, 13] like OpenCV's table
PATCH_RADIUS = 19  # ceil(13 * sqrt(2)) — rotated pattern stays inside
PATCH_SIZE = 2 * PATCH_RADIUS + 1  # 39


@functools.lru_cache()
def brief_pattern(n_pairs: int = 256, seed: int = 0x0B12F):
    """Deterministic BRIEF point-pair pattern, [n_pairs, 4] int32 (x1,y1,x2,y2).

    Gaussian(0, (31/5)^2) sampling of both endpoints (BRIEF paper's G I
    scheme), clipped to +/-13. Fixed seed => the pattern is part of the
    descriptor format.
    """
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(n_pairs, 4))
    pts = np.clip(np.round(pts), -_PATTERN_CLIP, _PATTERN_CLIP).astype(np.int32)
    # Degenerate pairs (p1 == p2) would yield constant bits; nudge them.
    same = np.all(pts[:, :2] == pts[:, 2:], axis=1)
    pts[same, 2] = np.minimum(pts[same, 2] + 1, _PATTERN_CLIP)
    pts[same & (pts[:, 0] == pts[:, 2]), 2] -= 2
    # numpy, not jnp: the cache must never hold trace-scoped device constants.
    return pts


@functools.lru_cache()
def _orientation_weights():
    """Circular-mask (dx, dy) weight grids for the intensity centroid.

    Returns numpy (the cache must never hold trace-scoped device constants).
    """
    r = HALF_PATCH
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (dx * dx + dy * dy) <= r * r
    return (dx * mask).astype(np.float32), (dy * mask).astype(np.float32)


def extract_patches(image, xy, radius: int = PATCH_RADIUS):
    """Slice a (2r+1)^2 window around each integer keypoint.

    image: [H, W]; xy: [K, 2] float pixel coords (x, y). Returns
    [K, 2r+1, 2r+1]. Uses vmapped dynamic_slice — keypoints are kept
    `radius` away from the border by the detector, so the implicit clamp
    never engages.
    """
    size = 2 * radius + 1
    # Vmapped dynamic_slice, NOT advanced-indexing gather: for these large
    # (31x31) windows the fused [K, P, P] gather lowered ~5x SLOWER on v5e
    # (measured 98 vs 510 bench fps) — the opposite of the tiny 3x3 case in
    # feature/detector._subpixel_offsets, where the fused gather wins.
    starts = jnp.round(xy).astype(jnp.int32) - radius  # (x0, y0)

    def one(start):
        return jax.lax.dynamic_slice(image, (start[1], start[0]), (size, size))

    return jax.vmap(one)(starts)


def orientation(patches):
    """Intensity-centroid angle per patch (IC_Angle in OpenCV ORB).

    patches: [K, P, P] with P >= 31; the central 31x31 circular region is
    used. Returns [K] angles in radians: atan2(m01, m10).
    """
    wx_np, wy_np = _orientation_weights()
    wx, wy = jnp.asarray(wx_np), jnp.asarray(wy_np)
    p = patches.shape[-1]
    c = (p - 1) // 2
    r = HALF_PATCH
    center = patches[..., c - r : c + r + 1, c - r : c + r + 1]
    m10 = jnp.sum(center * wx, axis=(-2, -1))
    m01 = jnp.sum(center * wy, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def brief_descriptors(blurred_patches, angles, pattern=None):
    """Steered 256-bit BRIEF from pre-blurred patches.

    blurred_patches: [K, P, P] (P = PATCH_SIZE) windows of the blurred level
    image; angles: [K] radians. Returns packed uint8 [K, 32].

    Each pattern point (x, y) is rotated by the keypoint angle, rounded
    (cvRound semantics), and read from the patch; bit j of byte i is
    test(pair 8i+j) in little-bit order, matching ops.hamming's packing.
    """
    if pattern is None:
        pattern = jnp.asarray(brief_pattern())
    k = blurred_patches.shape[0]
    p = blurred_patches.shape[-1]
    c = (p - 1) // 2

    cos = jnp.cos(angles)[:, None]
    sin = jnp.sin(angles)[:, None]
    px1 = pattern[None, :, 0].astype(cos.dtype)
    py1 = pattern[None, :, 1].astype(cos.dtype)
    px2 = pattern[None, :, 2].astype(cos.dtype)
    py2 = pattern[None, :, 3].astype(cos.dtype)

    def rotate(px, py):
        rx = jnp.round(px * cos - py * sin).astype(jnp.int32) + c
        ry = jnp.round(px * sin + py * cos).astype(jnp.int32) + c
        return rx, ry

    x1, y1 = rotate(px1, py1)
    x2, y2 = rotate(px2, py2)

    flat = blurred_patches.reshape(k, p * p)
    v1 = jnp.take_along_axis(flat, y1 * p + x1, axis=1)
    v2 = jnp.take_along_axis(flat, y2 * p + x2, axis=1)
    bits = (v1 < v2).astype(jnp.uint8)  # [K, 256]

    from .hamming import pack_bits

    return pack_bits(bits)


@functools.lru_cache()
def _binned_sample_indices(n_bins: int, patch: int = PATCH_SIZE):
    """Static rotated-pattern sample indices per orientation bin.

    [n_bins, 512] int32 flat indices into a patch: pattern endpoints rotated
    by each bin's center angle, rounded and clipped — the ORB paper's
    discretized steering (12 bins of 30 degrees) instead of OpenCV's
    continuous per-keypoint rotation. With STATIC indices the per-keypoint
    sampling becomes a shared-index take (one permutation per bin) instead
    of a fully dynamic [K, 512] gather, which TPUs execute far faster.
    """
    pat = brief_pattern()  # [256, 4]
    pts = np.concatenate([pat[:, :2], pat[:, 2:]], axis=0).astype(np.float64)  # [512, 2]
    c = (patch - 1) // 2
    out = np.zeros((n_bins, 512), np.int32)
    for b in range(n_bins):
        ang = 2.0 * np.pi * b / n_bins
        ca, sa = np.cos(ang), np.sin(ang)
        x = np.round(pts[:, 0] * ca - pts[:, 1] * sa).astype(np.int64) + c
        y = np.round(pts[:, 0] * sa + pts[:, 1] * ca).astype(np.int64) + c
        x = np.clip(x, 0, patch - 1)
        y = np.clip(y, 0, patch - 1)
        out[b] = (y * patch + x).astype(np.int32)
    return out


def brief_descriptors_binned(blurred_patches, angles, n_bins: int = 12):
    """Steered BRIEF with discretized orientation (ORB paper, 12 bins).

    Each keypoint's angle snaps to the nearest bin; all keypoints are
    sampled with every bin's STATIC index set (cheap shared-index takes),
    then the right bin's values are selected. Descriptors differ from the
    continuous path by at most the sub-bin rotation (15 deg), which the
    Hamming matcher tolerates by design — this is the original ORB
    formulation; OpenCV's continuous rotation is its own refinement.
    """
    k = blurred_patches.shape[0]
    p = blurred_patches.shape[-1]
    flat = blurred_patches.reshape(k, p * p)
    idx = jnp.asarray(_binned_sample_indices(n_bins, p))  # [n_bins, 512]

    # [n_bins, K, 512] sampled values via shared-index takes.
    sampled = jnp.stack([flat[:, idx[b]] for b in range(n_bins)], axis=0)

    two_pi = 2.0 * jnp.pi
    frac = (angles / two_pi) % 1.0
    bin_idx = jnp.round(frac * n_bins).astype(jnp.int32) % n_bins  # nearest bin
    vals = jnp.take_along_axis(
        sampled, bin_idx[None, :, None].astype(jnp.int32), axis=0
    )[0]  # [K, 512]

    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint8)

    from .hamming import pack_bits

    return pack_bits(bits)
