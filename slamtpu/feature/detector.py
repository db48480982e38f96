"""ORB keypoint detector + descriptor over batched image pyramids.

TPU-native counterpart of /root/reference/src/feature/detector.rs (OpenCV
ORB::create behind it). Parameter parity targets OpenCV's *effective*
defaults — nfeatures=500, scaleFactor=1.2, nlevels=8, edgeThreshold=31,
fastThreshold=20, Harris ranking, 31px rBRIEF patch — because the reference
stores `max_features` but never passes it to OpenCV (detector.rs:15-18
constructs with ORB::create_def; see SURVEY.md §2 quirk). Here `max_features`
is honored properly.

Design: everything is fixed-shape. Each pyramid level contributes a static
quota of keypoints (OpenCV's geometric per-level distribution); short levels
pad with masked slots. The whole detector is one jit program: dense FAST +
NMS + Harris maps, top-k per level, patch slicing, orientation, steered
BRIEF — batched over a leading [B] image axis.

TPU batch envelope: on the current v5e runtime, the FUSED detector program
HARD-CRASHES the TPU worker ("worker process crashed or restarted") at
KITTI-sized inputs once the batch exceeds 32 frames/program (33 and 34
reproduce; <= 32 is solid). Bisected r4: every stage passes in isolation at
batch 33 (pyramid levels, Pallas corner AND the XLA corner path, top-k,
patches, BRIEF — and the failure reproduces with both resize-weight
implementations), so this is a backend codegen/resource fault in the
combined program, not any single kernel. Pipeline chunk defaults keep
windows at 32 frames (chunk=31 pairs); respect the envelope when batching
this detector directly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.brief import PATCH_RADIUS, brief_descriptors, extract_patches, orientation
from ..ops.fast import fast_score, nms3x3
from ..ops.harris import harris_response
from ..ops.pyramid import build_pyramid, gaussian_blur

__all__ = ["OrbConfig", "OrbFeatures", "OrbDetector", "detect_and_compute", "features_per_level"]


# Largest detector batch that is known-safe per program on the current TPU
# v5e runtime (see module note: 33+ hard-crashes the worker). Guarded at the
# API boundary so config drift (a CLI --chunk 64, a bench env knob) fails
# with an actionable error instead of killing the TPU worker mid-run.
TPU_MAX_DETECTOR_BATCH = 32


def _check_tpu_batch_envelope(batch: int) -> None:
    """Raise (at trace time — batch is static) when a detector batch would
    exceed the TPU worker's safe envelope. Repro for the backend report:
    tools/repro_detector_batch33.py. Override with
    SLAMTPU_ALLOW_BIG_BATCH=1 (e.g. on a runtime where the fault is fixed)."""
    if batch <= TPU_MAX_DETECTOR_BATCH:
        return
    import os

    if os.environ.get("SLAMTPU_ALLOW_BIG_BATCH") == "1":
        return
    if any(d.platform != "cpu" for d in jax.devices()):
        raise ValueError(
            f"detector batch {batch} exceeds the TPU-safe envelope of "
            f"{TPU_MAX_DETECTOR_BATCH} frames/program: the fused detector "
            "hard-crashes the v5e TPU worker at batch >= 33 on KITTI-sized "
            "frames (slamtpu/feature/detector.py module note; minimized "
            "repro: tools/repro_detector_batch33.py). Use chunks of <= "
            f"{TPU_MAX_DETECTOR_BATCH} frames (pipelines' chunk_size <= "
            f"{TPU_MAX_DETECTOR_BATCH + 1}), or set SLAMTPU_ALLOW_BIG_BATCH=1 "
            "to bypass on a runtime where this backend fault is fixed."
        )


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    max_features: int = 500
    scale_factor: float = 1.2
    n_levels: int = 8
    fast_threshold: float = 20.0
    edge_threshold: int = 31
    patch_size: int = 31
    # TPU's sort-free approximate top-k for Harris ranking (recall ~0.95;
    # exact top_k sorts the whole score map and cost 165 ms/33 KITTI frames
    # on v5e). Exact on CPU either way.
    exact_topk: bool = False
    # Corner scoring backend: "auto" = fused Pallas kernel on accelerators,
    # XLA map ops on CPU; or force "pallas" / "xla".
    corner_backend: str = "auto"
    # Descriptor path: n_bins > 0 uses the ORB paper's discretized steering
    # (static sample indices per bin — much faster per-keypoint sampling on
    # TPU) with orientation measured on the blurred patch (halves the patch
    # gathers). 0 = OpenCV-style continuous rotation on the raw image.
    descriptor_bins: int = 12
    # Sub-pixel corner localization: 3x3 quadratic fit on the per-keypoint
    # Harris surface, applied at pyramid levels <= subpixel_max_octave only.
    # Keypoints are otherwise integer at their pyramid level, i.e. quantized
    # by scale_factor^level once mapped to level-0 coordinates. Measured on
    # textured synthetic lateral scenes: the fit tightens flow error at fine
    # levels (0.43 -> 0.37 px median at level 0) but ADDS noise at coarse
    # levels, where the Harris surface is poorly sampled and the offset is
    # amplified by the level scale — hence the octave gate. cv2's ORB does
    # not refine at all (pose fidelity tests compare at the match/pose
    # level, so beating its localization is allowed — SURVEY.md §7 hard
    # part 1).
    subpixel: bool = True
    subpixel_max_octave: int = 2


class OrbFeatures(NamedTuple):
    """Struct-of-arrays keypoints+descriptors, fixed K slots with a mask.

    Coordinates are level-0 pixels (x, y); `octave` is the pyramid level;
    `size` the scaled patch diameter; `response` the Harris score; `angle`
    the orientation in radians; `descriptors` packed 256-bit rBRIEF.
    """

    xy: jnp.ndarray  # [..., K, 2] float32
    response: jnp.ndarray  # [..., K]
    angle: jnp.ndarray  # [..., K]
    octave: jnp.ndarray  # [..., K] int32
    size: jnp.ndarray  # [..., K]
    descriptors: jnp.ndarray  # [..., K, 32] uint8
    mask: jnp.ndarray  # [..., K] bool

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)


def features_per_level(max_features: int, n_levels: int, scale_factor: float):
    """OpenCV's geometric keypoint quota per level (last takes the remainder)."""
    factor = 1.0 / scale_factor
    n_first = max_features * (1.0 - factor) / (1.0 - factor**n_levels)
    quotas = []
    acc = 0
    for level in range(n_levels - 1):
        q = int(round(n_first * factor**level))
        quotas.append(q)
        acc += q
    quotas.append(max(max_features - acc, 0))
    return quotas


def _use_pallas(config: OrbConfig) -> bool:
    if config.corner_backend == "pallas":
        return True
    if config.corner_backend == "xla":
        return False
    return jax.default_backend() not in ("cpu",)  # auto: pallas on accelerators


def _ranked_corner_maps(level_images, config: OrbConfig, with_harris: bool = False):
    """[B, H, W] -> ranked map [B, H, W]: Harris where a FAST corner survives
    NMS, -inf elsewhere. Pallas fused kernel on TPU, XLA ops elsewhere.
    with_harris=True also returns the dense Harris map (for sub-pixel fits)."""
    if _use_pallas(config):
        from ..ops.pallas_corner import corner_response

        return corner_response(level_images, config.fast_threshold, with_harris=with_harris)
    score = nms3x3(fast_score(level_images, config.fast_threshold))
    harris = harris_response(level_images)
    neg_inf = jnp.asarray(-jnp.inf, harris.dtype)
    ranked = jnp.where(score > 0.0, harris, neg_inf)
    return (ranked, harris) if with_harris else ranked


def _subpixel_offsets(harris_map, xy):
    """Quadratic-fit sub-pixel offsets from the dense Harris surface.

    harris_map: [H, W] dense response (free byproduct of corner ranking);
    xy: [K, 2] integer-valued keypoint coords. Gathers each keypoint's 3x3
    neighborhood and fits a 1-D parabola per axis. Returns [K, 2] offsets in
    (-0.5, 0.5); 0 where the response is not locally concave (the NMS ran on
    the FAST score, so the Harris surface is not guaranteed to peak at the
    center).
    """
    # One fused gather ([K, 3, 3] advanced indexing) instead of K vmapped
    # dynamic_slices — the slice form lowered to a serial per-keypoint
    # gather chain and cost ~70 fps on the KITTI-frame bench.
    xi = jnp.round(xy).astype(jnp.int32)
    offs = jnp.arange(-1, 2, dtype=jnp.int32)
    rows = xi[:, 1][:, None, None] + offs[None, :, None]
    cols = xi[:, 0][:, None, None] + offs[None, None, :]
    s = harris_map[rows, cols]  # [K, 3, 3]

    def parabola(lo, c, hi):
        denom = lo - 2.0 * c + hi
        off = jnp.where(denom < 0, 0.5 * (lo - hi) / jnp.where(denom < 0, denom, -1.0), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    dx = parabola(s[:, 1, 0], s[:, 1, 1], s[:, 1, 2])
    dy = parabola(s[:, 0, 1], s[:, 1, 1], s[:, 2, 1])
    return jnp.stack([dx, dy], axis=-1)


def _select_level(ranked, quota, margin, exact_topk, h, w, harris_map=None):
    """Top-`quota` Harris-ranked FAST corners for ONE image's level.

    ranked: [H, W]. Returns (xy [quota, 2] integer centers, xy_out reported
    coords incl. sub-pixel term, top_vals, mask)."""
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= margin) & (row < h - margin) & (col >= margin) & (col < w - margin)

    neg_inf = jnp.asarray(-jnp.inf, ranked.dtype)
    ranked = jnp.where(interior, ranked, neg_inf).reshape(-1)
    if exact_topk:
        top_vals, top_idx = jax.lax.top_k(ranked, quota)
    else:
        top_vals, top_idx = jax.lax.approx_max_k(ranked, quota, recall_target=0.95)
    mask = jnp.isfinite(top_vals)

    x = (top_idx % w).astype(jnp.float32)
    y = (top_idx // w).astype(jnp.float32)
    # Park masked slots at the patch-safe center so downstream slicing reads
    # valid memory (values are discarded via the mask).
    x = jnp.where(mask, x, w // 2)
    y = jnp.where(mask, y, h // 2)
    xy = jnp.stack([x, y], axis=-1)
    xy_out = xy + _subpixel_offsets(harris_map, xy) if harris_map is not None else xy
    # Patch extraction keeps the integer centers (dynamic_slice rounds
    # anyway); only the reported coordinates gain the sub-pixel term.
    return xy, xy_out, jnp.where(mask, top_vals, 0.0), mask


def _extract_patches_level(images, xy):
    """Batched per-keypoint windows: [B, H, W] + [B, K, 2] -> [B, K, P, P].

    Pallas VMEM kernel on accelerators (ops/pallas_patch.py — the XLA
    vmapped-dynamic_slice form is 16k small HBM reads per 32-frame chunk,
    ~40% of the whole detector); vmapped dynamic_slice elsewhere."""
    if jax.default_backend() not in ("cpu",):
        from ..ops.pallas_patch import extract_patches_batched

        starts = jnp.round(xy).astype(jnp.int32) - PATCH_RADIUS
        return extract_patches_batched(images, starts, PATCH_RADIUS)
    return jax.vmap(lambda img, k: extract_patches(img, k, PATCH_RADIUS))(images, xy)


def _detect_level(ranked, image, blurred, quota, margin, exact_topk, descriptor_bins,
                  harris_map=None):
    """One pyramid level for one image (compatibility path: per-image, XLA
    patch slicing). The batched API below splits selection and description
    so patch extraction can run as ONE Pallas call per level."""
    h, w = image.shape
    xy, xy_out, resp, mask = _select_level(
        ranked, quota, margin, exact_topk, h, w, harris_map
    )

    if descriptor_bins > 0:
        # Fast path: ONE patch per keypoint (blurred), orientation measured
        # on it, binned steering with static sample indices.
        from ..ops.brief import brief_descriptors_binned

        blurred_patches = extract_patches(blurred, xy, PATCH_RADIUS)
        angles = orientation(blurred_patches)
        descriptors = brief_descriptors_binned(blurred_patches, angles, descriptor_bins)
    else:
        patches = extract_patches(image, xy, PATCH_RADIUS)
        angles = orientation(patches)
        blurred_patches = extract_patches(blurred, xy, PATCH_RADIUS)
        descriptors = brief_descriptors(blurred_patches, angles)

    return xy_out, resp, angles, descriptors, mask


@functools.partial(jax.jit, static_argnames=("config",))
def detect_and_compute(images, config: OrbConfig = OrbConfig()):
    """Batched ORB: [B, H, W] (float or uint8) -> OrbFeatures with
    K = config.max_features slots per image."""
    images = jnp.asarray(images)
    _check_tpu_batch_envelope(images.shape[0])
    if images.dtype != jnp.float32:
        images = images.astype(jnp.float32)

    pyramid = build_pyramid(images, config.n_levels, config.scale_factor)
    quotas = features_per_level(config.max_features, config.n_levels, config.scale_factor)

    outs = []
    batch = images.shape[0]
    for level, (level_images, quota) in enumerate(zip(pyramid, quotas)):
        if quota == 0:
            continue
        scale = config.scale_factor**level
        h_l, w_l = level_images.shape[1:]
        min_extent = max(2 * PATCH_RADIUS + 1, 2 * config.edge_threshold + 1)
        if min(h_l, w_l) < min_extent:
            # Level too small for the descriptor patch / border margin (can
            # only happen on tiny inputs): keep the quota as masked slots so
            # K stays static across the pyramid regardless of image size.
            outs.append(
                OrbFeatures(
                    xy=jnp.zeros((batch, quota, 2), jnp.float32),
                    response=jnp.zeros((batch, quota), jnp.float32),
                    angle=jnp.zeros((batch, quota), jnp.float32),
                    octave=jnp.full((batch, quota), level, jnp.int32),
                    size=jnp.full((batch, quota), config.patch_size * scale, jnp.float32),
                    descriptors=jnp.zeros((batch, quota, 32), jnp.uint8),
                    mask=jnp.zeros((batch, quota), bool),
                )
            )
            continue
        blurred = gaussian_blur(level_images)
        want_sub = config.subpixel and level <= config.subpixel_max_octave
        maps = _ranked_corner_maps(level_images, config, with_harris=want_sub)
        ranked, harris_maps = maps if want_sub else (maps, None)
        # Selection (vmapped, cheap) is split from description so the patch
        # windows can be cut in ONE batched call per level (Pallas on TPU —
        # see _extract_patches_level).
        if want_sub:
            xy_int, xy, resp, mask = jax.vmap(
                lambda rank, hm: _select_level(
                    rank, quota, config.edge_threshold, config.exact_topk,
                    h_l, w_l, hm,
                )
            )(ranked, harris_maps)
        else:
            xy_int, xy, resp, mask = jax.vmap(
                lambda rank: _select_level(
                    rank, quota, config.edge_threshold, config.exact_topk, h_l, w_l,
                )
            )(ranked)
        if config.descriptor_bins > 0:
            from ..ops.brief import brief_descriptors_binned

            blurred_patches = _extract_patches_level(blurred, xy_int)
            ang = jax.vmap(orientation)(blurred_patches)
            desc = jax.vmap(
                lambda p, a: brief_descriptors_binned(p, a, config.descriptor_bins)
            )(blurred_patches, ang)
        else:
            patches = _extract_patches_level(level_images, xy_int)
            ang = jax.vmap(orientation)(patches)
            blurred_patches = _extract_patches_level(blurred, xy_int)
            desc = jax.vmap(brief_descriptors)(blurred_patches, ang)
        outs.append(
            OrbFeatures(
                xy=xy * scale,
                response=resp,
                angle=ang,
                octave=jnp.full(mask.shape, level, jnp.int32),
                size=jnp.full(mask.shape, config.patch_size * scale, jnp.float32),
                descriptors=desc,
                mask=mask,
            )
        )

    return OrbFeatures(*[jnp.concatenate(parts, axis=1) for parts in zip(*outs)])


class OrbDetector:
    """Eager wrapper mirroring detector.rs:9-40.

    Unlike the reference (which silently ignores max_features — see module
    docstring), the requested budget is honored.
    """

    def __init__(self, max_features: int = 500, config: OrbConfig | None = None):
        self.config = dataclasses.replace(config or OrbConfig(), max_features=max_features)

    def detect(self, image):
        """Keypoints only (detector.rs:20-24). Accepts [H, W] or [B, H, W]."""
        return self.detect_and_compute(image)

    def detect_and_compute(self, image) -> OrbFeatures:
        """Keypoints + descriptors (detector.rs:26-40)."""
        image = jnp.asarray(image)
        single = image.ndim == 2
        if single:
            image = image[None]
        feats = detect_and_compute(image, self.config)
        if single:
            feats = jax.tree_util.tree_map(lambda x: x[0], feats)
        return feats
