"""Per-keypoint patch extraction as a Pallas TPU kernel.

The descriptor stage needs a (2r+1)^2 window around each of K keypoints per
frame (ops/brief.py). The XLA form — K vmapped `lax.dynamic_slice` calls
against the HBM-resident level image — is the single largest cost of the
whole ORB detector on v5e: 16k slices per 32-frame KITTI chunk, each a
small strided HBM read, measured 0.95 ms/frame (~40% of detect_and_compute;
tools/profile_detect_cumulative.py r5). A fused [K, P, P] advanced-indexing
gather is worse still (~5x, ops/brief.py note).

Here each grid program pins one frame's level image in VMEM (levels are
<= 2.5 MB padded at KITTI size) and cuts all K windows out of VMEM. Mosaic
requires dynamic slice starts to be tile-aligned (sublane multiple of 8,
lane multiple of 128), so each window is read as an ALIGNED [8+size', 2*128]
block and rotated into place with dynamic `pltpu.roll` — a few register
shifts per keypoint instead of an HBM round trip.

Counterpart of the per-keypoint patch reads OpenCV ORB does on the CPU
behind /root/reference/src/feature/detector.rs:26-40.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["extract_patches_batched"]


def _kernel(starts_ref, img_ref, out_ref, *, size, n_kp):
    rows = ((size + 7) // 8) * 8 + 8  # aligned row block covering dy in [0,8)
    lanes = 256  # two lane tiles cover dx in [0,128) + size <= 128

    def body(i, carry):
        x0 = starts_ref[0, i, 0]
        y0 = starts_ref[0, i, 1]
        ya = (y0 // 8) * 8
        xa = (x0 // 128) * 128
        blk = img_ref[0, pl.ds(ya, rows), pl.ds(xa, lanes)]
        blk = pltpu.roll(blk, (rows - (y0 - ya)) % rows, axis=0)
        blk = pltpu.roll(blk, (lanes - (x0 - xa)) % lanes, axis=1)
        out_ref[0, i] = blk[:size, :size]
        return carry

    jax.lax.fori_loop(0, n_kp, body, 0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def extract_patches_batched(images, starts, radius: int, interpret: bool = False):
    """[B, H, W] f32 + window starts [B, K, 2] int32 (x0, y0) ->
    [B, K, 2r+1, 2r+1] f32.

    Starts must satisfy 0 <= x0 <= W-size, 0 <= y0 <= H-size (the detector
    keeps keypoints `radius` inside the border and parks masked slots at the
    frame center, so this holds by construction; values are clamped anyway
    because an out-of-range VMEM read is undefined behavior, not an error).
    """
    b, h, w = images.shape
    k = starts.shape[1]
    size = 2 * radius + 1
    rows = ((size + 7) // 8) * 8 + 8
    # Headroom so every ALIGNED block read stays in bounds: the row block
    # needs up to `rows` past the last aligned start, the lane block two
    # full tiles past the last aligned lane start.
    h_pad = ((h + 7) // 8) * 8 + rows
    w_pad = ((w + 127) // 128) * 128 + 256
    padded = jnp.pad(images, ((0, 0), (0, h_pad - h), (0, w_pad - w)))
    starts = jnp.stack(
        [
            jnp.clip(starts[..., 0], 0, max(w - size, 0)),
            jnp.clip(starts[..., 1], 0, max(h - size, 0)),
        ],
        axis=-1,
    ).astype(jnp.int32)

    return pl.pallas_call(
        functools.partial(_kernel, size=size, n_kp=k),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h_pad, w_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, k, size, size), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, k, size, size), jnp.float32),
        interpret=interpret,
    )(starts, padded)
