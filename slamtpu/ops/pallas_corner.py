"""Fused FAST-9 + NMS + Harris corner ranking as a Pallas TPU kernel.

The XLA composition (ops/fast.py + ops/harris.py) materializes 16 rolled
copies of the image per level (~1 GB of HBM traffic for a 33-frame KITTI
chunk) and cost ~100 ms + 43 ms on v5e. This kernel loads each row band into
VMEM ONCE and computes everything in-register:

  FAST-9/16 segment scores (doubling min-tree over the 16 circle diffs)
  -> 3x3 non-maximum suppression
  -> Harris response (Sobel + 7x7 box structure tensor)
  -> ranked map: harris where corner survives, -inf elsewhere

Output feeds straight into (approx_)max_k for per-level keypoint selection.

Banding: the image is pre-padded (edge-replicate) by HALO rows top/bottom
and to lane/band multiples; the grid is (batch, bands) and each program DMAs
its band + halo from HBM into VMEM scratch. Column neighborhoods use
`pltpu.roll`, whose wraparound touches only the outermost ~7 columns — well
inside the detector's 31 px border margin, so correctness is unaffected.

Validated bit-for-bit (modulo f32 roundoff) against the XLA path in
tests/test_pallas_corner.py, on CPU via interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE_OFFSETS

__all__ = ["corner_response"]

HALO = 8  # rows of context: FAST(3) + NMS(1) + Sobel(1) + box(3)
BAND_ROWS = 32
NEG_INF = float("-inf")


def _roll_cols(x, dx):
    # out[c] = x[c + dx]; pltpu.roll requires a non-negative shift.
    return pltpu.roll(x, (-dx) % x.shape[1], axis=1) if dx else x


def _kernel(img_ref, out_ref, harris_ref, scratch, sem, *, threshold, band_rows, width):
    b = pl.program_id(0)
    band = pl.program_id(1)

    rows_needed = band_rows + 2 * HALO
    copy = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(band * band_rows, rows_needed), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()
    img = scratch[:]  # [band_rows + 2*HALO, W]

    # ---- FAST-9/16 on rows [HALO-1, HALO+band_rows+1) (score + NMS halo) --
    s0 = HALO - 1
    s_rows = band_rows + 2
    center = img[s0 : s0 + s_rows, :]

    diffs = [
        _roll_cols(img[s0 + dy : s0 + dy + s_rows, :], dx) - center
        for dy, dx in CIRCLE_OFFSETS
    ]

    def window9_max(d):
        """max over the 16 arcs of (min over 9 consecutive) for list d."""
        win2 = [jnp.minimum(d[k], d[(k + 1) % 16]) for k in range(16)]
        win4 = [jnp.minimum(win2[k], win2[(k + 2) % 16]) for k in range(16)]
        win8 = [jnp.minimum(win4[k], win4[(k + 4) % 16]) for k in range(16)]
        win9 = [jnp.minimum(win8[k], d[(k + 8) % 16]) for k in range(16)]
        out = win9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, win9[k])
        return out

    score_bright = window9_max(diffs)
    score_dark = window9_max([-d for d in diffs])
    score = jnp.maximum(score_bright, score_dark)
    score = jnp.where(score > threshold, score, 0.0)  # [band_rows+2, W]

    # ---- 3x3 NMS: interior rows [1, band_rows+1) of `score` --------------
    mid = score[1 : 1 + band_rows, :]
    neighbor_max = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = _roll_cols(score[1 + dy : 1 + dy + band_rows, :], dx)
            neighbor_max = shifted if neighbor_max is None else jnp.maximum(neighbor_max, shifted)
    keep = (mid > neighbor_max) & (mid > 0.0)

    # ---- Harris on rows [HALO, HALO+band_rows) ---------------------------
    g0 = HALO - 4  # gradient region start (band + box(3) + sobel(1))
    g_rows = band_rows + 6  # gradients needed on [HALO-3, HALO+band_rows+3)

    def grad_region(dy, dx):
        return _roll_cols(img[g0 + 1 + dy : g0 + 1 + dy + g_rows, :], dx)

    gx = (
        (grad_region(-1, 1) + 2.0 * grad_region(0, 1) + grad_region(1, 1))
        - (grad_region(-1, -1) + 2.0 * grad_region(0, -1) + grad_region(1, -1))
    )
    gy = (
        (grad_region(1, -1) + 2.0 * grad_region(1, 0) + grad_region(1, 1))
        - (grad_region(-1, -1) + 2.0 * grad_region(-1, 0) + grad_region(-1, 1))
    )

    def box7(x):
        # x: [band_rows+6, W] -> [band_rows, W], 7x7 box (radius 3).
        acc = None
        for dy in range(7):
            r = x[dy : dy + band_rows, :]
            acc = r if acc is None else acc + r
        out = None
        for dx in range(-3, 4):
            c = _roll_cols(acc, dx)
            out = c if out is None else out + c
        return out

    sxx = box7(gx * gx)
    syy = box7(gy * gy)
    sxy = box7(gx * gy)
    harris = (sxx * syy - sxy * sxy) - 0.04 * (sxx + syy) * (sxx + syy)

    out_ref[0, :, :] = jnp.where(keep, harris, NEG_INF)
    if harris_ref is not None:
        # Dense response for sub-pixel quadratic fits (3x3 neighborhoods of
        # selected corners) — already computed, one extra VMEM->HBM write.
        harris_ref[0, :, :] = harris


@functools.partial(jax.jit, static_argnames=("threshold", "interpret", "with_harris"))
def corner_response(images, threshold: float = 20.0, interpret: bool = False,
                    with_harris: bool = False):
    """[B, H, W] f32 -> ranked corner map [B, H, W]: Harris response where a
    FAST-9 corner survives NMS, -inf elsewhere. With with_harris=True also
    returns the dense (un-ranked) Harris map as a second array."""
    b, h, w = images.shape
    n_bands = pl.cdiv(h, BAND_ROWS)
    h_pad = n_bands * BAND_ROWS
    w_pad = ((w + 127) // 128) * 128
    padded = jnp.pad(
        images,
        ((0, 0), (HALO, h_pad - h + HALO), (0, w_pad - w)),
        mode="edge",
    )

    band_spec = pl.BlockSpec(
        (1, BAND_ROWS, w_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    band_shape = jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32)
    kernel = functools.partial(
        _kernel, threshold=threshold, band_rows=BAND_ROWS, width=w_pad
    )
    if not with_harris:
        kernel = functools.partial(lambda i, o, s, sem, k: k(i, o, None, s, sem), k=kernel)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_bands),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(band_spec, band_spec) if with_harris else band_spec,
        out_shape=(band_shape, band_shape) if with_harris else band_shape,
        scratch_shapes=[
            pltpu.VMEM((BAND_ROWS + 2 * HALO, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    if with_harris:
        ranked, harris = out
        return ranked[:, :h, :w], harris[:, :h, :w]
    return out[:, :h, :w]
