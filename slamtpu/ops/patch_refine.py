"""Sub-pixel match refinement by local patch alignment (KLT-style).

ORB keypoints are integer-quantized at their pyramid level, so a matched
pair carries ~0.5-1.5 px of RELATIVE localization noise even when the match
is correct — measured to dominate translation-direction error of two-view
pose on small-baseline pairs (the essential matrix is exquisitely
noise-sensitive: 0.3 px -> ~4 deg, 1.5 px -> ~90 deg direction error on a
lateral KITTI-scale geometry). The reference pipeline inherits whatever
OpenCV's detector gives it (/root/reference/src/odometry/pose.rs:27-44 uses
raw keypoint pixels); this op is a beyond-reference accuracy stage, standard
in production VO (SVO/DSO patch alignment, ORB-SLAM's guided refinement).

For each match (p1, p2): take the (2r+1)^2 template around p1 in frame 1,
slide it over a (2s+1)^2 offset grid centered on p2 in frame 2, pick the
SSD minimum, and interpolate a 1-D parabola per axis for the sub-pixel
offset. Everything is fixed-shape gather + elementwise math — K patches of
(2r+2s+1)^2 pixels per frame pair, vmapped; no data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["refine_matches"]


def _gather_patches(image, xy, radius: int):
    """[K, 2r+1, 2r+1] windows around integer-rounded centers (clamped).

    Vmapped dynamic_slice: for multi-row windows this lowers faster on TPU
    than a fused advanced-indexing gather (see ops/brief.extract_patches —
    measured 5x); only tiny 3x3 windows favor the fused gather."""
    size = 2 * radius + 1
    starts = jnp.round(xy).astype(jnp.int32) - radius

    def one(start):
        return jax.lax.dynamic_slice(image, (start[1], start[0]), (size, size))

    return jax.vmap(one)(starts)


@functools.partial(jax.jit, static_argnames=("radius", "search"))
def refine_matches(img1, img2, p1, p2, mask=None, radius: int = 4, search: int = 2):
    """Refine matched positions p2 by SSD patch alignment against p1.

    img1, img2: [H, W] float or uint8 frames (level-0).
    p1, p2: [K, 2] pixel coords of matched keypoints (query in img1, train
      in img2). mask: [K] live matches; dead slots pass through unrefined.

    Returns p2_refined [K, 2] float32: integer-grid SSD argmin within
    +-search px of p2, plus a parabola-interpolated sub-pixel term. Matches
    whose SSD surface is not locally concave keep their integer argmin.
    """
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    p1 = jnp.asarray(p1)
    p2 = jnp.asarray(p2)
    k = p1.shape[0]
    if mask is None:
        mask = jnp.ones((k,), bool)

    tpl = _gather_patches(img1, p1, radius)  # [K, T, T]
    win = _gather_patches(img2, p2, radius + search)  # [K, T+2s, T+2s]

    t = 2 * radius + 1
    n_off = 2 * search + 1
    # SSD over the (2s+1)^2 offset grid: unrolled static slices (s is tiny).
    costs = []
    for dy in range(n_off):
        row = []
        for dx in range(n_off):
            d = win[:, dy : dy + t, dx : dx + t] - tpl
            row.append(jnp.sum(d * d, axis=(-2, -1)))
        costs.append(jnp.stack(row, axis=-1))
    cost = jnp.stack(costs, axis=-2)  # [K, n_off, n_off]

    flat = cost.reshape(k, -1)
    # Center-preferring tie-break: on (near-)flat SSD surfaces — textureless
    # patches, repeated structure — a bare argmin lands on the first grid
    # cell (the corner) and would shift the match by `-search` px for no
    # evidence. Bias each cell by a term proportional to its squared offset,
    # scaled to ~1e-6 of the per-match cost range so any genuine minimum
    # still wins.
    off2 = (jnp.arange(n_off, dtype=jnp.float32) - search) ** 2
    dist2 = (off2[:, None] + off2[None, :]).reshape(-1)
    rng_cost = jnp.max(flat, axis=-1, keepdims=True) - jnp.min(flat, axis=-1, keepdims=True)
    amin = jnp.argmin(flat + dist2 * (1e-6 * rng_cost + 1e-30), axis=-1)
    iy = amin // n_off
    ix = amin % n_off

    def parabola(lo, c, hi):
        denom = lo - 2.0 * c + hi
        off = jnp.where(denom > 0, 0.5 * (lo - hi) / jnp.where(denom > 0, denom, 1.0), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    # Clamp the 3-point stencils to the grid; at-edge minima get offset 0
    # via the interior guard (the parabola would extrapolate there).
    ky = jnp.arange(k)
    interior_x = (ix > 0) & (ix < n_off - 1)
    interior_y = (iy > 0) & (iy < n_off - 1)
    ixc = jnp.clip(ix, 1, n_off - 2)
    iyc = jnp.clip(iy, 1, n_off - 2)
    sub_x = jnp.where(
        interior_x,
        parabola(cost[ky, iy, ixc - 1], cost[ky, iy, ixc], cost[ky, iy, ixc + 1]),
        0.0,
    )
    sub_y = jnp.where(
        interior_y,
        parabola(cost[ky, iyc - 1, ix], cost[ky, iyc, ix], cost[ky, iyc + 1, ix]),
        0.0,
    )

    delta = jnp.stack(
        [(ix - search).astype(jnp.float32) + sub_x, (iy - search).astype(jnp.float32) + sub_y],
        axis=-1,
    )
    refined = jnp.round(p2) + delta
    return jnp.where(mask[:, None], refined, p2).astype(jnp.float32)
