"""Dense Harris corner response.

OpenCV's ORB ranks FAST keypoints by Harris response before keeping the best
per level (the ranking behind /root/reference/src/feature/detector.rs:26-40).
Computed densely over [B, H, W] — Sobel gradients and a 7x7 box sum are a
handful of fused VPU passes, cheaper than gathering per-keypoint
neighborhoods.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["harris_response"]


def _shift(img, dy, dx):
    return jnp.roll(img, (-dy, -dx), axis=(1, 2))


def _box_sum(img, radius):
    """(2r+1)^2 box filter via two separable running sums (zero padding)."""
    out = img
    acc = out
    for d in range(1, radius + 1):
        acc = acc + jnp.roll(out, d, axis=1) + jnp.roll(out, -d, axis=1)
    out = acc
    acc = out
    for d in range(1, radius + 1):
        acc = acc + jnp.roll(out, d, axis=2) + jnp.roll(out, -d, axis=2)
    return acc


@functools.partial(jax.jit, static_argnames=("block_radius", "k"))
def harris_response(images, block_radius: int = 3, k: float = 0.04):
    """Harris corner response with 3x3 Sobel gradients and a box window.

    images: [B, H, W] float. Returns [B, H, W] response
    det(M) - k * trace(M)^2 with M the (2r+1)^2-summed structure tensor.
    Matches OpenCV ORB's HarrisResponses parameters (blockSize 7 -> r=3,
    k=0.04) up to the gradient operator's constant scale, which cancels in
    ranking.
    """
    gx = (
        (_shift(images, -1, 1) + 2.0 * _shift(images, 0, 1) + _shift(images, 1, 1))
        - (_shift(images, -1, -1) + 2.0 * _shift(images, 0, -1) + _shift(images, 1, -1))
    )
    gy = (
        (_shift(images, 1, -1) + 2.0 * _shift(images, 1, 0) + _shift(images, 1, 1))
        - (_shift(images, -1, -1) + 2.0 * _shift(images, -1, 0) + _shift(images, -1, 1))
    )
    sxx = _box_sum(gx * gx, block_radius)
    syy = _box_sum(gy * gy, block_radius)
    sxy = _box_sum(gx * gy, block_radius)
    det = sxx * syy - sxy * sxy
    trace = sxx + syy
    return det - k * trace * trace
