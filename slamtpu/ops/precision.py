"""Matmul-precision control shared by the geometry/linear-algebra kernels.

The TPU default lowers f32 matmuls to one bf16 MXU pass (~3e-3 relative
error). Most of this framework tolerates that (descriptor matching is
exact-in-bf16 by construction; image filtering is noise-dominated), but
epipolar algebra, DLT triangulation, and the bundle-adjustment normal
equations cannot: an 8-point normal matrix separates its true null
direction from the spurious antisymmetric near-null cluster only at the
~1e-6 level, and Sampson inlier classification compares ~1e-3-scale
numerators against a (1px/f)^2 threshold. Measured effect on v5e: 1 RANSAC
inlier at default precision vs 130+ at HIGHEST, on identical KITTI-scale
input. These are tiny-dimension contractions (3..9), so the cost is nil.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["f32_precision"]


def f32_precision(fn):
    """Decorator: run every contraction inside `fn` at true f32 precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
