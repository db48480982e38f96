"""Cumulative-stage TPU timing for the ORB detector: per-stage cost by
differencing successively longer prefixes of the real pipeline.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_detect_cumulative.py

Uses B=32 frames (the bench chunk size). NOTE: B=33 reliably crashes the
tunneled TPU worker on the current runtime (see docs/architecture.md perf
notes) — keep the batch at 32 here.

Each timed call gets perturbed inputs: the axon runtime memoizes identical
executions.
"""

import sys
import time

import numpy as np

N = 3
B = 32


def _sync(out):
    # Fetch ONE element of ONE leaf: outputs of an execution materialize
    # together, so a single fetch barriers the whole program. Fetching every
    # leaf costs a ~10-40 ms tunnel round trip EACH and swamps the compute
    # being measured (a many-leaf stage read 80+ ms/frame of pure fetches).
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(name, fn, variants):
    out = fn(*variants[0])
    _sync(out)
    t0 = time.time()
    outs = [fn(*v) for v in variants[1:]]
    for o in outs:
        _sync(o)
    dt = (time.time() - t0) / (len(variants) - 1) * 1000
    print(f"{name:52s} {dt:8.2f} ms ({dt / B:.3f} ms/frame)", file=sys.stderr, flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.feature.detector import (
        OrbConfig,
        _detect_level,
        _ranked_corner_maps,
        detect_and_compute,
        features_per_level,
    )
    from slamtpu.ops.brief import PATCH_RADIUS
    from slamtpu.ops.pyramid import build_pyramid, gaussian_blur

    config = OrbConfig(max_features=500)
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, size=(B, 376, 1241)).astype(np.float32)
    fv = [(jnp.asarray(frames + np.float32(i * 0.01)),) for i in range(N + 1)]

    quotas = features_per_level(config.max_features, config.n_levels, config.scale_factor)

    def prefix(n_stages):
        """Stage 0: pyramid. 1: +blur. 2: +corner maps. 3: +full per-level
        detect (topk/subpixel/patches/orientation/brief)."""

        def fn(images):
            pyr = build_pyramid(images, config.n_levels, config.scale_factor)
            if n_stages == 0:
                return [l.sum() for l in pyr]
            blurred = [gaussian_blur(l) for l in pyr]
            if n_stages == 1:
                return [b.sum() for b in blurred]
            maps = []
            for level, l in enumerate(pyr):
                want_sub = config.subpixel and level <= config.subpixel_max_octave
                maps.append(_ranked_corner_maps(l, config, with_harris=want_sub))
            if n_stages == 2:
                return [
                    (m[0].sum() if isinstance(m, tuple) else m.sum()) for m in maps
                ]
            outs = []
            for level, (l, quota) in enumerate(zip(pyr, quotas)):
                if quota == 0:
                    continue
                want_sub = config.subpixel and level <= config.subpixel_max_octave
                ranked, harris = maps[level] if want_sub else (maps[level], None)
                if want_sub:
                    out = jax.vmap(
                        lambda r, i, bl, h: _detect_level(
                            r, i, bl, quota, config.edge_threshold,
                            config.exact_topk, config.descriptor_bins, h,
                        )
                    )(ranked, l, blurred[level], harris)
                else:
                    out = jax.vmap(
                        lambda r, i, bl: _detect_level(
                            r, i, bl, quota, config.edge_threshold,
                            config.exact_topk, config.descriptor_bins,
                        )
                    )(ranked, l, blurred[level])
                outs.append(out)
            return outs

        return jax.jit(fn)

    from slamtpu.feature.detector import _subpixel_offsets
    from slamtpu.ops.brief import brief_descriptors_binned, extract_patches, orientation

    def kp_prefix(sub):
        """Finer prefixes INSIDE the keypoint stage (r5): 0 = +topk/subpixel,
        1 = +patches, 2 = +orientation, 3 = +brief (== full)."""

        def fn(images):
            pyr = build_pyramid(images, config.n_levels, config.scale_factor)
            blurred = [gaussian_blur(l) for l in pyr]
            outs = []
            for level, (l, quota) in enumerate(zip(pyr, quotas)):
                if quota == 0:
                    continue
                want_sub = config.subpixel and level <= config.subpixel_max_octave
                maps = _ranked_corner_maps(l, config, with_harris=want_sub)
                ranked, harris = maps if want_sub else (maps, None)

                def level_fn(r, img, bl, h=None):
                    hh, ww = img.shape
                    row = jnp.arange(hh)[:, None]
                    col = jnp.arange(ww)[None, :]
                    m = config.edge_threshold
                    interior = (row >= m) & (row < hh - m) & (col >= m) & (col < ww - m)
                    r = jnp.where(interior, r, -jnp.inf).reshape(-1)
                    top_vals, top_idx = jax.lax.approx_max_k(r, quota, recall_target=0.95)
                    mask = jnp.isfinite(top_vals)
                    x = jnp.where(mask, (top_idx % ww).astype(jnp.float32), ww // 2)
                    y = jnp.where(mask, (top_idx // ww).astype(jnp.float32), hh // 2)
                    xy = jnp.stack([x, y], axis=-1)
                    xy_out = xy + _subpixel_offsets(h, xy) if h is not None else xy
                    if sub == 0:
                        return xy_out.sum()
                    patches = extract_patches(bl, xy, PATCH_RADIUS)
                    if sub == 1:
                        return xy_out.sum() + patches.sum()
                    ang = orientation(patches)
                    if sub == 2:
                        return xy_out.sum() + patches.sum() + ang.sum()
                    desc = brief_descriptors_binned(patches, ang, config.descriptor_bins)
                    return xy_out.sum() + ang.sum() + desc.astype(jnp.int32).sum()

                if want_sub:
                    outs.append(jax.vmap(level_fn)(ranked, l, blurred[level], harris))
                else:
                    outs.append(
                        jax.vmap(lambda r, i, bl: level_fn(r, i, bl))(
                            ranked, l, blurred[level]
                        )
                    )
            return outs

        return jax.jit(fn)

    t_pyr = timeit("pyramid (8 levels)", prefix(0), fv)
    t_blur = timeit("+ gaussian blur", prefix(1), fv)
    t_corner = timeit("+ corner maps (pallas)", prefix(2), fv)
    t_topk = timeit("+ topk/subpixel", kp_prefix(0), fv)
    t_patch = timeit("+ patches", kp_prefix(1), fv)
    t_orient = timeit("+ orientation", kp_prefix(2), fv)
    t_full = timeit("+ topk/patches/orientation/brief", prefix(3), fv)
    t_api = timeit("detect_and_compute (api)", jax.jit(lambda f: detect_and_compute(f, config)), fv)

    print("--- deltas ---", file=sys.stderr)
    for name, d in [
        ("pyramid", t_pyr),
        ("blur", t_blur - t_pyr),
        ("corner maps", t_corner - t_blur),
        ("topk+subpixel", t_topk - t_corner),
        ("patches", t_patch - t_topk),
        ("orientation", t_orient - t_patch),
        ("brief", t_full - t_orient),
        ("keypoint stages", t_full - t_corner),
        ("(api total)", t_api),
    ]:
        print(f"{name:20s} {d:8.2f} ms ({d / B:.3f} ms/frame)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
