"""Sub-stage TPU timing for the ORB detector.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_detect.py
"""

import sys
import time

import numpy as np

N = 3


def _sync(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1])


def timeit(name, fn, variants):
    out = fn(*variants[0])
    _sync(out)
    t0 = time.time()
    outs = [fn(*v) for v in variants[1:]]
    for o in outs:
        _sync(o)
    dt = (time.time() - t0) / (len(variants) - 1) * 1000
    print(f"{name:44s} {dt:8.2f} ms", file=sys.stderr, flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.feature.detector import OrbConfig, detect_and_compute
    from slamtpu.ops.brief import PATCH_RADIUS, brief_descriptors, extract_patches, orientation
    from slamtpu.ops.fast import fast_score, nms3x3
    from slamtpu.ops.harris import harris_response
    from slamtpu.ops.pyramid import build_pyramid, gaussian_blur

    B = 33
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, size=(B, 376, 1241)).astype(np.float32)
    fv = lambda: [(jnp.asarray(frames + np.float32(i * 0.01)),) for i in range(N + 1)]

    timeit("full detect_and_compute", jax.jit(lambda f: detect_and_compute(f, OrbConfig())), fv())
    timeit("build_pyramid (8 levels)", jax.jit(lambda f: build_pyramid(f)), fv())
    timeit("gaussian_blur L0", jax.jit(lambda f: gaussian_blur(f)), fv())
    timeit("fast_score L0", jax.jit(lambda f: fast_score(f, 20.0)), fv())
    timeit("fast+nms L0", jax.jit(lambda f: nms3x3(fast_score(f, 20.0))), fv())
    timeit("harris L0", jax.jit(lambda f: harris_response(f)), fv())

    @jax.jit
    def topk(f):
        score = nms3x3(fast_score(f, 20.0))
        harris = harris_response(f)
        ranked = jnp.where(score > 0, harris, -jnp.inf).reshape(B, -1)
        return jax.lax.top_k(ranked, 217)

    timeit("top_k L0 (217 of 466k)", topk, fv())

    xy = jnp.asarray(
        np.stack(
            [
                rng.uniform(40, 1200, size=(B, 217)),
                rng.uniform(40, 336, size=(B, 217)),
            ],
            axis=-1,
        ).astype(np.float32)
    )

    @jax.jit
    def patches_fn(f, xy):
        return jax.vmap(lambda img, k: extract_patches(img, k, PATCH_RADIUS))(f, xy)

    pv = [(jnp.asarray(frames + np.float32(i * 0.01)), xy) for i in range(N + 1)]
    patches = timeit("extract_patches L0 (217 kp)", patches_fn, pv)

    @jax.jit
    def orient_fn(p):
        return jax.vmap(orientation)(p)

    ov = [(patches + np.float32(i * 0.01),) for i in range(N + 1)]
    angles = timeit("orientation", orient_fn, ov)

    @jax.jit
    def brief_fn(p, a):
        return jax.vmap(brief_descriptors)(p, a)

    bv = [(patches + np.float32(i * 0.01), angles) for i in range(N + 1)]
    timeit("brief_descriptors", brief_fn, bv)


if __name__ == "__main__":
    main()
