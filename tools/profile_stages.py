"""Per-stage TPU timing for the VO pipeline: find the bottleneck.

Run on the TPU: PYTHONPATH=/root/repo python tools/profile_stages.py

Note: the axon remote runtime memoizes identical executions, so every timed
call gets a DIFFERENT input variant (same shapes, perturbed contents).
"""

import sys
import time

import numpy as np

N = 4


def _sync(out):
    """Force real completion: block_until_ready appears to be a no-op on the
    axon remote platform, so fetch one element of every output leaf."""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1])


def timeit(name, fn, variants):
    """variants: list of arg-tuples; first is warmup, rest are timed once each."""
    out = fn(*variants[0])
    _sync(out)  # compile + warmup
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
    from slamtpu.feature.matcher import FeatureMatcher
    from slamtpu.io.synthetic import render_sequence
    from slamtpu.odometry.pose import estimate_relative_pose
    from slamtpu.ops.epipolar import eight_point, recover_pose_from_essential, sampson_error
    from slamtpu.ops.ransac import RansacConfig, ransac_essential

    C = 32
    scene = render_sequence(n_frames=C + 1, height=376, width=1241, n_points=2500, step=0.8, seed=0)
    frames = jnp.asarray(scene.frames.astype(np.float32))
    cam = scene.intrinsics
    config = OrbConfig(max_features=500)

    detect = jax.jit(lambda f: detect_and_compute(f, config))
    frame_vars = [(frames + np.float32(0.01 * i),) for i in range(N + 1)]
    feats = timeit(f"detect [{C+1} KITTI frames]", detect, frame_vars)

    matcher = FeatureMatcher()

    @jax.jit
    def match_all(desc, mask):
        return jax.vmap(
            lambda d1, m1, d2, m2: matcher.filter_good_matches(
                matcher.match_descriptors(d1, d2, query_mask=m1, train_mask=m2)
            )
        )(desc[:-1], mask[:-1], desc[1:], mask[1:])

    match_vars = [
        (feats.descriptors ^ np.uint8(i), feats.mask) for i in range(N + 1)
    ]
    good = timeit(f"pairwise match+filter [{C} pairs]", match_all, match_vars)

    pts1 = feats.xy[:-1]
    pts2 = jnp.take_along_axis(feats.xy[1:], good.train_idx[..., None], axis=1)
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    rcfg = RansacConfig(iters=1000)

    @jax.jit
    def full_pose(keys, p1, p2, m):
        return jax.vmap(
            lambda k, a, b, mm: estimate_relative_pose(k, cam, a, b, mask=mm, config=rcfg)
        )(keys, p1, p2, m)

    pose_vars = [
        (jax.random.split(jax.random.PRNGKey(i), C), pts1 + np.float32(0.01 * i), pts2, good.mask)
        for i in range(N + 1)
    ]
    timeit(f"estimate_relative_pose [{C} pairs]", full_pose, pose_vars)

    n1 = cam.normalize(pts1)
    n2 = cam.normalize(pts2)

    @jax.jit
    def ransac_only(keys, a, b, m):
        return jax.vmap(
            lambda k, x, y, mm: ransac_essential(
                k, x, y, mask=mm, threshold_norm=1.0 / 718.0, config=rcfg
            )
        )(keys, a, b, m)

    ransac_vars = [
        (jax.random.split(jax.random.PRNGKey(i), C), n1 + np.float32(1e-6 * i), n2, good.mask)
        for i in range(N + 1)
    ]
    res = timeit(f"ransac_essential [{C} x 1000 hyp]", ransac_only, ransac_vars)

    samples1 = jnp.repeat(n1[:, :8][:, None], 1000, 1)
    samples2 = jnp.repeat(n2[:, :8][:, None], 1000, 1)

    ep = jax.jit(lambda a, b: eight_point(a, b))
    ep_vars = [(samples1 + np.float32(1e-6 * i), samples2) for i in range(N + 1)]
    hyps = timeit(f"eight_point eigh [{C}x1000]", ep, ep_vars)

    samp = jax.jit(lambda h, a, b: sampson_error(h, a[:, None], b[:, None]))
    samp_vars = [(hyps + np.float32(1e-6 * i), n1, n2) for i in range(N + 1)]
    timeit(f"sampson score [{C}x1000xN]", samp, samp_vars)

    @jax.jit
    def recover(e, a, b, m):
        return jax.vmap(lambda ee, x, y, mm: recover_pose_from_essential(ee, x, y, mm))(e, a, b, m)

    rec_vars = [(res.essential + np.float32(1e-7 * i), n1, n2, res.inliers) for i in range(N + 1)]
    timeit(f"recover_pose 4-cand cheirality [{C}]", recover, rec_vars)


if __name__ == "__main__":
    main()
