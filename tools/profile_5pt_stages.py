"""Stage-level TPU timing of the 5-point path, batched the way vo_chunk runs
it: a lax.scan over CHUNK frames, each step solving ITERS hypotheses. Queued
timing (one fetch at the end) avoids per-call tunnel dispatch noise; inputs
are perturbed per pass because the axon runtime memoizes identical
executions.

Usage: python tools/profile_5pt_stages.py [stage ...]
Stages: null, constraint, solve, roots, es, score, all (default: every stage).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 32
ITERS = 128
N = 512  # correspondences scored per frame

from slamtpu.ops import five_point as fp  # noqa: E402
from slamtpu.ops.epipolar import sampson_error  # noqa: E402


def make_stage(name):
    def step(carry, x):
        pts1, pts2, all1, all2 = x  # [ITERS, 5, 2] x2, [N, 2] x2
        basis = fp._nullspace4(pts1, pts2)
        if name == "null":
            return carry, jnp.sum(basis)
        m = fp._constraint_matrix(basis)
        if name == "constraint":
            return carry, jnp.sum(m)
        r = jnp.linalg.solve(m[..., :, :10], m[..., :, 10:])
        if name == "solve":
            return carry, jnp.sum(r)
        es, valid = fp.five_point_candidates(pts1, pts2)
        if name == "es":
            return carry, jnp.sum(es)
        err = sampson_error(es.reshape(-1, 3, 3), all1[None], all2[None])
        return carry, jnp.sum(jnp.where(valid.reshape(-1)[:, None], err, 0.0))

    return step


def run(name, key):
    step = make_stage(name)

    @jax.jit
    def prog(xs):
        return jax.lax.scan(step, 0.0, xs)

    def inputs(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return (
            jax.random.normal(k1, (CHUNK, ITERS, 5, 2)) * 0.3,
            jax.random.normal(k2, (CHUNK, ITERS, 5, 2)) * 0.3,
            jax.random.normal(k3, (CHUNK, N, 2)) * 0.3,
            jax.random.normal(k4, (CHUNK, N, 2)) * 0.3,
        )

    xs = inputs(key)
    t0 = time.time()
    _, out = prog(xs)
    np.asarray(out.ravel()[:1])
    compile_s = time.time() - t0

    n_pass = 6
    batches = [inputs(jax.random.fold_in(key, i + 1)) for i in range(n_pass)]
    outs = []
    t0 = time.time()
    for b in batches:
        outs.append(prog(b)[1])
    np.asarray(outs[-1].ravel()[:1])
    per_frame_ms = (time.time() - t0) / (n_pass * CHUNK) * 1e3
    print(
        f"{name:10s}: {per_frame_ms:7.3f} ms/frame  (compile {compile_s:.1f}s)",
        flush=True,
    )


def main():
    stages = sys.argv[1:] or ["null", "constraint", "solve", "es", "score"]
    key = jax.random.PRNGKey(0)
    for s in stages:
        run(s, key)


if __name__ == "__main__":
    main()
