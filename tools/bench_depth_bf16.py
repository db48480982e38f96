"""MonoDepth2 f32-vs-bf16 batch-scaling sweep on the TPU.

VERDICT round 2 weakness 4: bf16 measured 1.03x while the docs claimed ~2x.
This sweep measures ms/frame for f32 vs bf16 across batch sizes so the claim
can be aligned with reality (PARITY.md) — at small batch the 192x640 network
is dispatch/HBM-bound, not MXU-bound; the bf16 win should appear (if
anywhere) at larger batches.

Usage: python tools/bench_depth_bf16.py [batches...]   (default 4 16 64)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from slamtpu.depth.monodepth2 import MonoDepth2


def bench(md: MonoDepth2, batch: int, n_pass: int = 5) -> float:
    rng = np.random.default_rng(0)
    clips = [
        rng.uniform(0, 255, size=(batch, 192, 640, 3)).astype(np.float32)
        for _ in range(n_pass + 1)
    ]
    dev = [jax.device_put(jnp.asarray(c)) for c in clips]
    np.asarray(dev[-1][0, 0, 0, 0])  # resident
    # Warmup/compile on clip 0 (distinct from every timed clip: the runtime
    # memoizes identical executions).
    out = md._forward(md.encoder_vars, md.decoder_vars, dev[0])
    np.asarray(out.ravel()[:1])
    t0 = time.time()
    outs = [md._forward(md.encoder_vars, md.decoder_vars, d) for d in dev[1:]]
    np.asarray(outs[-1].ravel()[:1])  # one fetch = true barrier
    return (time.time() - t0) / (n_pass * batch) * 1e3


def main():
    batches = [int(b) for b in sys.argv[1:]] or [4, 16, 64]
    md32 = MonoDepth2(seed=0)
    md16 = MonoDepth2(
        encoder_vars=md32.encoder_vars,
        decoder_vars=md32.decoder_vars,
        compute_dtype=jnp.bfloat16,
    )
    print(f"{'batch':>6} {'f32 ms/frame':>14} {'bf16 ms/frame':>14} {'speedup':>8}")
    for b in batches:
        t32 = bench(md32, b)
        t16 = bench(md16, b)
        print(f"{b:>6} {t32:>14.3f} {t16:>14.3f} {t32 / t16:>8.2f}x", flush=True)


if __name__ == "__main__":
    main()
