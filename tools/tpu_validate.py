"""TPU numerics health check — run FIRST after any libtpu/runtime change.

Round-1 postmortem (VERDICT r1): a mid-flight libtpu upgrade silently
zeroed pose accuracy while throughput stayed high, so the recorded bench
was garbage. This script isolates each numerics hazard class on the real
chip in ~a minute and prints PASS/FAIL per item:

  1. matmul precision: one-pass bf16 vs HIGHEST on an epipolar normal
     matrix (the ops are decorated with f32_precision — this checks the
     decorator actually bites on this runtime).
  2. approx_max_k recall vs exact top_k at detector shapes.
  3. uint8 -> f32 frame cast fidelity.
  4. end-to-end: one 33-frame VO chunk at KITTI size with ground truth —
     pose success rate and median rotation error.

Usage: python tools/tpu_validate.py   (no platform override: runs on the
default backend, i.e. the TPU under axon)
"""

from __future__ import annotations

import sys
import time

import numpy as np

FAILURES = []


def check(name, ok, detail):
    tag = "PASS" if ok else "FAIL"
    print(f"[{tag}] {name}: {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    def force(x):
        return np.asarray(x)

    # --- 1. matmul precision ---------------------------------------------
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(64, 9)).astype(np.float32)
    a = jnp.asarray(pts)

    def normal_matrix(a):
        return a.T @ a

    default = force(jax.jit(normal_matrix)(a))
    with jax.default_matmul_precision("highest"):
        highest = force(jax.jit(normal_matrix)(a))
    exact = pts.T.astype(np.float64) @ pts.astype(np.float64)
    err_default = np.abs(default - exact).max()
    err_highest = np.abs(highest - exact).max()
    # HIGHEST must be ~f32-exact (<1e-4 at these magnitudes); the default is
    # ALLOWED to be bf16-sloppy — the framework never relies on it.
    check(
        "matmul HIGHEST precision",
        err_highest < 1e-4,
        f"|err| highest={err_highest:.2e}, default={err_default:.2e}",
    )

    # --- 2. approx_max_k recall -------------------------------------------
    scores = jnp.asarray(rng.normal(size=(8, 116281)).astype(np.float32))  # 341x341 level
    k = 500
    exact_idx = force(jax.jit(lambda s: jax.lax.top_k(s, k)[1])(scores))
    approx_idx = force(
        jax.jit(lambda s: jax.lax.approx_max_k(s, k, recall_target=0.95)[1])(scores)
    )
    recalls = [
        len(set(exact_idx[i]) & set(approx_idx[i])) / k for i in range(scores.shape[0])
    ]
    check(
        "approx_max_k recall",
        min(recalls) >= 0.90,
        f"min recall {min(recalls):.3f} (target >= 0.90 at recall_target 0.95)",
    )

    # --- 3. uint8 -> f32 cast ----------------------------------------------
    u8 = jnp.asarray(rng.integers(0, 256, size=(64, 64), dtype=np.uint8))
    casted = force(jax.jit(lambda x: x.astype(jnp.float32))(u8))
    check(
        "uint8->f32 cast",
        np.array_equal(casted, np.asarray(u8).astype(np.float32)),
        "exact" if np.array_equal(casted, np.asarray(u8).astype(np.float32)) else "MISMATCH",
    )

    # --- 4. end-to-end VO chunk --------------------------------------------
    from slamtpu.feature.detector import OrbConfig, detect_and_compute
    from slamtpu.io.synthetic import render_sequence
    from slamtpu.mapping.keyframe import KeyframeState
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.pipeline.vo import VoConfig, vo_chunk

    t0 = time.time()
    scene = render_sequence(
        n_frames=33, height=376, width=1241, n_points=4000, step=0.8,
        intrinsics=CameraIntrinsics.kitti(), seed=0, noise=2.0,
    )
    config = VoConfig(orb=OrbConfig(max_features=500), ransac=RansacConfig(iters=128))
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    feats0 = jax.tree_util.tree_map(
        lambda x: x[0], detect_and_compute(scene.frames[:1], config.orb)
    )
    step = jax.jit(vo_chunk, static_argnames=("config",))
    _, res = step(
        feats0, KeyframeState.initial(), jnp.eye(4, dtype=jnp.float32),
        scene.frames[1:], keys, scene.intrinsics, config,
    )
    ok = force(res.success).astype(bool)
    rot = force(res.rotations)
    gt = scene.rel_rotations[:32]
    tr = np.einsum("tij,tij->t", rot, gt)
    err_deg = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    med = float(np.median(err_deg[ok])) if ok.any() else float("inf")
    check(
        "VO chunk accuracy",
        ok.mean() >= 0.8 and med <= 1.0,
        f"success {int(ok.sum())}/32, median rot err {med:.3f} deg "
        f"({time.time() - t0:.0f}s incl. render+compile)",
    )

    print(("ALL CHECKS PASS" if not FAILURES else f"FAILED: {FAILURES}"), flush=True)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
