"""Benchmark: whole-pipeline VO throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} on stdout
(everything else goes to stderr). Baseline target: 500 VO frames/sec/chip on
KITTI-sized frames (BASELINE.json north_star; the reference publishes no
numbers of its own — /root/reference/TODO.md:90).

The measured quantity is steady-state end-to-end VO: ORB detection (8-level
pyramid), frame-pair Hamming matching, RANSAC essential + pose recovery,
keyframe scan, and trajectory composition, on 1241x376 (KITTI odometry
camera) frames.

Frames are device-resident by default: this sandbox reaches the chip through
a ~40 MB/s relay tunnel (measured), which is two orders of magnitude below a
production host link (PCIe: a 15 MB uint8 chunk moves in ~1.5 ms) and is not
the subsystem under test. BENCH_TRANSFER=1 re-includes per-chunk
host->device transfer (uint8, prefetched) for the conservative number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _enable_compile_cache(jax):
    """Persistent XLA compilation cache under <repo>/.jax_cache/bench.

    Cold TPU compiles for the benchmark programs cost ~5 min of the bench
    budget on a slow host; the cache cuts reruns (including the driver's
    round-end run on the same machine) to seconds. XLA keys entries by
    backend + compile options internally, so one directory is safe across
    libtpu upgrades. Writes are made atomic (tmp + os.replace) because the
    stock LRU cache's plain write leaves truncated entries when a run is
    killed mid-write, and the XLA deserializer hard-aborts on them.
    """
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache", "bench")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # REAL cache-hit accounting (VERDICT r4 weakness 2: a non-empty cache
    # directory does not mean the entries match the current code — r4's
    # final commit changed ops/pyramid.py after the last bench run, and the
    # "warm"-labeled round-end run actually cold-compiled for 195.8 s).
    # Count the runtime's own hit/miss events instead.
    from jax._src import monitoring

    def _on_event(event, **kw):
        if event == "/jax/compilation_cache/cache_hits":
            _CACHE_COUNTS["hits"] += 1
        elif event == "/jax/compilation_cache/cache_misses":
            _CACHE_COUNTS["misses"] += 1

    monitoring.register_event_listener(_on_event)


_CACHE_COUNTS = {"hits": 0, "misses": 0}


def cache_counts_snapshot():
    return dict(_CACHE_COUNTS)


def cache_label(before):
    """Human label for a timed region: compiles vs cache deserializations."""
    hits = _CACHE_COUNTS["hits"] - before["hits"]
    misses = _CACHE_COUNTS["misses"] - before["misses"]
    state = "COLD" if misses else ("warm" if hits else "cached-in-process")
    return f"{state}: {misses} compiles, {hits} persistent-cache hits"

    try:
        import jax._src.lru_cache as lru

        orig_put = lru.LRUCache.put

        def atomic_put(self, key, val):
            # Same structure as the stock put (entry-size guard, lock, LRU
            # eviction, atime stamp) with ONLY the entry write made atomic
            # (tmp + os.replace): the stock plain write leaves truncated
            # entries when a run is killed mid-write, and the XLA
            # deserializer hard-aborts on them.
            if not key:
                raise ValueError("key cannot be empty")
            if self.eviction_enabled and len(val) > self.max_size:
                return
            cache_path = self.path / f"{key}{lru._CACHE_SUFFIX}"
            if self.eviction_enabled:
                self.lock.acquire(timeout=self.lock_timeout_secs)
            tmp = self.path / f".tmp.{os.getpid()}.{key}{lru._CACHE_SUFFIX}"
            try:
                if cache_path.exists():
                    return
                self._evict_if_needed(additional_size=len(val))
                tmp.write_bytes(val)
                os.replace(tmp, cache_path)
                if self.eviction_enabled:
                    stamp = time.time_ns().to_bytes(8, "little")
                    (self.path / f"{key}{lru._ATIME_SUFFIX}").write_bytes(stamp)
            except OSError:  # out of space etc.: fall back to no caching
                if tmp.exists():
                    tmp.unlink()
            finally:
                if self.eviction_enabled:
                    self.lock.release()

        if getattr(orig_put, "__name__", "") != "atomic_put":
            lru.LRUCache.put = atomic_put
    except Exception as e:  # jax-internal module moved: degrade to stock caching
        log(f"bench: atomic cache patch skipped ({type(e).__name__}: {e})")


def main():
    t_total = int(os.environ.get("BENCH_FRAMES", "257"))
    # 32 steps/chunk = 32-frame detect batches: the TPU detector's safe
    # batch envelope is 32 frames/program (33+ hard-crashes the v5e worker —
    # see slamtpu/feature/detector.py module note).
    chunk = int(os.environ.get("BENCH_CHUNK", "32"))
    # KITTI odometry camera size; overridable for fast plumbing smoke tests
    # on CPU (the recorded numbers always use the defaults).
    height = int(os.environ.get("BENCH_H", "376"))
    width = int(os.environ.get("BENCH_W", "1241"))

    import jax

    _enable_compile_cache(jax)
    log(f"devices: {jax.devices()}")

    from slamtpu.feature.detector import OrbConfig
    from slamtpu.io.synthetic import render_sequence_cached
    from slamtpu.mapping.keyframe import KeyframeState
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.pipeline.vo import VoConfig, seed_features, vo_chunk

    log(f"rendering {t_total} synthetic KITTI-sized frames ({height}x{width})...")
    t0 = time.time()
    # KITTI intrinsics, rescaled when BENCH_H/BENCH_W shrink the frame for a
    # plumbing smoke run (cx=607 on a 160-wide frame would put every sprite
    # out of view and zero the success gate for geometric, not perf, reasons).
    k = CameraIntrinsics.kitti()
    sy, sx = height / 376.0, width / 1241.0
    cam = CameraIntrinsics(k.fx * sx, k.fy * sy, k.cx * sx, k.cy * sy)
    scene = render_sequence_cached(
        n_frames=t_total,
        height=height,
        width=width,
        # 4000 sprites keeps landmark density healthy to the corridor's end
        # (2500 starved the last chunks: 26/32 pose successes vs 30/32).
        n_points=4000,
        step=0.8,
        intrinsics=cam,
        seed=0,
        noise=2.0,
    )
    frames = scene.frames  # uint8: the host->device link is the
    # bottleneck in this environment (~40 MB/s); cast to f32 on device
    log(f"rendered in {time.time() - t0:.1f}s")

    # RANSAC hypothesis count: the reference's OpenCV call runs ADAPTIVE
    # RANSAC (confidence 0.999, max 1000) with 5-POINT samples, which
    # terminates after ~24-38 iterations at the 70-75% inlier ratios this
    # pipeline sees; the unified default's static 64 covers that with >1.7x
    # margin (see VoConfig.ransac).
    from slamtpu.ops.ransac import RansacConfig

    # THE unified config (= VoConfig() defaults, max_features included): the
    # same VoConfig the ATE north-star gate runs (tests/test_ate.py), so the
    # headline throughput and the headline accuracy describe ONE pipeline.
    # Env knobs exist only for ablation sweeps.
    solver = os.environ.get("BENCH_SOLVER", "5pt")
    iters = int(os.environ.get("BENCH_ITERS", "64"))
    prescore = int(os.environ.get("BENCH_PRESCORE", "0"))
    config = VoConfig(
        orb=OrbConfig(max_features=500),
        ransac=RansacConfig(iters=iters, min_solver=solver, prescore_subset=prescore),
    )
    if not any(k in os.environ for k in ("BENCH_SOLVER", "BENCH_ITERS", "BENCH_PRESCORE")):
        assert config == VoConfig(), "bench default drifted from the unified VoConfig"
    cam = scene.intrinsics
    # Masked-seed schedule (pipeline/vo.seed_features): the feature carry
    # starts EMPTY and step 0 is masked, so the whole VO run needs exactly
    # ONE compiled program — the separate single-frame detect compile that
    # used to seed the carry (~13 s cold) is gone from the cold path, and
    # no frame is detected twice (step j >= 1 is real pair j-1).
    step = jax.jit(vo_chunk, static_argnames=("config",))

    n_pairs = t_total - 1
    # Multiple measurement passes over the same steady-state chunks shrink
    # tunnel-jitter variance (a single pass times only ~0.4 s of work, so one
    # slow dispatch moves the headline by 20%). Each pass uses a DIFFERENT
    # PRNG seed: the runtime memoizes identical executions, so a verbatim
    # repeat would measure dispatch only.
    n_passes = max(int(os.environ.get("BENCH_PASSES", "2")), 1)
    # Per-pass STEP keys: step 0 is the masked seed step (key unused), step
    # j >= 1 carries pair j-1's key.
    pass_keys = []
    for p in range(n_passes):
        pk = jax.random.split(jax.random.PRNGKey(p), n_pairs)
        pass_keys.append(jax.numpy.concatenate([pk[:1], pk], axis=0))
    keys = pass_keys[0]
    np.asarray(keys[0])  # force key generation before the timed compile
    log("keys ready; compiling VO chunk program...")

    carry = (
        seed_features(config.orb),
        KeyframeState.initial(),
        jax.numpy.eye(4, dtype=jax.numpy.float32),
    )
    mask_first = np.arange(chunk) >= 1  # step 0 = masked seed step
    mask_all = np.ones((chunk,), bool)

    def force(x):
        """Real synchronization: on the axon remote platform,
        jax.block_until_ready is a no-op; only a device->host fetch
        actually waits for execution."""
        return np.asarray(x)

    # Warmup / compile on the first chunk, with REAL cold/warm accounting
    # from the runtime's own cache-hit/miss events (VERDICT r4 items 1a/1b:
    # the old entry-count heuristic could not distinguish a warm cache from
    # a stale one).
    before = cache_counts_snapshot()
    t0 = time.time()
    carry, res = step(
        carry[0], carry[1], carry[2], frames[0:chunk], keys[:chunk], cam, config,
        mask_first,
    )
    force(res.success)
    log(f"compile+first chunk: {time.time() - t0:.1f}s ({cache_label(before)})")

    # Steady state over the remaining chunks (see module docstring for the
    # device-resident default vs BENCH_TRANSFER=1).
    preplaced = os.environ.get("BENCH_TRANSFER") != "1"
    n_steady = (n_pairs - chunk) // chunk
    assert n_steady >= 2, "increase BENCH_FRAMES"

    # Steps == frame indices: steady chunk i covers steps [chunk+i*C, ...).
    blocks = [frames[chunk + i * chunk : chunk + (i + 1) * chunk] for i in range(n_steady)]
    if preplaced:
        blocks = [jax.device_put(b) for b in blocks]
        force(blocks[-1][0, 0])  # wait until resident

    carry_w = carry  # post-warmup carry: every pass restarts from here
    t0 = time.time()
    done_frames = 0
    results = []
    for p in range(n_passes):
        carry = carry_w
        pending = None if preplaced else jax.device_put(blocks[0])
        for i in range(n_steady):
            block = blocks[i] if preplaced else pending
            if not preplaced and i + 1 < n_steady:
                pending = jax.device_put(blocks[i + 1])  # prefetch next chunk
            start = chunk + i * chunk
            carry, res = step(
                carry[0], carry[1], carry[2],
                block,
                pass_keys[p][start : start + chunk],
                cam,
                config,
                mask_all,
            )
            results.append(res)
            done_frames += chunk
    force(results[-1].success)  # fetch = true execution barrier
    elapsed = time.time() - t0
    fps = done_frames / elapsed

    # --- self-validation over ALL steady-state chunks --------------------
    # A throughput number for a pipeline producing garbage poses is not a
    # benchmark; gate on pose-success rate and rotation accuracy against the
    # scene's exact ground truth (the reference prints the equivalent run
    # summary, examples/visual_odometry.rs:224-239).
    success_all = np.concatenate([force(r.success) for r in results])
    rot_all = np.concatenate([force(r.rotations) for r in results])
    per_pass = n_steady * chunk
    # Steady step j corresponds to pair j-1 (the masked-seed schedule).
    gt_rot = np.tile(
        scene.rel_rotations[chunk - 1 : chunk - 1 + per_pass], (n_passes, 1, 1)
    )
    tr = np.einsum("tij,tij->t", rot_all, gt_rot)  # trace(R_est @ R_gt^T)
    rot_err_deg = np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    ok = success_all.astype(bool)
    success_rate = float(ok.mean())
    rot_err_med = float(np.median(rot_err_deg[ok])) if ok.any() else float("inf")
    log(
        f"steady-state: {done_frames} frames in {elapsed:.2f}s -> {fps:.1f} frames/s/chip "
        f"(successes {int(ok.sum())}/{done_frames} = {success_rate:.1%}, "
        f"median rot err {rot_err_med:.3f} deg vs GT)"
    )

    # --- roofline / MFU (VERDICT r3 item 3) ------------------------------
    # XLA's own cost model on the optimized HLO: FLOPs + HBM bytes per
    # chunk program, scaled by the measured rate. Tells you whether the
    # next 2x lives in compute or memory (and how far from the MXU roof
    # this inherently gather/compare-heavy frontend runs).
    step_flops, step_bytes = _cost(
        step, carry[0], carry[1], carry[2], blocks[0],
        pass_keys[0][chunk : 2 * chunk], cam, config, mask_all,
    )
    if step_flops:
        achieved = step_flops * (fps / chunk)
        log(
            f"roofline: VO {step_flops / chunk / 1e9:.2f} GFLOP/frame + "
            f"{step_bytes / chunk / 1e6:.1f} MB HBM/frame "
            f"(intensity {step_flops / max(step_bytes, 1.0):.0f} flop/byte) -> "
            f"achieved {achieved / 1e12:.3f} TFLOP/s = "
            f"{achieved / V5E_PEAK_BF16:.2%} of v5e bf16 peak, "
            f"HBM {step_bytes * (fps / chunk) / 1e9:.1f} GB/s = "
            f"{step_bytes * (fps / chunk) / V5E_HBM_BW:.1%} of bandwidth"
        )

    if os.environ.get("BENCH_SECONDARY", "1") == "1":
        _secondary_metrics(jax, frames, cam, config, blocks, keys, chunk, force, log)
        _flagship_metric(jax, frames, cam, chunk, force, log)

    if success_rate < 0.8 or rot_err_med > 1.0:
        log(
            f"BENCH VALIDATION FAILED: success_rate={success_rate:.3f} (floor 0.8), "
            f"median rot err={rot_err_med:.3f} deg (ceiling 1.0) — refusing to "
            "report throughput for a pipeline producing invalid poses"
        )
        raise SystemExit(1)

    print(
        json.dumps(
            {
                "metric": "vo_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 500.0, 3),
                "success_rate": round(success_rate, 4),
                "rot_err_deg_median": round(rot_err_med, 4),
            }
        )
    )


# TPU v5e per-chip peaks for MFU/roofline context (public spec: 197 TFLOP/s
# bf16 MXU, 819 GB/s HBM). f32 work runs below the bf16 roof; the MFU figure
# is deliberately reported against the bf16 peak so it never flatters.
V5E_PEAK_BF16 = 197e12
V5E_HBM_BW = 819e9


def _cost(jitted, *args, **kwargs):
    """(flops, bytes_accessed) from XLA's cost model for one jitted call.

    Returns (0.0, 0.0) when the backend doesn't expose cost_analysis (the
    roofline lines are then skipped). The lower+compile is cache-hit: the
    same program was just executed.
    """
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _secondary_metrics(jax, frames, cam, config, blocks, keys, chunk, force, log):
    """The other BASELINE.json metrics, to stderr: ORB+match ms/frame and
    BA ms/iter at 10k points (the reference prints these at runtime but
    never recorded them)."""
    import jax.numpy as jnp

    from slamtpu.feature.detector import detect_and_compute
    from slamtpu.feature.matcher import FeatureMatcher
    from slamtpu.ops.hamming import descriptor_bits
    import time

    # --- ORB + match ms/frame -------------------------------------------
    matcher = FeatureMatcher()

    @jax.jit
    def orb_match(fr):
        feats = detect_and_compute(fr, config.orb)
        bits, pops = descriptor_bits(feats.descriptors)
        good = jax.vmap(
            lambda qb, qp, m1, tb, tp, m2: matcher.filter_good_matches(
                matcher.match_from_bits(qb, qp, m1, tb, tp, m2)
            )
        )(bits[:-1], pops[:-1], feats.mask[:-1], bits[1:], pops[1:], feats.mask[1:])
        return good.mask

    dev_blocks = [jax.device_put(b) for b in blocks[:3]]
    force(orb_match(dev_blocks[0]))
    samples = []
    for b in dev_blocks:  # distinct inputs per sample (memoizing runtime)
        t0 = time.time()
        force(orb_match(b))
        samples.append((time.time() - t0) / chunk * 1000)
    ms_frame = float(np.median(samples))
    log(
        f"secondary: ORB+match {ms_frame:.2f} ms/frame "
        f"(samples {', '.join(f'{s:.2f}' for s in samples)})"
    )

    # Pipelined variant: queue three chunk dispatches back-to-back, sync
    # once — the steady-state pipeline's posture. Each single-shot sample
    # above pays one serial dispatch->fetch round trip through the tunnel,
    # which the pipeline overlaps with execution; that per-call latency is
    # why the ORB+match SUBSET used to report slower than the FULL pipeline
    # (BENCH_r03: 2.09 vs 1.65 ms/frame — VERDICT r3 weakness 4). Distinct
    # inputs per dispatch: the runtime memoizes identical executions.
    pipe_blocks = [jax.device_put(b) for b in blocks[3:6]]
    force(pipe_blocks[-1][0, 0])
    t0 = time.time()
    outs = [orb_match(b) for b in pipe_blocks]
    force(outs[-1])
    ms_pipe = (time.time() - t0) / (len(pipe_blocks) * chunk) * 1000
    log(
        f"secondary: ORB+match pipelined {ms_pipe:.2f} ms/frame "
        f"({len(pipe_blocks)} chunks queued, one sync — the single-shot "
        "number above includes one serial dispatch+sync round trip per call)"
    )
    fl, by = _cost(orb_match, dev_blocks[0])
    if fl:
        rate = 1000.0 / max(ms_pipe, 1e-9)  # frames/s at the pipelined rate
        log(
            f"roofline: ORB+match {fl / chunk / 1e9:.2f} GFLOP/frame -> "
            f"{fl / chunk * rate / 1e12:.3f} TFLOP/s = "
            f"{fl / chunk * rate / V5E_PEAK_BF16:.2%} of bf16 peak, "
            f"HBM {by / chunk * rate / 1e9:.1f} GB/s = "
            f"{by / chunk * rate / V5E_HBM_BW:.1%} of bandwidth"
        )

    # --- BA ms/iter @ 10k points ----------------------------------------
    from slamtpu.mapping.bundle_adjustment import BaConfig, ObservationBatch, ba_solve

    rng = np.random.default_rng(0)
    n_poses, n_points, obs_per_point = 50, 10_000, 4
    pts = np.stack(
        [rng.uniform(-20, 20, n_points), rng.uniform(-5, 5, n_points), rng.uniform(5, 60, n_points)], 1
    ).astype(np.float32)
    rots = np.tile(np.eye(3, dtype=np.float32), (n_poses, 1, 1))
    trans = np.stack(
        [np.array([0.3 * i, 0.0, 0.0], np.float32) for i in range(n_poses)]
    )
    pt_idx = np.repeat(np.arange(n_points, dtype=np.int32), obs_per_point)
    kf_idx = rng.integers(0, n_poses, size=pt_idx.shape[0]).astype(np.int32)
    p_cam = np.einsum("mij,mj->mi", rots[kf_idx], pts[pt_idx]) + trans[kf_idx]
    pix = np.stack(
        [718.0 * p_cam[:, 0] / p_cam[:, 2] + 607.0, 718.0 * p_cam[:, 1] / p_cam[:, 2] + 185.0], 1
    ).astype(np.float32) + rng.normal(scale=0.5, size=(pt_idx.shape[0], 2)).astype(np.float32)
    obs = ObservationBatch(
        jnp.asarray(kf_idx), jnp.asarray(pt_idx), jnp.asarray(pix), jnp.ones(pt_idx.shape[0], bool)
    )
    # gather-mode segment reductions with the exact observer bound (what an
    # eager ba_solve call auto-derives; jit hides the concrete indices, so
    # pass it explicitly — mapping/bundle_adjustment.py docstring).
    # MARGINAL ms/iter via iteration-count differencing: a single timed call
    # through this environment's tunnel carries ~25 ms of dispatch+sync
    # round trip plus the solve's one-time setup (observer-table sort,
    # indicator build, initial error), which at 5 iterations used to inflate
    # "ms/iter" ~2.6x. Timing the SAME solve at 5 and 10 forced iterations
    # cancels every fixed cost; the fixed part is reported alongside.
    def make_solve(n_iter):
        cfg_i = BaConfig(max_iterations=n_iter, min_error_change=0.0)
        return jax.jit(
            lambda r, t, p: ba_solve(
                cam, r, t, p, obs, cfg_i, fix_first_pose=True,
                segment_method="gather", gather_k_pt=obs_per_point,
            )
        )

    solvers = {n: make_solve(n) for n in (5, 10)}

    def timed_solve(n_iter, rep):
        solve = solvers[n_iter]
        out = solve(jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(pts))
        force(out[3])  # warm (compile / cache load)
        t0 = time.time()
        out = solve(
            jnp.asarray(rots + rep * 1e-5), jnp.asarray(trans), jnp.asarray(pts)
        )
        force(out[3])
        return (time.time() - t0) * 1000, int(out[4])

    samples = []
    for rep in range(1, 4):
        t5, i5 = timed_solve(5, rep)
        t10, i10 = timed_solve(10, rep)
        samples.append((t10 - t5) / max(i10 - i5, 1))
    ms_iter = float(np.median(samples))
    fixed_ms = t5 - ms_iter * i5
    iters = i10
    log(
        f"secondary: BA {ms_iter:.1f} ms/iter at {n_points} points / {n_poses} poses "
        f"/ {pt_idx.shape[0]} observations (marginal, 10-vs-5-iter differencing; "
        f"~{fixed_ms:.0f} ms fixed setup+dispatch per solve; "
        f"samples {', '.join(f'{s:.1f}' for s in samples)})"
    )
    fl, by = _cost(solvers[10], jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(pts))
    if fl:
        per_iter = fl / max(iters, 1)
        rate = 1000.0 / max(ms_iter, 1e-9)  # iters/s
        log(
            f"roofline: BA {per_iter / 1e9:.2f} GFLOP/iter -> "
            f"{per_iter * rate / 1e12:.3f} TFLOP/s = "
            f"{per_iter * rate / V5E_PEAK_BF16:.2%} of bf16 peak, "
            f"HBM {by / max(iters, 1) * rate / 1e9:.1f} GB/s = "
            f"{by / max(iters, 1) * rate / V5E_HBM_BW:.1%} of bandwidth"
        )

    # --- global-scale BA via co-observation Schur (coobs) -----------------
    # The r4 sparse-Schur assembly at a scale the dense O(P^2*L) product
    # cannot touch: 400 poses x 20k landmarks x 120k observations
    # (VERDICT r4 item 3 asked for a recorded TPU number for this path).
    n_poses_g, n_points_g, obs_per_g = 400, 20_000, 6
    pts_g = np.stack(
        [rng.uniform(-40, 40, n_points_g), rng.uniform(-8, 8, n_points_g),
         rng.uniform(5, 80, n_points_g)], 1
    ).astype(np.float32)
    rots_g = np.tile(np.eye(3, dtype=np.float32), (n_poses_g, 1, 1))
    trans_g = np.stack(
        [np.array([0.2 * i, 0.0, 0.0], np.float32) for i in range(n_poses_g)]
    )
    ptg = np.repeat(np.arange(n_points_g, dtype=np.int32), obs_per_g)
    # Co-observation structure of a tracking window: each landmark is seen
    # by a contiguous run of poses (not uniform random), like a real map.
    first = rng.integers(0, n_poses_g - obs_per_g, size=n_points_g)
    kfg = (np.repeat(first, obs_per_g)
           + np.tile(np.arange(obs_per_g), n_points_g)).astype(np.int32)
    p_cam_g = np.einsum("mij,mj->mi", rots_g[kfg], pts_g[ptg]) + trans_g[kfg]
    pix_g = np.stack(
        [718.0 * p_cam_g[:, 0] / p_cam_g[:, 2] + 607.0,
         718.0 * p_cam_g[:, 1] / p_cam_g[:, 2] + 185.0], 1
    ).astype(np.float32) + rng.normal(scale=0.5, size=(ptg.shape[0], 2)).astype(np.float32)
    obs_g = ObservationBatch(
        jnp.asarray(kfg), jnp.asarray(ptg), jnp.asarray(pix_g),
        jnp.ones(ptg.shape[0], bool),
    )
    def make_solve_g(n_iter):
        cfg_g = BaConfig(max_iterations=n_iter, min_error_change=0.0)
        return jax.jit(
            lambda r, t, p: ba_solve(
                cam, r, t, p, obs_g, cfg_g,
                fix_first_pose=True, schur_method="coobs", coobs_k=obs_per_g,
                segment_method="gather", gather_k_pt=obs_per_g,
            )
        )

    solvers_g = {n: make_solve_g(n) for n in (2, 4)}

    # Perturbed INITIAL state: starting at the ground truth, the first LM
    # step can only increase the (near-zero) error, so the divergence
    # rollback stops the loop before the forced iteration count and the
    # differencing collapses (measured: i4 == i2 -> garbage marginal).
    # The perturbation must be LARGE enough that 4 iterations all do real
    # descent (a 0.05-sigma point nudge converged in 1-2 and then
    # early-stopped anyway).
    pts_g0 = pts_g + rng.normal(scale=0.8, size=pts_g.shape).astype(np.float32)
    trans_g0 = trans_g + rng.normal(scale=0.1, size=trans_g.shape).astype(np.float32)

    def timed_solve_g(n_iter, rep):
        out = solvers_g[n_iter](
            jnp.asarray(rots_g), jnp.asarray(trans_g0), jnp.asarray(pts_g0)
        )
        force(out[3])
        t0 = time.time()
        out = solvers_g[n_iter](
            jnp.asarray(rots_g + rep * 1e-5), jnp.asarray(trans_g0), jnp.asarray(pts_g0)
        )
        force(out[3])
        return (time.time() - t0) * 1000, int(out[4])

    # Marginal ms/iter (same differencing rationale as the dense secondary).
    samples = []
    for rep in range(1, 4):
        t2, i2 = timed_solve_g(2, rep)
        t4, i4 = timed_solve_g(4, rep)
        if i4 > i2:
            samples.append((t4 - t2) / (i4 - i2))
    if samples:
        ms_g = float(np.median(samples))
        fixed_g = t2 - ms_g * i2
        log(
            f"secondary: global BA (coobs) {ms_g:.1f} ms/iter at "
            f"{n_points_g} points / {n_poses_g} poses / {ptg.shape[0]} observations "
            f"(marginal, 4-vs-2-iter differencing; ~{fixed_g:.0f} ms fixed per solve; "
            f"samples {', '.join(f'{s:.1f}' for s in samples)})"
        )
    else:
        log(
            f"secondary: global BA (coobs) {t4 / max(i4, 1):.1f} ms/iter at "
            f"{n_points_g} points / {n_poses_g} poses / {ptg.shape[0]} observations "
            f"(whole-solve average incl. dispatch — solver stopped at "
            f"{i4} iters, differencing unavailable)"
        )

    # --- MonoDepth2 inference ms/frame ------------------------------------
    # Named in BASELINE.json ("MonoDepth2 inference ms"; the reference prints
    # it per frame, examples/depth_estimation.rs:235-301). Weights are random
    # init (no checkpoint ships in this environment) — identical FLOPs to the
    # converted checkpoint, so the timing is the real number.
    from slamtpu.depth.monodepth2 import MonoDepth2

    model = MonoDepth2()
    depth_batch = 8
    # Distinct inputs per timed call: this runtime memoizes identical
    # executions (timing a repeat measures dispatch only).
    clips = [
        jnp.asarray(np.asarray(frames[1 + i * depth_batch : 1 + (i + 1) * depth_batch], np.float32))
        for i in range(3)
    ]
    clips = [jnp.repeat(c[..., None], 3, axis=-1) for c in clips]
    def sync1(x):
        # Single-element fetch: barriers the execution without paying the
        # full-output transfer. Fetching the whole [8, 192, 640] disparity
        # stack costs ~100 ms through the ~40 MB/s tunnel (~12 ms/frame of
        # pure fetch — 3x the actual inference time), which production PCIe
        # makes negligible and is not the subsystem under test.
        return np.asarray(x.ravel()[:1])

    def time_depth(m):
        # Median of per-clip samples (one dispatch + single-element sync
        # each): robust to tunnel jitter, same posture as the ORB/BA samples.
        # Warm up on a PERTURBED clip: the runtime memoizes identical
        # executions, so warming on clips[0] verbatim would turn the first
        # timed sample into a dispatch-only measurement.
        sync1(m._forward(m.encoder_vars, m.decoder_vars, clips[0] + 0.25))
        samples = []
        for c in clips:
            t0 = time.time()
            sync1(m._forward(m.encoder_vars, m.decoder_vars, c))
            samples.append((time.time() - t0) / depth_batch * 1000)
        return float(np.median(samples)), samples

    ms_depth, samples = time_depth(model)
    fl, by = _cost(model._forward, model.encoder_vars, model.decoder_vars, clips[0])
    if fl:
        rate = 1000.0 / max(ms_depth, 1e-9)  # frames/s
        log(
            f"roofline: MonoDepth2 f32 {fl / depth_batch / 1e9:.2f} GFLOP/frame -> "
            f"{fl / depth_batch * rate / 1e12:.3f} TFLOP/s = "
            f"{fl / depth_batch * rate / V5E_PEAK_BF16:.2%} of bf16 peak, "
            f"HBM {by / depth_batch * rate / 1e9:.1f} GB/s = "
            f"{by / depth_batch * rate / V5E_HBM_BW:.1%} of bandwidth"
        )
    log(
        f"secondary: MonoDepth2 {ms_depth:.2f} ms/frame "
        f"(batch {depth_batch}, 640x192, scale-0 disparity; "
        f"samples {', '.join(f'{s:.1f}' for s in samples)})"
    )

    # bf16 inference mode (the TPU recipe; accuracy parity in test_depth.py).
    model16 = MonoDepth2(
        encoder_vars=model.encoder_vars,
        decoder_vars=model.decoder_vars,
        compute_dtype=jnp.bfloat16,
    )
    ms16, samples16 = time_depth(model16)
    log(
        f"secondary: MonoDepth2 bf16 {ms16:.2f} ms/frame "
        f"({ms_depth / max(ms16, 1e-9):.2f}x vs f32; "
        f"samples {', '.join(f'{s:.1f}' for s in samples16)})"
    )


def _flagship_metric(jax, frames, cam, chunk, force, log):
    """BASELINE config 4: the flagship point_cloud pipeline end-to-end —
    VO frontend + keyframe matching + triangulation + map insertion +
    re-association + windowed BA + pruning (examples/point_cloud.rs:154-490)
    — via the scan-fused phase 2 (one device program per chunk,
    pipeline/point_cloud.py run_point_cloud_fused). Reports end-to-end
    frames/s and keyframes/s over the steady-state portion."""
    import time

    import numpy as np

    from slamtpu.feature.detector import OrbConfig
    from slamtpu.mapping.keyframe import KeyframeConfig
    from slamtpu.pipeline.point_cloud import PointCloudConfig, run_point_cloud_fused
    from slamtpu.pipeline.vo import VoConfig

    cfg = PointCloudConfig(
        vo=VoConfig(
            orb=OrbConfig(max_features=500),
            # ransac: the unified VoConfig default (5pt, 128 iters) — same
            # solver config as the headline VO metric and the ATE gates.
            keyframe=KeyframeConfig(0.03, 0.03, 0.7, 3),  # point_cloud.rs:113-119
        ),
        map_capacity=16384,
    )
    n = frames.shape[0]
    # Device-resident frames, same posture as the VO metric: the tunnel's
    # ~40 MB/s host link otherwise dominates (PCIe in production is ~250x
    # faster); one upload outside the timed region.
    dev_frames = jax.device_put(frames)
    np.asarray(dev_frames[0, 0])  # wait until resident
    # Warmup with the IDENTICAL array shape (different seed): per-chunk
    # device slices of the frame stack compile per source-array length, so a
    # shorter warmup would leave that compile inside the timed region.
    # Distinct inputs per run (this runtime memoizes identical executions).
    before = cache_counts_snapshot()
    t0 = time.time()
    run_point_cloud_fused(dev_frames, cam, cfg, chunk_size=chunk, seed=1)
    log(f"flagship compile+warmup: {time.time() - t0:.1f}s ({cache_label(before)})")
    # Device compute and result fetch reported separately, same posture as
    # the headline VO metric's device-resident inputs: the ~6 MB obs-log +
    # map pull costs ~0.2 s through this environment's ~40 MB/s tunnel but
    # ~2 ms over production PCIe — it is link cost, not pipeline cost. The
    # compute number still covers EVERYTHING the pipeline executes
    # (frontend, matching, triangulation, map ops, windowed BA, pruning).
    # Median of 5 timed runs, distinct seeds, after one discarded
    # post-warmup run (the runtime memoizes identical executions;
    # single-run flagship numbers move +-20% with tunnel/session jitter —
    # r4's 294-vs-241 spread was largely this, and the first post-warmup
    # run is reliably the slowest).
    run_point_cloud_fused(dev_frames, cam, cfg, chunk_size=chunk, seed=9)
    compute_ts, total_ts = [], []
    for seed in (2, 3, 4, 5, 6):
        marks = {}
        t0 = time.time()
        res = run_point_cloud_fused(
            dev_frames, cam, cfg, chunk_size=chunk, seed=seed,
            on_compute_done=lambda: marks.setdefault("compute", time.time() - t0),
        )
        total_ts.append(time.time() - t0)
        compute_ts.append(marks.get("compute", total_ts[-1]))
    compute_s = float(np.median(compute_ts))
    elapsed = float(np.median(total_ts))
    n_kf = int(res.keyframe_frame_idx.shape[0])
    fps = (n - 1) / compute_s
    success_rate = res.successful_frames / (n - 1)
    log(
        f"secondary: point_cloud {fps:.1f} frames/s end-to-end device compute "
        f"({n_kf} keyframes -> {n_kf / compute_s:.1f} kf/s, {res.ba_runs} BA runs, "
        f"{int(np.asarray(res.map_state.valid).sum())} landmarks, "
        f"{res.successful_frames}/{n - 1} successes; compute samples "
        f"{', '.join(f'{(n - 1) / t:.0f}' for t in compute_ts)} fps; "
        f"+ {elapsed - compute_s:.2f}s result fetch+reconstruct through the "
        f"~40 MB/s tunnel -> {(n - 1) / elapsed:.1f} frames/s tunnel-inclusive)"
    )
    # Same posture as the headline metric: a throughput number for a
    # pipeline producing garbage poses is not a benchmark.
    if success_rate < 0.8 or res.ba_runs == 0:
        log(
            f"BENCH VALIDATION FAILED (flagship): success_rate="
            f"{success_rate:.3f} (floor 0.8), ba_runs={res.ba_runs} (>0)"
        )
        raise SystemExit(1)


def _run_with_retry():
    """Retry once (via re-exec) if the TPU worker crashes mid-run.

    The tunneled TPU worker occasionally dies with UNAVAILABLE ("worker
    process crashed or restarted") or INTERNAL backend errors — observed
    when a second process touches the chip, and after libtpu mid-flight
    upgrades. The failure poisons the in-process backend, so recovery needs
    a fresh process: sleep until the worker reinitializes, then re-exec.
    The persistent compile cache makes the retry cheap. Validation failures
    (SystemExit) are NOT retried — those are real."""
    try:
        main()
    except Exception as e:  # noqa: BLE001 — classify by message, see below
        name = type(e).__name__
        msg = f"{name}: {e}"
        transient = ("UNAVAILABLE" in msg or "INTERNAL" in msg) and (
            "JaxRuntimeError" in name or "XlaRuntimeError" in name
        )
        if not transient or os.environ.get("BENCH_RETRIED") == "1":
            raise
        log(f"bench: transient TPU backend failure ({msg.splitlines()[0]}); "
            "waiting for worker recovery and retrying once")
        time.sleep(150)  # worker reinit takes ~2-5 min after a crash
        env = dict(os.environ, BENCH_RETRIED="1")
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


if __name__ == "__main__":
    _run_with_retry()
