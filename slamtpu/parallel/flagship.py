"""Multi-chip flagship: seq-sharded VO frontend feeding the fused map phase.

The reference's flagship binary (examples/point_cloud.rs:154-490) is a
single-threaded frame-at-a-time loop. Its cost splits into (a) the per-frame
frontend — detection, matching, RANSAC pose — which carries essentially all
the FLOPs and is embarrassingly parallel over frames, and (b) the mapping
phase — triangulation, map growth, windowed BA — which is inherently
sequential (the map is a running state).

The multi-chip design follows that split:

  * Phase 1 runs `parallel.sharded.sharded_vo_step` over the (data, seq)
    mesh: frames shard across chips along the time axis, with the one-frame
    ICI halo exchange and the distributed prefix product for trajectory
    composition. Per-frame features come back alongside the poses
    (`return_features=True`).
  * Phase 2 runs the same single-device fused scan as
    `pipeline.point_cloud.run_point_cloud_fused` — one `lax.scan` program
    over the keyframe loop — on the first mesh device. Sharding a growing
    map would buy nothing: phase 2 is a small fraction of total work and its
    state dependency is real, so the honest design keeps it sequential and
    scales the frontend.

Exactness: `sharded_vo_step` reproduces the serial frontend arithmetic
(tests/test_sharding.py), and phase 2 is byte-identical code, so
`run_point_cloud_sharded` == `run_point_cloud_fused` on the same clip (see
tests/test_sharding.py::test_sharded_flagship_matches_serial).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..odometry.camera import CameraIntrinsics
from ..odometry.trajectory import Trajectory
from ..pipeline.point_cloud import (
    PointCloudConfig,
    PointCloudResult,
    _fused_carry_init,
    _fused_phase2_chunk,
    _phase2_host_reconstruct,
)
from .mesh import DATA_AXIS
from .sharded import sharded_vo_step

__all__ = ["run_point_cloud_sharded", "run_point_cloud_batched"]


def run_point_cloud_sharded(
    frames,
    intrinsics: CameraIntrinsics,
    mesh,
    config: PointCloudConfig = PointCloudConfig(),
    seed: int = 0,
) -> PointCloudResult:
    """Flagship pipeline with the VO frontend sharded over `mesh`.

    frames: [T, H, W]; T must be divisible by the mesh's total device count
    (data * seq) so the time axis shards evenly. Returns the same
    PointCloudResult as `run_point_cloud_fused`.
    """
    frames = jnp.asarray(frames)
    t_total = frames.shape[0]
    n_dev = int(np.prod(list(mesh.shape.values())))
    assert t_total % n_dev == 0, (
        f"{t_total} frames do not shard evenly over {n_dev} devices; pad or "
        "trim the clip"
    )
    n_pairs = t_total - 1

    # Key schedule parity with the serial pipelines: pair i (frame i+1 vs
    # frame i) uses key[i]; the sharded step consumes one key per FRAME slot,
    # with slot t forming pair (t-1, t) — so slot t carries serial key t-1
    # and slot 0 is unused.
    pair_keys = jax.random.split(jax.random.PRNGKey(seed), max(n_pairs, 1))
    keys = jnp.concatenate(
        [jnp.zeros((1, 2), pair_keys.dtype), pair_keys], axis=0
    )

    result, feats = sharded_vo_step(
        mesh, frames[None], keys[None], intrinsics, config.vo,
        return_features=True,
    )

    # Phase 2 on the first mesh device (sequential by nature).
    dev0 = mesh.devices.flat[0]
    feats1 = jax.device_put(
        jax.tree_util.tree_map(lambda x: x[0, 1:], feats), dev0
    )
    feats0 = jax.device_put(
        jax.tree_util.tree_map(lambda x: x[0, 0], feats), dev0
    )
    rel_rot = jax.device_put(result.rotations[0, 1:], dev0)
    rel_trans = jax.device_put(result.translations[0, 1:], dev0)
    is_kf = jax.device_put(result.is_keyframe[0, 1:], dev0)

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    carry2 = _fused_carry_init(config, feats0, dtype)
    carry2, outs = _fused_phase2_chunk(
        carry2,
        feats1,
        rel_rot.astype(dtype),
        rel_trans.astype(dtype),
        is_kf,
        intrinsics,
        config,
    )

    outs_np = jax.tree_util.tree_map(np.asarray, outs)
    res_np = jax.tree_util.tree_map(np.asarray, result)
    trajectory = Trajectory()
    kf_rots, kf_trans, kf_frames, obs_tuple, ba_runs = _phase2_host_reconstruct(
        outs_np,
        res_np.rotations[0, 1:],
        res_np.translations[0, 1:],
        res_np.is_keyframe[0, 1:],
        trajectory,
        config,
    )

    return PointCloudResult(
        map_state=jax.tree_util.tree_map(np.asarray, carry2.map_state),
        trajectory=trajectory,
        keyframe_rotations=np.stack(kf_rots),
        keyframe_translations=np.stack(kf_trans),
        keyframe_frame_idx=np.asarray(kf_frames),
        ba_runs=ba_runs,
        total_frames=t_total,
        successful_frames=int(res_np.success[0].sum()),
        observations=obs_tuple,
    )


def run_point_cloud_batched(
    frames,
    intrinsics: CameraIntrinsics,
    mesh,
    config: PointCloudConfig = PointCloudConfig(),
    seeds=None,
) -> list:
    """Data-parallel flagship: B independent clips, one full mapping pipeline
    per `data` row of the mesh.

    The reference processes one video per process invocation
    (examples/point_cloud.rs); the TPU-native fleet equivalent runs B clips
    in two jit programs: phase 1 is `sharded_vo_step` over the whole
    (data, seq) mesh (each clip's time axis additionally sharded over
    `seq`), and phase 2 runs each clip's fused keyframe scan
    (`_fused_phase2_chunk` — triangulation, map growth, windowed BA,
    pruning) on its data row's first device via `shard_map`, so every clip
    owns a device-resident landmark map and no cross-clip communication
    exists. Per-clip results match `run_point_cloud_fused` exactly (see
    tests/test_sharding.py::test_batched_flagship_matches_serial).

    frames: [B, T, H, W] with B == mesh.shape["data"] and T divisible by
    the seq size. seeds: per-clip PRNG seeds (defaults to 0..B-1). Returns a
    list of B PointCloudResult.
    """
    frames = jnp.asarray(frames)
    batch, t_total = frames.shape[:2]
    n_data = mesh.shape[DATA_AXIS]
    assert batch == n_data, (
        f"{batch} clips must equal the mesh's data size {n_data} (one map "
        "per data row)"
    )
    n_seq = int(np.prod(list(mesh.shape.values()))) // n_data
    assert t_total % n_seq == 0, (
        f"{t_total} frames do not shard evenly over the {n_seq}-way seq "
        "axis; pad or trim the clips"
    )
    n_pairs = t_total - 1
    seeds = list(range(batch)) if seeds is None else list(seeds)
    assert len(seeds) == batch

    # Per-clip key schedule identical to run_point_cloud_fused(seed=seeds[b]):
    # slot t carries serial pair key t-1; slot 0 is unused.
    keys = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.zeros((1, 2), jnp.uint32),
                    jax.random.split(jax.random.PRNGKey(s), max(n_pairs, 1)),
                ],
                axis=0,
            )
            for s in seeds
        ]
    )

    result, feats = sharded_vo_step(
        mesh, frames, keys, intrinsics, config.vo, return_features=True
    )

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    feats0 = jax.tree_util.tree_map(lambda x: x[:, 0], feats)
    feats1 = jax.tree_util.tree_map(lambda x: x[:, 1:], feats)
    rel_rot = result.rotations[:, 1:].astype(dtype)
    rel_trans = result.translations[:, 1:].astype(dtype)
    is_kf = result.is_keyframe[:, 1:]

    # Phase 2 on a data-only sub-mesh (first seq column): shard_map hands
    # each device exactly one clip, the local batch of 1 is squeezed away so
    # lax.cond stays lazy (a vmapped cond lowers to select and would run BA
    # every keyframe), and each clip's map lives on its own chip.
    from jax.sharding import Mesh, PartitionSpec as P

    col = np.asarray(mesh.devices).reshape(n_data, -1)[:, 0]
    data_mesh = Mesh(col, (DATA_AXIS,))

    def one_clip(f0, f1, rr, rt, kf):
        squeeze = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
        carry0 = _fused_carry_init(config, squeeze(f0), dtype)
        carry, outs = _fused_phase2_chunk(
            carry0, squeeze(f1), squeeze(rr), squeeze(rt), squeeze(kf),
            intrinsics, config,
        )
        return jax.tree_util.tree_map(lambda x: x[None], (carry.map_state, outs))

    # Reshard phase-2 inputs onto the data-only sub-mesh (the frontend left
    # them spread over the full (data, seq) mesh; jit cannot mix meshes).
    from jax.sharding import NamedSharding

    to_col = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(data_mesh, P(DATA_AXIS))), tree
    )
    feats0, feats1, rel_rot, rel_trans, is_kf = (
        to_col(feats0), to_col(feats1), to_col(rel_rot), to_col(rel_trans), to_col(is_kf)
    )

    # A single spec acts as a pytree prefix broadcast over every leaf.
    phase2 = jax.jit(
        jax.shard_map(
            one_clip,
            mesh=data_mesh,
            in_specs=P(DATA_AXIS),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )
    map_states, outs = phase2(feats0, feats1, rel_rot, rel_trans, is_kf)

    outs_np = jax.tree_util.tree_map(np.asarray, outs)
    res_np = jax.tree_util.tree_map(np.asarray, result)
    map_np = jax.tree_util.tree_map(np.asarray, map_states)

    results = []
    for b in range(batch):
        trajectory = Trajectory()
        kf_rots, kf_trans, kf_frames, obs_tuple, ba_runs = _phase2_host_reconstruct(
            jax.tree_util.tree_map(lambda x: x[b], outs_np),
            res_np.rotations[b, 1:],
            res_np.translations[b, 1:],
            res_np.is_keyframe[b, 1:],
            trajectory,
            config,
        )
        results.append(
            PointCloudResult(
                map_state=jax.tree_util.tree_map(lambda x: x[b], map_np),
                trajectory=trajectory,
                keyframe_rotations=np.stack(kf_rots),
                keyframe_translations=np.stack(kf_trans),
                keyframe_frame_idx=np.asarray(kf_frames),
                ba_runs=ba_runs,
                total_frames=t_total,
                successful_frames=int(res_np.success[b].sum()),
                observations=obs_tuple,
            )
        )
    return results
