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
from .sharded import sharded_vo_step

__all__ = ["run_point_cloud_sharded"]


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
