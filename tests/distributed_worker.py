"""Worker process for tests/test_distributed.py: 2-process x N-virtual-device
cross-process sharded VO, checked against the serial pipeline.

Run: python distributed_worker.py <process_id> <num_processes> <port> [tiny]
Must configure the platform BEFORE importing jax — do not import conftest.
`tiny` runs the trimmed default-tier problem (2 devices/process, small
frames) instead of the full slow-tier one.
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
tiny = len(sys.argv) > 4 and sys.argv[4] == "tiny"
devs_per_proc = 2 if tiny else 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={devs_per_proc} "
    "--xla_cpu_parallel_codegen_split_count=1"
)
os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Same host-keyed persistent compile cache as tests/conftest.py: the workers
# recompile the sharded VO program every run otherwise, which is what kept
# this coverage out of the default tier (VERDICT r3 item 7).
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _lines = _f.readlines()
    _flags = next((l for l in _lines if l.startswith("flags")), "")
    _model = next((l for l in _lines if l.startswith("model name")), "")
except OSError:  # pragma: no cover
    _flags, _model = "", ""
_tag = "h" + hashlib.md5((_model + _flags).encode()).hexdigest()[:10]
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache", _tag)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402

from slamtpu.feature.detector import OrbConfig  # noqa: E402
from slamtpu.io.synthetic import render_sequence_cached as render_sequence  # noqa: E402
from slamtpu.ops.ransac import RansacConfig  # noqa: E402
from slamtpu.parallel.distributed import (  # noqa: E402
    from_process_local,
    global_mesh,
    initialize_multihost,
    local_time_slice,
)
from slamtpu.parallel.sharded import sharded_vo_step  # noqa: E402
from slamtpu.pipeline.vo import VoConfig, run_vo  # noqa: E402

me, total = initialize_multihost(f"127.0.0.1:{port}", nprocs, pid)
assert me == pid and total == nprocs, (me, total)
assert len(jax.devices()) == devs_per_proc * nprocs, jax.devices()

# Identical scene in every process (deterministic renderer, fixed seed).
if tiny:
    scene = render_sequence(
        n_frames=8, height=120, width=160, n_points=400, step=0.5, seed=7
    )
    cfg = VoConfig(orb=OrbConfig(max_features=128), ransac=RansacConfig(iters=64))
else:
    scene = render_sequence(
        n_frames=16, height=160, width=224, n_points=500, step=0.5, seed=7
    )
    cfg = VoConfig(orb=OrbConfig(max_features=200), ransac=RansacConfig(iters=150))
cam = scene.intrinsics

mesh = global_mesh(data=1)  # 1 x 8: the whole clip shards over time
t_total = scene.frames.shape[0]
t0, t1 = local_time_slice(mesh, t_total)

frames_np = scene.frames[None].astype(np.float32)
pair_keys = jax.random.split(jax.random.PRNGKey(0), t_total - 1)
keys_np = np.concatenate(
    [np.zeros((1, 2), pair_keys.dtype), np.asarray(pair_keys)]
)[None]

frames = from_process_local(mesh, frames_np[:, t0:t1], frames_np.shape)
keys = from_process_local(mesh, keys_np[:, t0:t1], keys_np.shape)

sharded = sharded_vo_step(mesh, frames, keys, cam, cfg)

# Each process checks ITS addressable time-slice against the serial pipeline.
serial = run_vo(scene.frames, cam, cfg, seed=0)


def local_np(arr):
    shards = sorted(arr.addressable_shards, key=lambda s: s.index)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=1)


succ = local_np(sharded.success)[0]
serial_succ = np.concatenate([[False], serial.success])[t0:t1]
np.testing.assert_array_equal(succ, serial_succ)

from scipy.spatial.transform import Rotation  # noqa: E402

rot = local_np(sharded.rotations)[0]
serial_rot = np.concatenate([np.eye(3)[None], serial.rotations])[t0:t1]
ok = serial_succ
rel = np.einsum("tij,tkj->tik", rot[ok], serial_rot[ok])
ang = np.degrees(np.linalg.norm(Rotation.from_matrix(rel).as_rotvec(), axis=-1))
assert ang.size == 0 or ang.max() < 1.0, f"max relative rotation {ang.max():.2f} deg"

print(f"DISTRIBUTED-OK {pid} slice=[{t0},{t1}) successes={int(succ.sum())}", flush=True)
