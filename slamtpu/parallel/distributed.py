"""Multi-HOST (multi-process) plumbing: the DCN analog of parallel/mesh.py.

The reference is a single-process binary (SURVEY.md §5: no distributed
backend); scaling the TPU-native pipeline past one host means multiple
processes, each owning a slice of the chips, coordinated through
`jax.distributed`. This module keeps that plumbing in one place:

  * `initialize_multihost` — process-group setup. On a real TPU pod slice
    the three arguments come from the scheduler's environment and
    `jax.distributed.initialize()` auto-detects them; on CPU test rigs they
    are passed explicitly (the 2-process equality test in
    tests/test_distributed.py drives exactly this path over Gloo).
  * `global_mesh` — the (data, seq) mesh over ALL processes' devices.
  * `from_process_local` — wrap each process's local block of a globally
    sharded array (frames, keys) into one global `jax.Array`, so
    `parallel.sharded.sharded_vo_step` runs unchanged: its shard_map sees
    the global mesh, XLA routes the one-frame halo exchange and the prefix-
    product all_gather over ICI within a host and DCN across hosts.
  * `local_time_slice` — which [t0, t1) of the sequence axis this process's
    outputs cover, for host-side assembly/checking.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, SEQ_AXIS, make_mesh

__all__ = [
    "initialize_multihost",
    "global_mesh",
    "from_process_local",
    "local_time_slice",
]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Join (or create) the JAX process group.

    With all arguments None, defers to `jax.distributed.initialize()`'s
    auto-detection (TPU pod metadata / cluster env vars; falls back to the
    SLAMTPU_COORDINATOR, SLAMTPU_NUM_PROCESSES, SLAMTPU_PROCESS_ID
    environment variables for bare-metal rigs). Safe to call once per
    process, before any other jax API touches the backend.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("SLAMTPU_COORDINATOR")
    if num_processes is None and os.environ.get("SLAMTPU_NUM_PROCESSES"):
        num_processes = int(os.environ["SLAMTPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SLAMTPU_PROCESS_ID"):
        process_id = int(os.environ["SLAMTPU_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def global_mesh(data: int | None = None):
    """The (data, seq) mesh over every process's devices, in global order."""
    return make_mesh(devices=jax.devices(), data=data)


def from_process_local(mesh, local_block: np.ndarray, global_shape, spec=None):
    """Assemble a global array from this process's local block.

    spec defaults to P(DATA_AXIS, SEQ_AXIS) — the frames/keys layout of
    sharded_vo_step. local_block must be exactly this process's contiguous
    piece of the global array under that sharding.
    """
    sharding = NamedSharding(mesh, spec if spec is not None else P(DATA_AXIS, SEQ_AXIS))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_block), tuple(global_shape)
    )


def local_time_slice(mesh, t_total: int) -> tuple[int, int]:
    """[t0, t1) of the global time axis covered by THIS process's devices
    under the seq sharding (contiguous by construction: global device order
    lays processes out consecutively along the mesh)."""
    n_seq = mesh.shape[SEQ_AXIS]
    assert t_total % n_seq == 0, f"{t_total} frames not divisible by seq={n_seq}"
    per_shard = t_total // n_seq
    local_ranks = sorted(
        i % n_seq
        for i, d in enumerate(mesh.devices.flatten())
        if d.process_index == jax.process_index()
    )
    t0 = local_ranks[0] * per_shard
    t1 = (local_ranks[-1] + 1) * per_shard
    return t0, t1
