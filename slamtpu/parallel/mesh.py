"""Device mesh construction for the SLAM pipeline.

The reference is strictly single-threaded (SURVEY.md §2: no distributed
backend of any kind). The TPU-native scaling axes are:

  * `data`  — batch of independent video sequences (pure data parallelism);
  * `seq`   — the time axis of one sequence (the sequence-parallel analog:
    frames shard across chips, pairwise ops need a one-frame halo exchange
    over ICI, pose composition needs a cross-shard prefix product).

There is no tensor/pipeline/expert axis: SLAM frontends have no giant weight
matrices to shard; compute scales with frames, not parameters.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "DATA_AXIS", "SEQ_AXIS"]

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_mesh(n_devices: int | None = None, data: int | None = None, devices=None) -> Mesh:
    """Build a (data, seq) mesh over the first n_devices devices.

    With `data` unset, uses 2 when the device count is even and >= 4, else 1
    — sequence parallelism is the more interesting axis for a single long
    video. Pass `devices` to build over an explicit device list (e.g. the
    CPU backend's virtual devices while the default backend is a TPU).
    """
    devices = (devices or jax.devices())[: n_devices or None]
    n = len(devices)
    if data is None:
        data = 2 if n % 2 == 0 and n >= 4 else 1
    assert n % data == 0, f"{n} devices not divisible by data={data}"
    seq = n // data
    grid = np.asarray(devices).reshape(data, seq)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS))
