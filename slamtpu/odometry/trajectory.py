"""Trajectory accumulation: global pose composition from relative motions.

TPU-native counterpart of /root/reference/src/odometry/trajectory.rs. The
reference composes one 4x4 per frame on the host (`T_global = T_global *
T_rel`, trajectory.rs:32-69). Here the whole time axis is composed at once
with `jax.lax.associative_scan` over batched 4x4 matrix products — O(log T)
depth instead of a serial host loop — and a thin stateful `Trajectory` class
keeps API parity (update / current_pose_rt / total_distance / to_json /
save_to_file) for frame-at-a-time callers.
"""

from __future__ import annotations

import dataclasses
import json
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lie import se3_matrix

__all__ = ["TrajectoryPoint", "Trajectory", "compose_relative_transforms", "positions_from_relative"]


def compose_relative_transforms(rel_transforms):
    """Inclusive prefix products of relative transforms.

    rel_transforms: [T, 4, 4] where element k is T_rel for step k.
    Returns [T, 4, 4] with out[k] = T_rel[0] @ T_rel[1] @ ... @ T_rel[k],
    matching the reference's left-to-right composition order
    (trajectory.rs:54-55). Matrix product is associative, so this runs as a
    parallel scan on the MXU.
    """
    return jax.lax.associative_scan(jnp.matmul, rel_transforms)


def positions_from_relative(rotations, translations):
    """[T,3,3],[T,3] relative motions -> [T+1,3] global positions (origin first)."""
    transforms = se3_matrix(rotations, translations)
    global_poses = compose_relative_transforms(transforms)
    positions = global_poses[:, :3, 3]
    origin = jnp.zeros((1, 3), dtype=positions.dtype)
    return jnp.concatenate([origin, positions], axis=0)


@dataclasses.dataclass
class TrajectoryPoint:
    """One trajectory sample (trajectory.rs:5-10)."""

    frame: int
    position: List[float]
    timestamp: float


class Trajectory:
    """Stateful accumulator mirroring the reference API (trajectory.rs:13-137).

    Starts with an origin point for frame 0 (trajectory.rs:20-29). The 4x4
    state lives as a small numpy array on the host — per-frame composition is
    16 FLOPs and does not belong on the device; the batched path above is the
    TPU-native route for whole clips.
    """

    def __init__(self, dtype=np.float64):
        self._dtype = dtype
        self.global_pose = np.eye(4, dtype=dtype)
        self.points: List[TrajectoryPoint] = [TrajectoryPoint(0, [0.0, 0.0, 0.0], 0.0)]

    def update(self, rotation, translation, frame: int, timestamp: float) -> None:
        """Compose T_global = T_global @ T_rel and record the new position."""
        rel = np.eye(4, dtype=self._dtype)
        rel[:3, :3] = np.asarray(rotation, dtype=self._dtype)
        rel[:3, 3] = np.asarray(translation, dtype=self._dtype).reshape(3)
        self.global_pose = self.global_pose @ rel
        self.points.append(
            TrajectoryPoint(int(frame), [float(v) for v in self.global_pose[:3, 3]], float(timestamp))
        )

    def extend_batch(self, rotations, translations, frames, timestamps) -> None:
        """Append a whole batch of relative motions at once (device scan).

        rotations [T,3,3], translations [T,3]: composed on-device via the
        associative scan, then appended to the host-side point list.
        """
        rotations = jnp.asarray(rotations)
        translations = jnp.asarray(translations)
        base = jnp.asarray(self.global_pose, dtype=rotations.dtype)
        rel = se3_matrix(rotations, translations)
        rel = jnp.concatenate([base[None], rel], axis=0)
        global_poses = np.asarray(compose_relative_transforms(rel))[1:]
        self.global_pose = np.asarray(global_poses[-1], dtype=self._dtype)
        for pose, frame, ts in zip(global_poses, frames, timestamps):
            self.points.append(TrajectoryPoint(int(frame), [float(v) for v in pose[:3, 3]], float(ts)))

    def current_pose(self):
        return self.global_pose

    def current_pose_rt(self):
        """(R, t) of the current global pose (trajectory.rs:77-92)."""
        return self.global_pose[:3, :3].copy(), self.global_pose[:3, 3].copy()

    def total_distance(self) -> float:
        """Sum of consecutive point distances (trajectory.rs:100-113)."""
        pos = np.array([p.position for p in self.points])
        if len(pos) < 2:
            return 0.0
        return float(np.sum(np.linalg.norm(np.diff(pos, axis=0), axis=1)))

    def __len__(self) -> int:
        return len(self.points)

    def is_empty(self) -> bool:
        return not self.points

    def to_json(self) -> str:
        """Pretty JSON array of points, shaped like serde's output
        (trajectory.rs:126-129): [{"frame": .., "position": [..], "timestamp": ..}]."""
        return json.dumps(
            [dataclasses.asdict(p) for p in self.points],
            indent=2,
        )

    def save_to_file(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())
