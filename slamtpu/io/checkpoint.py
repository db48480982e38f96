"""Pipeline checkpoint/resume.

The reference has outputs only (trajectory JSON, PLY) and lists map
save/load as an unchecked TODO (/root/reference/TODO.md:74; SURVEY.md §5
"checkpoint/resume: outputs only, no resume"). Here the full mapping-pipeline
state — landmark map, keyframe pose chain, trajectory, accumulated BA
observations — round-trips through an orbax PyTree checkpoint, so long
sequences can stop and resume mid-run.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..mapping.map import MapState
from ..odometry.trajectory import Trajectory, TrajectoryPoint

__all__ = ["save_map", "load_map", "save_pipeline_state", "load_pipeline_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_map(path: str, state: MapState) -> None:
    """Persist a MapState (the reference's missing map save, TODO.md:74)."""
    _checkpointer().save(os.path.abspath(path), state._asdict(), force=True)


def load_map(path: str) -> MapState:
    restored = _checkpointer().restore(os.path.abspath(path))
    return MapState(**{k: restored[k] for k in MapState._fields})


def save_pipeline_state(
    path: str,
    map_state: MapState,
    kf_rotations,
    kf_translations,
    kf_frames,
    trajectory: Trajectory,
    observations=None,
) -> None:
    """Checkpoint the point_cloud pipeline's resumable state."""
    path = os.path.abspath(path)
    arrays = {
        "map": map_state._asdict(),
        "kf_rotations": np.asarray(kf_rotations),
        "kf_translations": np.asarray(kf_translations),
        "kf_frames": np.asarray(kf_frames, np.int64),
        "global_pose": np.asarray(trajectory.global_pose),
    }
    if observations and len(observations[0]) > 0:  # orbax rejects 0-size arrays
        obs_kf, obs_pt, obs_px = observations[:3]
        arrays["obs_kf"] = np.asarray(obs_kf, np.int32)
        arrays["obs_pt"] = np.asarray(obs_pt, np.int32)
        arrays["obs_px"] = np.stack(obs_px).astype(np.float32)
        if len(observations) > 3:
            arrays["obs_id"] = np.asarray(observations[3], np.int32)
    _checkpointer().save(path, arrays, force=True)
    with open(os.path.join(path, "trajectory.json"), "w") as f:
        f.write(trajectory.to_json())


def load_pipeline_state(path: str):
    """Returns (map_state, kf_rotations, kf_translations, kf_frames,
    trajectory, observations)."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    map_state = MapState(**{k: restored["map"][k] for k in MapState._fields})

    trajectory = Trajectory()
    with open(os.path.join(path, "trajectory.json")) as f:
        points = json.load(f)
    trajectory.points = [
        TrajectoryPoint(p["frame"], p["position"], p["timestamp"]) for p in points
    ]
    trajectory.global_pose = np.asarray(restored["global_pose"], np.float64)

    observations = None
    if "obs_kf" in restored:
        obs_pt = [int(v) for v in restored["obs_pt"]]
        if "obs_id" in restored:
            obs_id = [int(v) for v in restored["obs_id"]]
        else:  # legacy checkpoint: assume slots were never recycled
            ids_now = np.asarray(map_state.ids)
            obs_id = [int(ids_now[s]) for s in obs_pt]
        observations = (
            [int(v) for v in restored["obs_kf"]],
            obs_pt,
            [np.asarray(p) for p in restored["obs_px"]],
            obs_id,
        )
    return (
        map_state,
        np.asarray(restored["kf_rotations"]),
        np.asarray(restored["kf_translations"]),
        [int(v) for v in restored["kf_frames"]],
        trajectory,
        observations,
    )
