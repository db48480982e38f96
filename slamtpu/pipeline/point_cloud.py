"""Flagship pipeline: VO + keyframe triangulation + global map + windowed BA
+ PLY/JSON export.

TPU-native counterpart of /root/reference/examples/point_cloud.rs (the
fullest reference binary, SURVEY.md §3.2). Structure:

  Phase 1 (batched, one jit program per chunk): the VO frontend — features,
  pairwise poses, keyframe flags for every frame.

  Phase 2 (host loop over the data-dependent keyframe sequence, jitted
  kernels inside): per keyframe, re-match against the previous keyframe
  (matcher kernel), triangulate (batched DLT), insert into the fixed-capacity
  map, re-associate map landmarks (MXU matcher), and every `ba_interval`
  keyframes run windowed bundle adjustment; every `prune_interval` keyframes
  prune low-observation landmarks. The keyframe loop is inherently serial
  (the map grows), but each step is fixed-shape device work.

Deliberate fixes over the reference (SURVEY.md §3.2 flags these as bugs and
directs the build to wire BA correctly):
  * Keyframe poses for triangulation/BA are CORRECT world-to-camera chains
    T_wc(k) = T_rel(k) @ T_wc(k-1); the reference feeds trajectory poses
    built with identity rotations into BA (:316-333) and double-transforms
    triangulated points (:272-276 vs triangulate's own convention).
  * BA results are written back into the keyframe poses and map positions;
    the reference optimizes local copies and discards them (:335-370).
The exported artifact formats match the reference byte-for-byte
(io/export.py). The reference-style trajectory (its quirky composition
T_global = T_global @ T_rel) is still produced for trajectory_output.json
compatibility.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..feature.detector import OrbConfig
from ..feature.matcher import FeatureMatcher
from ..mapping.bundle_adjustment import BaConfig, ObservationBatch, ba_solve
from ..mapping.keyframe import KeyframeConfig, KeyframeState
from ..mapping.map import (
    MapState,
    map_find_matches,
    map_insert,
    map_prune,
    map_update_observations,
)
from ..mapping.triangulation import triangulate_points
from ..odometry.camera import CameraIntrinsics
from ..odometry.trajectory import Trajectory
from ..ops.ransac import RansacConfig
from .vo import VoConfig, vo_frontend
from ..feature.detector import detect_and_compute

__all__ = ["PointCloudConfig", "PointCloudResult", "run_point_cloud"]


@dataclasses.dataclass(frozen=True)
class PointCloudConfig:
    vo: VoConfig = VoConfig(
        # The example's aggressive keyframing (point_cloud.rs:113-119).
        keyframe=KeyframeConfig(
            min_translation=0.03, min_rotation=0.03, min_match_ratio=0.7, max_frames=3
        )
    )
    ba_interval: int = 5  # point_cloud.rs:309
    ba_window: int = 5
    prune_interval: int = 10  # :373
    map_capacity: int = 16384
    max_ba_observations: int = 4096
    max_ba_landmarks: int = 2048  # distinct landmarks per BA window (static shape)
    ba: BaConfig = BaConfig()
    min_observations: int = 2


@dataclasses.dataclass
class PointCloudResult:
    map_state: MapState
    trajectory: Trajectory  # reference-style composition, for the JSON artifact
    keyframe_rotations: np.ndarray  # [N_kf, 3, 3] world-to-camera (correct chain)
    keyframe_translations: np.ndarray  # [N_kf, 3]
    keyframe_frame_idx: np.ndarray  # [N_kf] frame index of each keyframe
    ba_runs: int
    total_frames: int
    successful_frames: int
    observations: tuple = None  # (obs_kf, obs_pt, obs_px, obs_id) — for checkpointing

    def points(self):
        from ..mapping.triangulation import MapPoint

        pos = np.asarray(self.map_state.positions)
        desc = np.asarray(self.map_state.descriptors)
        obs = np.asarray(self.map_state.observations)
        ids = np.asarray(self.map_state.ids)
        valid = np.asarray(self.map_state.valid)
        return [
            MapPoint(position=pos[i], descriptor=desc[i], observations=int(obs[i]), id=int(ids[i]))
            for i in np.nonzero(valid)[0]
        ]

    def stable_points(self, min_observations: int = 2):
        return [p for p in self.points() if p.observations >= min_observations]

    def save(self, ply="point_cloud.ply", pc_json="point_cloud.json", traj_json="trajectory_output.json"):
        from ..io.export import save_json, save_ply

        save_ply(self.points(), ply)
        save_json(self.points(), pc_json)
        self.trajectory.save_to_file(traj_json)

    def save_checkpoint(self, path: str) -> None:
        """Resumable pipeline state (io/checkpoint.py); pass the directory to
        run_point_cloud(resume_from=...) to continue on more frames."""
        from ..io.checkpoint import save_pipeline_state

        save_pipeline_state(
            path,
            self.map_state,
            self.keyframe_rotations,
            self.keyframe_translations,
            list(self.keyframe_frame_idx),
            self.trajectory,
            self.observations,
        )


# ---------------------------------------------------------------------------
# jitted phase-2 kernels (static shapes; compiled once per config)
# ---------------------------------------------------------------------------


@jax.jit
def _match_keyframes(desc1, mask1, desc2, mask2):
    matcher = FeatureMatcher()
    m = matcher.match_descriptors(desc1, desc2, query_mask=mask1, train_mask=mask2)
    return matcher.filter_good_matches(m, 2.0)


@jax.jit
def _triangulate_and_insert(
    state: MapState,
    intrinsics: CameraIntrinsics,
    rot1, t1, rot2, t2,
    xy1, xy2, desc2, good_mask,
):
    """Triangulate matched keyframe pairs into world points; insert."""
    xyz, valid = triangulate_points(intrinsics, (rot1, t1), (rot2, t2), xy1, xy2)
    return map_insert(state, xyz, desc2, valid & good_mask)


@jax.jit
def _reassociate(state: MapState, intrinsics: CameraIntrinsics, desc, kp_mask, rot, trans):
    idx, good = map_find_matches(state, intrinsics, desc, kp_mask, rot, trans)
    new_state = map_update_observations(state, good)
    return new_state, idx, good


def run_point_cloud(
    frames,
    intrinsics: CameraIntrinsics,
    config: PointCloudConfig = PointCloudConfig(),
    chunk_size: int | None = None,
    seed: int = 0,
    resume_from: str | None = None,
) -> PointCloudResult:
    frames = np.asarray(frames)
    t_total = frames.shape[0]
    n_pairs = t_total - 1
    keys = jax.random.split(jax.random.PRNGKey(seed), max(n_pairs, 1))
    chunk = chunk_size or n_pairs

    frontend = jax.jit(vo_frontend, static_argnames=("config",))
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    feats0 = jax.tree_util.tree_map(
        lambda x: x[0], detect_and_compute(frames[:1], config.vo.orb)
    )
    carry = (feats0, KeyframeState.initial(), jnp.eye(4, dtype=dtype))

    if resume_from:
        from ..io.checkpoint import load_pipeline_state

        map_state, kf_r, kf_t, kf_frames, trajectory, obs = load_pipeline_state(resume_from)
        kf_rots = [np.asarray(r) for r in kf_r]
        kf_trans = [np.asarray(t) for t in kf_t]
        obs_kf, obs_pt, obs_px, obs_id = obs if obs else ([], [], [], [])
        carry = (feats0, KeyframeState.initial(), jnp.asarray(trajectory.global_pose, dtype))
    else:
        map_state = MapState.empty(config.map_capacity, jnp.float32)
        trajectory = Trajectory()
        # Keyframe pose chain (correct world-to-camera); keyframe 0 = frame 0.
        kf_rots: List[np.ndarray] = [np.eye(3)]
        kf_trans: List[np.ndarray] = [np.zeros(3)]
        kf_frames: List[int] = [0]
        # Observation store for BA (host side, windowed per run). obs_pt is a
        # map SLOT; obs_id is the landmark id occupying that slot at
        # observation time — prune/insert recycle slots, so BA must drop any
        # observation whose slot no longer holds the same landmark.
        obs_kf: List[int] = []
        obs_pt: List[int] = []
        obs_px: List[np.ndarray] = []
        obs_id: List[int] = []
    kf_feats = [jax.tree_util.tree_map(np.asarray, feats0)]

    ba_runs = 0
    successful = 0

    for start in range(0, n_pairs, chunk):
        stop = min(start + chunk, n_pairs)
        block = frames[start + 1 : stop + 1]
        carry, res, feats_new = frontend(
            carry[0], carry[1], carry[2], block, keys[start:stop], intrinsics, config.vo
        )
        res = jax.tree_util.tree_map(np.asarray, res)
        successful += int(res.success.sum())

        for local_idx in np.nonzero(res.is_keyframe)[0]:
            pair_idx = start + int(local_idx)
            frame_idx = pair_idx + 1
            rel_r = res.rotations[local_idx]
            rel_t = res.translations[local_idx]

            # Reference-style trajectory artifact (frame numbering 1-based,
            # timestamp (frame_count-1)/fps, visual_odometry.rs:128).
            trajectory.update(rel_r, rel_t, frame_idx + 1, frame_idx / config.vo.fps)

            # Correct world-to-camera chain.
            new_r = rel_r @ kf_rots[-1]
            new_t = rel_r @ kf_trans[-1] + rel_t
            prev_feats_np = kf_feats[-1]
            cur_feats = jax.tree_util.tree_map(lambda x: x[local_idx], feats_new)

            # Second matching pass: previous KEYFRAME vs current frame
            # (point_cloud.rs:220-231).
            good = _match_keyframes(
                jnp.asarray(prev_feats_np.descriptors),
                jnp.asarray(prev_feats_np.mask),
                cur_feats.descriptors,
                cur_feats.mask,
            )
            xy1 = jnp.asarray(prev_feats_np.xy, jnp.float32)
            xy2 = jnp.take_along_axis(
                cur_feats.xy.astype(jnp.float32), good.train_idx[:, None], axis=0
            )
            desc2 = jnp.take_along_axis(cur_feats.descriptors, good.train_idx[:, None], axis=0)

            map_state = _triangulate_and_insert(
                map_state,
                intrinsics,
                jnp.asarray(kf_rots[-1], jnp.float32),
                jnp.asarray(kf_trans[-1], jnp.float32),
                jnp.asarray(new_r, jnp.float32),
                jnp.asarray(new_t, jnp.float32),
                xy1,
                xy2,
                desc2,
                good.mask,
            )

            kf_rots.append(np.asarray(new_r))
            kf_trans.append(np.asarray(new_t))
            kf_frames.append(frame_idx)
            kf_feats.append(jax.tree_util.tree_map(np.asarray, cur_feats))

            # Re-associate map landmarks with this frame's features
            # (point_cloud.rs:282-306): collect BA observations.
            map_state, midx, mgood = _reassociate(
                map_state,
                intrinsics,
                cur_feats.descriptors,
                cur_feats.mask,
                jnp.asarray(new_r, jnp.float32),
                jnp.asarray(new_t, jnp.float32),
            )
            mgood_np = np.asarray(mgood)
            midx_np = np.asarray(midx)
            ids_np = np.asarray(map_state.ids)
            cur_xy = np.asarray(cur_feats.xy)
            kf_id = len(kf_rots) - 1
            for slot in np.nonzero(mgood_np)[0]:
                obs_kf.append(kf_id)
                obs_pt.append(int(slot))
                obs_px.append(cur_xy[midx_np[slot]])
                obs_id.append(int(ids_np[slot]))

            n_kf = len(kf_rots)
            if config.ba_interval and n_kf % config.ba_interval == 0 and obs_kf:
                map_state, kf_rots, kf_trans = _run_window_ba(
                    map_state, intrinsics, kf_rots, kf_trans,
                    obs_kf, obs_pt, obs_px, obs_id, config,
                )
                ba_runs += 1
            if config.prune_interval and n_kf % config.prune_interval == 0:
                map_state = map_prune(map_state, config.min_observations)

    return PointCloudResult(
        map_state=map_state,
        trajectory=trajectory,
        keyframe_rotations=np.stack(kf_rots),
        keyframe_translations=np.stack(kf_trans),
        keyframe_frame_idx=np.asarray(kf_frames),
        ba_runs=ba_runs,
        total_frames=t_total,
        successful_frames=successful,
        observations=(obs_kf, obs_pt, obs_px, obs_id),
    )


@functools.partial(jax.jit, static_argnames=("ba_config", "fix_first_pose"))
def _ba_window_solve(
    positions,
    rot_w, trans_w, pose_mask,
    slots, l_mask,
    kf_idx, pt_idx, pixels, obs_mask,
    intrinsics, ba_config, fix_first_pose,
):
    """Jitted windowed-BA step on COMPACT static shapes.

    The window's poses ([P_w]) and its observed-landmark subset ([L_w],
    gathered from the full map by slot) are the whole problem — the dense
    pose-landmark coupling inside ba_solve is [P_w, L_w, 6, 3] regardless of
    total keyframe count or map capacity, and this function compiles once per
    (ba_config, fix_first_pose). Optimized landmarks scatter back into the
    full positions array.
    """
    pts_w = positions[slots].astype(rot_w.dtype)
    obs = ObservationBatch(kf_idx, pt_idx, pixels, obs_mask)
    new_rot, new_trans, new_pts, err, _ = ba_solve(
        intrinsics, rot_w, trans_w, pts_w, obs, ba_config,
        fix_first_pose=fix_first_pose, pose_mask=pose_mask,
    )
    new_positions = positions.at[slots].set(
        jnp.where(l_mask[:, None], new_pts.astype(positions.dtype), positions[slots])
    )
    return new_rot, new_trans, new_positions, err


def _run_window_ba(
    map_state, intrinsics, kf_rots, kf_trans, obs_kf, obs_pt, obs_px, obs_id, config
):
    """Windowed BA over the last ba_window keyframes, wired back.

    Mirrors bundle_adjustment.rs:382-401 (local BA drops observations of
    older keyframes; pose 0 is fixed only when the window reaches it), on
    compact static shapes: ba_window poses x max_ba_landmarks landmarks x
    max_ba_observations observations, padded + masked.
    """
    n_kf = len(kf_rots)
    start_idx = max(n_kf - config.ba_window, 0)
    p_w, m_max, l_max = config.ba_window, config.max_ba_observations, config.max_ba_landmarks

    ids_np = np.asarray(map_state.ids)
    valid_np = np.asarray(map_state.valid)

    # Walk the observation log newest-first (obs_kf is chronological, so the
    # window is a suffix), dropping observations whose slot was pruned or
    # recycled to a different landmark since recording.
    kf_l, pt_l, px_l = [], [], []
    slot_to_compact: dict = {}
    for i in range(len(obs_kf) - 1, -1, -1):
        if obs_kf[i] < start_idx:
            break
        if len(kf_l) == m_max:
            break
        slot = obs_pt[i]
        if not valid_np[slot] or ids_np[slot] != obs_id[i]:
            continue
        compact = slot_to_compact.get(slot)
        if compact is None:
            if len(slot_to_compact) == l_max:
                continue
            compact = len(slot_to_compact)
            slot_to_compact[slot] = compact
        kf_l.append(obs_kf[i] - start_idx)
        pt_l.append(compact)
        px_l.append(obs_px[i])
    if not kf_l:
        return map_state, kf_rots, kf_trans

    m = len(kf_l)
    kf_arr = np.zeros(m_max, np.int32)
    pt_arr = np.zeros(m_max, np.int32)
    px_arr = np.zeros((m_max, 2), np.float32)
    obs_mask = np.zeros(m_max, bool)
    kf_arr[:m] = kf_l
    pt_arr[:m] = pt_l
    px_arr[:m] = np.stack(px_l)
    obs_mask[:m] = True

    slots = np.zeros(l_max, np.int32)
    l_mask = np.zeros(l_max, bool)
    for slot, compact in slot_to_compact.items():
        slots[compact] = slot
        l_mask[compact] = True

    n_window = n_kf - start_idx  # <= p_w
    rot_w = np.tile(np.eye(3, dtype=np.float32), (p_w, 1, 1))
    trans_w = np.zeros((p_w, 3), np.float32)
    rot_w[:n_window] = np.stack(kf_rots[start_idx:])
    trans_w[:n_window] = np.stack(kf_trans[start_idx:])
    pose_mask = np.zeros(p_w, bool)
    pose_mask[:n_window] = True

    new_rot, new_trans, new_positions, _ = _ba_window_solve(
        map_state.positions,
        jnp.asarray(rot_w), jnp.asarray(trans_w), jnp.asarray(pose_mask),
        jnp.asarray(slots), jnp.asarray(l_mask),
        jnp.asarray(kf_arr), jnp.asarray(pt_arr), jnp.asarray(px_arr),
        jnp.asarray(obs_mask),
        intrinsics, config.ba, start_idx == 0,
    )
    map_state = map_state._replace(positions=new_positions)
    new_rot = np.asarray(new_rot)
    new_trans = np.asarray(new_trans)
    kf_rots = list(kf_rots)
    kf_trans = list(kf_trans)
    for j in range(n_window):
        kf_rots[start_idx + j] = new_rot[j]
        kf_trans[start_idx + j] = new_trans[j]
    return map_state, kf_rots, kf_trans
