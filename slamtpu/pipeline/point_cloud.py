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
from .vo import VoConfig, vo_frontend
from ..feature.detector import detect_and_compute

__all__ = [
    "PointCloudConfig",
    "PointCloudResult",
    "run_point_cloud",
    "run_point_cloud_fused",
    "run_global_ba",
]


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
    max_obs_per_kf: int = 1024  # fused pipeline: observation slots per keyframe
    # BA observation gate: drop re-association matches whose landmark
    # reprojects more than this many pixels from the matched keypoint. The
    # reference's find_matches is descriptor-only with a rough bounds check
    # (map.rs:90) and its BA discards results, so it never feels the ~5% of
    # wrong associations (100px+ residuals) the loose ratio-2.0 filter lets
    # through; with BA wired back they poison the solve. 0 disables.
    obs_max_reproj_px: float = 8.0
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
def _reassociate(state: MapState, intrinsics: CameraIntrinsics, desc, kp_mask, rot, trans, xy):
    idx, good, dist = map_find_matches(
        state, intrinsics, desc, kp_mask, rot, trans, frame_xy=xy
    )
    new_state = map_update_observations(state, good)
    return new_state, idx, good, dist


def run_point_cloud(
    frames,
    intrinsics: CameraIntrinsics,
    config: PointCloudConfig = PointCloudConfig(),
    chunk_size: int | None = None,
    seed: int = 0,
    resume_from: str | None = None,
    rerun_logger=None,
) -> PointCloudResult:
    """rerun_logger: optional `utils.metrics.RerunLogger`; when active, the
    reference's viewer surface is replayed at the same cadence
    (point_cloud.rs:169-394): frame images every frame, the camera transform
    and 2D/side-by-side match overlays every keyframe, map points and the
    trajectory strip after every keyframe's BA/prune section."""
    frames = np.asarray(frames)
    rr_log = rerun_logger if (rerun_logger is not None and rerun_logger.active) else None
    t_total = frames.shape[0]
    n_pairs = t_total - 1
    keys = jax.random.split(jax.random.PRNGKey(seed), max(n_pairs, 1))
    chunk = chunk_size or max(n_pairs, 1)  # single-frame clip: no pairs, avoid a zero range step

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
            carry[0], carry[1], carry[2], block, keys[start:stop], intrinsics, config.vo,
            None, frames[start] if config.vo.refine_matches else None,
        )
        res = jax.tree_util.tree_map(np.asarray, res)
        successful += int(res.success.sum())

        if rr_log:
            for i in range(stop - start):
                rr_log.set_frame(start + i + 1)
                rr_log.log_frame(frames[start + i + 1])

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

            if rr_log:
                # Camera transform + keyframe match overlays
                # (point_cloud.rs:210-260).
                rr_log.set_frame(frame_idx)
                rr_log.log_camera(new_r, new_t)
                live = np.asarray(good.mask)
                p_prev = np.asarray(xy1)[live]
                p_cur = np.asarray(xy2)[live]
                rr_log.log_matches_2d(p_prev, p_cur)
                rr_log.log_matches_image(
                    frames[kf_frames[-2]], frames[frame_idx], p_prev, p_cur
                )

            # Re-associate map landmarks with this frame's features
            # (point_cloud.rs:282-306): collect BA observations.
            map_state, midx, mgood, mdist = _reassociate(
                map_state,
                intrinsics,
                cur_feats.descriptors,
                cur_feats.mask,
                jnp.asarray(new_r, jnp.float32),
                jnp.asarray(new_t, jnp.float32),
                cur_feats.xy,
            )
            mgood_np = np.asarray(mgood)
            if config.obs_max_reproj_px:
                mgood_np = mgood_np & (np.asarray(mdist) < config.obs_max_reproj_px)
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
                map_state, kf_rots, kf_trans, did_run = _run_window_ba(
                    map_state, intrinsics, kf_rots, kf_trans,
                    obs_kf, obs_pt, obs_px, obs_id, config,
                )
                # Count only solves that actually ran: _run_window_ba
                # no-ops when the window contributed no surviving
                # observations, and the fused pipeline's ba_pred is False in
                # that case — keep the two pipelines' ba_runs comparable.
                ba_runs += int(did_run)
            if config.prune_interval and n_kf % config.prune_interval == 0:
                map_state = map_prune(map_state, config.min_observations)

            if rr_log:
                # Map points + trajectory after the BA/prune section
                # (point_cloud.rs:385-394).
                valid = np.asarray(map_state.valid)
                rr_log.log_points(np.asarray(map_state.positions)[valid])
                rr_log.log_trajectory(
                    np.asarray([p.position for p in trajectory.points], np.float32)
                )

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
    gathered from the full map by slot) are the whole problem — the solve
    size is independent of total keyframe count or map capacity, and this
    function compiles once per (ba_config, fix_first_pose). Optimized
    landmarks scatter back into the full positions array.
    """
    pts_w = positions[slots].astype(rot_w.dtype)
    obs = ObservationBatch(kf_idx, pt_idx, pixels, obs_mask)
    # TPU: gather-mode segment reductions. A landmark is observed at most
    # once per window keyframe (both callers build per-keyframe DISTINCT
    # slot lists), so the window size is an exact observer bound — the
    # gather contract holds. CPU keeps scatter-adds: the host-loop and
    # fused pipelines' bit-equality under f64 is a test invariant
    # (tests/test_point_cloud.py), and scatter order is padding-invariant.
    if jax.default_backend() != "cpu":
        seg_kw = dict(segment_method="gather", gather_k_pt=rot_w.shape[0])
    else:
        seg_kw = {}
    new_rot, new_trans, new_pts, err, _ = ba_solve(
        intrinsics, rot_w, trans_w, pts_w, obs, ba_config,
        fix_first_pose=fix_first_pose, pose_mask=pose_mask, **seg_kw,
    )
    # Padded rows of `slots` are 0, so a plain scatter would write slot 0
    # twice (optimized value + stale padding) — duplicate-index scatter-set
    # order is undefined on TPU and nondeterministically discarded the BA
    # update for that landmark. Route dead rows to an out-of-range index and
    # drop them instead.
    safe_slots = jnp.where(l_mask, slots, positions.shape[0])
    new_positions = positions.at[safe_slots].set(
        new_pts.astype(positions.dtype), mode="drop"
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
        return map_state, kf_rots, kf_trans, False

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
    # Anchor the window: freeze its two oldest poses. One frozen pose pins
    # the 6-DOF gauge; the second pins monocular SCALE (the similarity
    # transform is reprojection-invariant, so an unanchored window drifts —
    # measured 30% whole-trajectory shrink over 5 BA runs without this).
    pose_mask[: min(2, n_window)] = False

    new_rot, new_trans, new_positions, _ = _ba_window_solve(
        map_state.positions,
        jnp.asarray(rot_w), jnp.asarray(trans_w), jnp.asarray(pose_mask),
        jnp.asarray(slots), jnp.asarray(l_mask),
        jnp.asarray(kf_arr), jnp.asarray(pt_arr), jnp.asarray(px_arr),
        jnp.asarray(obs_mask),
        intrinsics, config.ba, False,  # gauge handled by the frozen anchors
    )
    map_state = map_state._replace(positions=new_positions)
    new_rot = np.asarray(new_rot)
    new_trans = np.asarray(new_trans)
    kf_rots = list(kf_rots)
    kf_trans = list(kf_trans)
    for j in range(n_window):
        kf_rots[start_idx + j] = new_rot[j]
        kf_trans[start_idx + j] = new_trans[j]
    return map_state, kf_rots, kf_trans, True


def run_global_ba(
    result: "PointCloudResult",
    intrinsics: CameraIntrinsics,
    ba_config: BaConfig | None = None,
    landmark_chunk: int = 2048,
    schur_method: str = "auto",
    coobs_k: int | None = None,
):
    """Global bundle adjustment over ALL keyframes and logged observations.

    The reference caps itself at windowed refinement (its dense-ish solver and
    the discarded results at the call site, point_cloud.rs:309-371); this runs
    one joint LM solve over the full trajectory using the landmark-chunked
    Schur assembly in ba_solve — peak memory O(P * landmark_chunk) floats, so
    250+ poses x 16k landmarks x 100k+ observations fits comfortably on chip.

    Returns (new_result, error_before, error_after) where the errors are the
    total Huber reprojection error over the retained observations.
    """
    from ..mapping.bundle_adjustment import compute_total_error

    obs_kf, obs_pt, obs_px, obs_id = result.observations
    if len(obs_kf) == 0 or result.keyframe_rotations.shape[0] < 3:
        return result, 0.0, 0.0

    ids_np = np.asarray(result.map_state.ids)
    valid_np = np.asarray(result.map_state.valid)
    obs_kf = np.asarray(obs_kf, np.int32)
    obs_pt = np.asarray(obs_pt, np.int32)
    obs_px = np.asarray(obs_px, np.float32).reshape(-1, 2)
    obs_id = np.asarray(obs_id, np.int32)

    # Drop observations whose map slot was pruned or recycled to a different
    # landmark since recording (same rule as the windowed paths).
    ok = valid_np[obs_pt] & (ids_np[obs_pt] == obs_id)
    obs_kf, obs_pt, obs_px = obs_kf[ok], obs_pt[ok], obs_px[ok]
    if obs_kf.size == 0:
        return result, 0.0, 0.0

    # Compact landmarks to the observed subset.
    uniq_slots, pt_idx = np.unique(obs_pt, return_inverse=True)
    points = np.asarray(result.map_state.positions)[uniq_slots]

    rot = np.asarray(result.keyframe_rotations, np.float32)
    trans = np.asarray(result.keyframe_translations, np.float32)
    # Gauge + monocular scale anchor: freeze the two oldest keyframes (same
    # rationale as the windowed solves).
    pose_mask = np.ones(rot.shape[0], bool)
    pose_mask[:2] = False

    obs = ObservationBatch(
        jnp.asarray(obs_kf), jnp.asarray(pt_idx.astype(np.int32)),
        jnp.asarray(obs_px), jnp.ones((obs_kf.size,), bool),
    )
    cfg = ba_config or BaConfig()
    err_before = float(
        compute_total_error(
            intrinsics, jnp.asarray(rot), jnp.asarray(trans),
            jnp.asarray(points.astype(np.float32)), obs, cfg.huber_delta,
        )
    )
    if schur_method == "auto":
        # Past ~256 poses the dense Schur's O(P^2 * L) product dominates;
        # the co-observation pair assembly scales with observations instead
        # (mapping/bundle_adjustment.py ba_solve docstring).
        schur_method = "coobs" if rot.shape[0] > 256 else "dense"
    if schur_method == "coobs" and coobs_k is None:
        # coobs keeps at most coobs_k observers per landmark and DROPS the
        # rest from the whole problem — a fixed default silently sheds data
        # on long trajectories with well-observed landmarks (ADVICE r4).
        # Derive K from the actual observation structure: the max observer
        # count, capped at 64 (the pair assembly is O(L * K^2) FLOPs with K
        # segment_sum passes; past 64 observers per landmark the dropped
        # tail observations add little to an already over-determined point).
        observers = np.bincount(pt_idx, minlength=uniq_slots.size)
        coobs_k = int(min(max(observers.max(), 1), 64))
        dropped = int(np.maximum(observers - coobs_k, 0).sum())
        if dropped:
            import sys

            print(
                f"run_global_ba: coobs_k={coobs_k} (capped) drops {dropped}/"
                f"{pt_idx.size} observations on over-observed landmarks",
                file=sys.stderr,
            )
    elif coobs_k is None:
        coobs_k = 16  # unused by the dense path
    new_rot, new_trans, new_pts, err_after, _ = ba_solve(
        intrinsics,
        jnp.asarray(rot), jnp.asarray(trans),
        jnp.asarray(points.astype(np.float32)),
        obs, cfg, fix_first_pose=False, pose_mask=jnp.asarray(pose_mask),
        landmark_chunk=landmark_chunk,
        schur_method=schur_method, coobs_k=coobs_k,
    )

    positions = np.asarray(result.map_state.positions).copy()
    positions[uniq_slots] = np.asarray(new_pts, positions.dtype)
    new_result = dataclasses.replace(
        result,
        map_state=result.map_state._replace(positions=positions),
        keyframe_rotations=np.asarray(new_rot),
        keyframe_translations=np.asarray(new_trans),
        ba_runs=result.ba_runs + 1,
    )
    return new_result, err_before, float(err_after)


# ---------------------------------------------------------------------------
# Fused phase 2: the whole keyframe loop as ONE lax.scan program per chunk.
#
# The host-loop `run_point_cloud` dispatches ~5 device programs plus several
# host<->device transfers PER KEYFRAME (VERDICT.md round 1, weakness 5). Here
# the per-keyframe work — keyframe matching, triangulation, map insertion,
# re-association, observation logging, windowed BA, pruning — is a single
# scan step under jit: one program per chunk, carry resident on device, only
# compact per-step outputs returned to the host. BA runs inside `lax.cond`
# (the untaken branch costs nothing at runtime on TPU), on the rolling
# window's pose ring against the full fixed-capacity landmark array.
# ---------------------------------------------------------------------------

from typing import NamedTuple


class _FusedCarry(NamedTuple):
    map_state: MapState
    # Free-slot table + cursor (see _free_table): rebuilt only on prune
    # steps, consumed sequentially by inserts — replaces map_insert's
    # per-step full-capacity cumsum/scatter ranking, which dominated the
    # fused step's cost at 16k slots.
    free_slots: jnp.ndarray  # [cap] int32 rank -> slot (cap = none)
    free_head: jnp.ndarray  # int32 scalar — next unconsumed rank
    # Pre-unpacked map descriptor bits for the re-association matcher
    # (ops/hamming.descriptor_bits layout): updated only on the rows each
    # insert touches, so the matcher never re-unpacks all `cap` slots per
    # keyframe (~1.3 ms/keyframe on v5e at 16k capacity). Freed slots keep
    # stale bits harmlessly — map_find_matches masks them via `visible`.
    map_bits: jnp.ndarray  # [cap, 256] bf16
    map_pops: jnp.ndarray  # [cap] f32
    prev_xy: jnp.ndarray  # [K, 2] previous-KEYFRAME keypoints
    prev_desc: jnp.ndarray  # [K, 32]
    prev_mask: jnp.ndarray  # [K]
    prev_rot: jnp.ndarray  # [3, 3] world-to-camera of the previous keyframe
    prev_trans: jnp.ndarray  # [3]
    kf_count: jnp.ndarray  # int32 scalar (includes keyframe 0)
    ring_rot: jnp.ndarray  # [W, 3, 3] last-W keyframe poses, oldest..newest
    ring_trans: jnp.ndarray  # [W, 3]
    ring_kf: jnp.ndarray  # [W] int32 global keyframe index (-1 = empty)
    ring_slots: jnp.ndarray  # [W, O] int32 observed map slots
    ring_ids: jnp.ndarray  # [W, O] int32 landmark id at observation time
    ring_px: jnp.ndarray  # [W, O, 2] float32 observed pixels
    ring_mask: jnp.ndarray  # [W, O] bool


class _FusedStepOut(NamedTuple):
    kf_idx: jnp.ndarray  # int32, -1 when the step created no keyframe
    new_rot: jnp.ndarray  # [3, 3]
    new_trans: jnp.ndarray  # [3]
    ba_flag: jnp.ndarray  # bool
    ring_rot: jnp.ndarray  # [W, 3, 3] post-BA snapshot
    ring_trans: jnp.ndarray  # [W, 3]
    ring_kf: jnp.ndarray  # [W]
    obs_slots: jnp.ndarray  # [O]
    obs_ids: jnp.ndarray  # [O]
    obs_px: jnp.ndarray  # [O, 2]
    obs_mask: jnp.ndarray  # [O]


def _free_table(state: MapState):
    """Free slots in index order as a rank->slot table (cap = no slot).

    The SAME ranking map_insert computes per call (map.py:77-83); the fused
    pipeline carries it and rebuilds only when pruning frees slots —
    between prunes the free set only shrinks from the front, so sequential
    consumption (`free_head`) picks the identical slots.
    """
    cap = state.capacity
    free = ~state.valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    table = (
        jnp.full((cap,), cap, jnp.int32)
        .at[jnp.where(free, free_rank, cap)]
        .set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    )
    return table, jnp.zeros((), jnp.int32)


def _map_insert_at(state: MapState, free_slots, free_head, positions, descriptors, mask):
    """map_insert consuming the carried free table (bit-identical slots)."""
    positions = jnp.asarray(positions, state.positions.dtype)
    descriptors = jnp.asarray(descriptors, jnp.uint8)
    mask = jnp.asarray(mask, bool)
    cap = state.capacity
    rank = (jnp.cumsum(mask.astype(jnp.int32)) - 1).astype(jnp.int32)
    idx = jnp.clip(free_head + rank, 0, cap - 1)
    # Table entries past the free count hold `cap`; dead rows are routed
    # there too, and scatter mode='drop' discards both.
    slot = jnp.where(mask, free_slots[idx], cap).astype(jnp.int32)
    ids = state.next_id + rank
    new_state = MapState(
        positions=state.positions.at[slot].set(positions, mode="drop"),
        descriptors=state.descriptors.at[slot].set(descriptors, mode="drop"),
        observations=state.observations.at[slot].set(jnp.int32(1), mode="drop"),
        ids=state.ids.at[slot].set(ids, mode="drop"),
        valid=state.valid.at[slot].set(True, mode="drop"),
        next_id=state.next_id + jnp.sum(mask, dtype=jnp.int32),
    )
    return new_state, free_head + jnp.sum(mask, dtype=jnp.int32), slot


def _fused_carry_init(config: PointCloudConfig, feats0, pose_dtype) -> _FusedCarry:
    from ..ops.hamming import descriptor_bits

    w, o_cap = config.ba_window, config.max_obs_per_kf
    ring_kf = jnp.full((w,), -1, jnp.int32).at[w - 1].set(0)  # keyframe 0
    empty = MapState.empty(config.map_capacity, jnp.float32)
    table0, head0 = _free_table(empty)
    bits0, pops0 = descriptor_bits(empty.descriptors)
    return _FusedCarry(
        map_state=empty,
        free_slots=table0,
        free_head=head0,
        map_bits=bits0,
        map_pops=pops0,
        prev_xy=feats0.xy,
        prev_desc=feats0.descriptors,
        prev_mask=feats0.mask,
        prev_rot=jnp.eye(3, dtype=pose_dtype),
        prev_trans=jnp.zeros((3,), pose_dtype),
        kf_count=jnp.ones((), jnp.int32),
        ring_rot=jnp.broadcast_to(jnp.eye(3, dtype=pose_dtype), (w, 3, 3)),
        ring_trans=jnp.zeros((w, 3), pose_dtype),
        ring_kf=ring_kf,
        ring_slots=jnp.zeros((w, o_cap), jnp.int32),
        ring_ids=jnp.full((w, o_cap), -1, jnp.int32),
        ring_px=jnp.zeros((w, o_cap, 2), jnp.float32),
        ring_mask=jnp.zeros((w, o_cap), bool),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def _fused_phase2_chunk(
    carry: _FusedCarry,
    feats,  # OrbFeatures pytree with leading chunk axis [C, ...]
    rel_rot,  # [C, 3, 3]
    rel_trans,  # [C, 3]
    is_kf,  # [C] bool (keyframe AND pose success, from the VO frontend)
    intrinsics: CameraIntrinsics,
    config: PointCloudConfig,
):
    """Run the keyframe loop over one chunk as a single scan."""
    w, o_cap = config.ba_window, config.max_obs_per_kf
    matcher = FeatureMatcher()

    def kf_step(carry: _FusedCarry, xy, desc, mask, rel_r, rel_t):
        state = carry.map_state

        # Second matching pass: previous KEYFRAME vs current frame
        # (point_cloud.rs:220-231).
        good = matcher.filter_good_matches(
            matcher.match_descriptors(
                carry.prev_desc, desc, query_mask=carry.prev_mask, train_mask=mask
            ),
            2.0,
        )
        xy2 = jnp.take_along_axis(xy.astype(jnp.float32), good.train_idx[:, None], axis=0)
        desc2 = jnp.take_along_axis(desc, good.train_idx[:, None], axis=0)

        # Correct world-to-camera chain (fixes reference :316-333, see module
        # docstring).
        new_r = rel_r @ carry.prev_rot
        new_t = rel_r @ carry.prev_trans + rel_t
        r32, t32 = new_r.astype(jnp.float32), new_t.astype(jnp.float32)
        pr32 = carry.prev_rot.astype(jnp.float32)
        pt32 = carry.prev_trans.astype(jnp.float32)

        # Triangulate new landmarks and insert (point_cloud.rs:261-279).
        xyz, tri_valid = triangulate_points(
            intrinsics, (pr32, pt32), (r32, t32),
            carry.prev_xy.astype(jnp.float32), xy2,
        )
        insert_mask = tri_valid & good.mask
        state, free_head, slot_i = _map_insert_at(
            state, carry.free_slots, carry.free_head, xyz, desc2, insert_mask,
        )
        free_slots = carry.free_slots
        # Maintain the carried pre-unpacked descriptor bits: only the rows
        # this insert touched change (dead rows carry slot == cap and are
        # dropped by the scatter).
        from ..ops.hamming import descriptor_bits

        ins_bits, ins_pops = descriptor_bits(desc2)
        map_bits = carry.map_bits.at[slot_i].set(ins_bits, mode="drop")
        map_pops = carry.map_pops.at[slot_i].set(ins_pops, mode="drop")

        # Re-associate map landmarks with this frame (map.rs:72-118) and
        # record BA observations (point_cloud.rs:282-306). frame_xy makes
        # the matcher return the reprojection distance from ITS landmark
        # projection — no second full-capacity projection pass.
        midx, mgood, dist = map_find_matches(
            state, intrinsics, desc, mask, r32, t32,
            map_bits=map_bits, map_pops=map_pops, frame_xy=xy,
        )
        state = map_update_observations(state, mgood)

        # Gate BA observations by reprojection error (see PointCloudConfig.
        # obs_max_reproj_px); the observation-count increment above stays
        # faithful to the reference's ungated semantics.
        if config.obs_max_reproj_px:
            mgood = mgood & (dist < config.obs_max_reproj_px)

        # Compact the per-slot match mask to O observation rows: the first
        # o_cap matched slots in index order, via cumsum + scatter (a top_k
        # over the full capacity is a per-step sort inside the scan; this is
        # one linear pass). Padding rows point at slot 0 with omask False.
        cap = state.capacity
        obs_rank = jnp.cumsum(mgood.astype(jnp.int32)) - 1
        slots = (
            jnp.zeros((o_cap,), jnp.int32)
            .at[jnp.where(mgood & (obs_rank < o_cap), obs_rank, o_cap)]
            .set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
        )
        omask = mgood[slots] & (jnp.arange(o_cap) <= obs_rank[-1])
        opx = jnp.take_along_axis(
            xy.astype(jnp.float32), midx[slots][:, None], axis=0
        )
        oids = state.ids[slots]

        kf_idx = carry.kf_count  # global index of the keyframe being created
        new_count = carry.kf_count + 1

        # Shift the rings (oldest out) and append the new keyframe.
        ring_rot = jnp.concatenate([carry.ring_rot[1:], new_r[None]], axis=0)
        ring_trans = jnp.concatenate([carry.ring_trans[1:], new_t[None]], axis=0)
        ring_kf = jnp.concatenate([carry.ring_kf[1:], kf_idx[None]], axis=0)
        ring_slots = jnp.concatenate([carry.ring_slots[1:], slots[None]], axis=0)
        ring_ids = jnp.concatenate([carry.ring_ids[1:], oids[None]], axis=0)
        ring_px = jnp.concatenate([carry.ring_px[1:], opx[None]], axis=0)
        ring_mask = jnp.concatenate([carry.ring_mask[1:], omask[None]], axis=0)

        # Windowed BA every ba_interval keyframes (point_cloud.rs:309-371,
        # wired back — unlike the reference's discarded local copies).
        ba_pred = jnp.zeros((), bool)
        if config.ba_interval:
            ba_pred = (new_count % config.ba_interval == 0) & jnp.any(ring_mask)

        def run_ba(args):
            ring_rot, ring_trans, positions = args
            live = ring_kf >= 0
            # Drop observations whose slot was pruned or recycled to a
            # different landmark since recording (ADVICE round 1, item 1).
            obs_ok = (
                ring_mask
                & live[:, None]
                & state.valid[ring_slots]
                & (state.ids[ring_slots] == ring_ids)
            )
            # In-graph landmark compaction: BA over the FULL map capacity
            # made each solve ~0.44 s at 16384 slots (the [P_w, L, 6, 3]
            # coupling scales with L); the window observes at most w*o_cap
            # distinct slots, so dedupe them (sort + first-occurrence +
            # re-sort) into l_max static rows and remap pt_idx via
            # searchsorted — same compact problem the host-loop
            # _run_window_ba builds, but branch-free under jit.
            l_max = min(config.max_ba_landmarks, w * o_cap)
            big = jnp.int32(state.capacity)
            flat_slots = ring_slots.reshape(-1)
            flat_ok = obs_ok.reshape(-1)
            keyed = jnp.where(flat_ok, flat_slots, big)
            skeys = jnp.sort(keyed)
            firsts = jnp.concatenate(
                [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
            )
            uniq = jnp.sort(jnp.where(firsts, skeys, big))[:l_max]
            l_mask_c = uniq < big
            slots_c = jnp.where(l_mask_c, uniq, 0)
            pt_c = jnp.clip(jnp.searchsorted(uniq, flat_slots), 0, l_max - 1)
            ok_c = flat_ok & (uniq[pt_c] == flat_slots)
            # Gauge + scale anchor: freeze the window's two oldest live
            # poses (same rationale as _run_window_ba — a monocular window
            # with fewer than two pinned poses drifts along the similarity
            # gauge).
            live_rank = jnp.cumsum(live.astype(jnp.int32)) - 1
            pose_free = live & (live_rank >= 2)
            new_rot, new_trans, new_positions, _ = _ba_window_solve(
                positions,
                ring_rot, ring_trans, pose_free,
                slots_c, l_mask_c,
                jnp.repeat(jnp.arange(w, dtype=jnp.int32), o_cap),
                pt_c.astype(jnp.int32),
                ring_px.reshape(-1, 2).astype(ring_rot.dtype),
                ok_c,
                intrinsics, config.ba, False,
            )
            return new_rot, new_trans, new_positions

        ring_rot, ring_trans, positions = jax.lax.cond(
            ba_pred,
            run_ba,
            lambda args: args,
            (ring_rot, ring_trans, state.positions),
        )
        state = state._replace(positions=positions)

        # Prune low-observation landmarks every prune_interval keyframes
        # (point_cloud.rs:373-383). Pruning frees slots, so the free table
        # is rebuilt under the same predicate (lax.cond: the rebuild's
        # full-capacity cumsum+scatter only runs on prune steps).
        if config.prune_interval:
            prune_pred = new_count % config.prune_interval == 0
            keep = state.valid & (state.observations >= config.min_observations)
            state = state._replace(
                valid=jnp.where(prune_pred, keep, state.valid)
            )
            free_slots, free_head = jax.lax.cond(
                prune_pred,
                lambda s, t, h: _free_table(s),
                lambda s, t, h: (t, h),
                state, free_slots, free_head,
            )

        new_carry = _FusedCarry(
            map_state=state,
            free_slots=free_slots,
            free_head=free_head,
            map_bits=map_bits,
            map_pops=map_pops,
            prev_xy=xy,
            prev_desc=desc,
            prev_mask=mask,
            # Chain the next keyframe off the ring's newest entry: BA may
            # have just adjusted this keyframe's pose, and the host-loop
            # pipeline likewise chains off the BA-updated kf_rots[-1].
            prev_rot=ring_rot[-1],
            prev_trans=ring_trans[-1],
            kf_count=new_count,
            ring_rot=ring_rot,
            ring_trans=ring_trans,
            ring_kf=ring_kf,
            ring_slots=ring_slots,
            ring_ids=ring_ids,
            ring_px=ring_px,
            ring_mask=ring_mask,
        )
        out = _FusedStepOut(
            kf_idx=kf_idx,
            new_rot=new_r,
            new_trans=new_t,
            ba_flag=ba_pred,
            ring_rot=ring_rot,
            ring_trans=ring_trans,
            ring_kf=ring_kf,
            obs_slots=slots,
            obs_ids=oids,
            obs_px=opx,
            obs_mask=omask,
        )
        return new_carry, out

    def step(carry: _FusedCarry, x):
        xy, desc, mask, rel_r, rel_t, kf = x

        def taken(c):
            return kf_step(c, xy, desc, mask, rel_r, rel_t)

        def skipped(c):
            out = _FusedStepOut(
                kf_idx=jnp.full((), -1, jnp.int32),
                new_rot=c.prev_rot,
                new_trans=c.prev_trans,
                ba_flag=jnp.zeros((), bool),
                ring_rot=c.ring_rot,
                ring_trans=c.ring_trans,
                ring_kf=c.ring_kf,
                obs_slots=jnp.zeros((o_cap,), jnp.int32),
                obs_ids=jnp.full((o_cap,), -1, jnp.int32),
                obs_px=jnp.zeros((o_cap, 2), jnp.float32),
                obs_mask=jnp.zeros((o_cap,), bool),
            )
            return c, out

        return jax.lax.cond(kf, taken, skipped, carry)

    xs = (feats.xy, feats.descriptors, feats.mask, rel_rot, rel_trans, is_kf)
    return jax.lax.scan(step, carry, xs)


@functools.partial(jax.jit, static_argnames=("config",))
def _flagship_chunk(
    c1_feats, c1_kf, c1_pose, carry2, block, keys, intrinsics,
    config: PointCloudConfig, step_mask, prev_frame,
):
    """Frontend + fused phase 2 as ONE device program per chunk.

    The split form dispatched two programs per chunk; through this
    environment's relay each dispatch costs ~10 ms of host-side arg
    serialization, ~0.15 s across a 257-frame run — measured r5: merged
    421 fps median vs 380 split on the flagship bench scene. Values are
    identical (the same two functions, inlined)."""
    carry1, res, feats = vo_frontend(
        c1_feats, c1_kf, c1_pose, block, keys, intrinsics, config.vo,
        step_mask, prev_frame,
    )
    carry2, outs = _fused_phase2_chunk(
        carry2, feats, res.rotations, res.translations,
        res.is_keyframe & res.success, intrinsics, config,
    )
    return carry1, carry2, res, outs


def run_point_cloud_fused(
    frames,
    intrinsics: CameraIntrinsics,
    config: PointCloudConfig = PointCloudConfig(),
    chunk_size: int | None = None,
    seed: int = 0,
    resume_from: str | None = None,
    on_compute_done=None,
) -> PointCloudResult:
    """`run_point_cloud` with the keyframe loop fused into scan programs.

    Semantics match the host-loop pipeline (same keyframe schedule, map
    updates, BA windows and pruning); the only differences are the static
    observation cap (max_obs_per_kf slots per keyframe instead of a global
    newest-first cap) and BA running over the full landmark array with masks
    instead of a compacted subset — both change which padded zeros exist,
    not which real observations are used, as long as the caps are not hit.
    Returns the same PointCloudResult (checkpointable).

    resume_from: directory written by PointCloudResult.save_checkpoint; the
    map, keyframe chain, trajectory, and observation log continue from the
    restored state (same semantics as `run_point_cloud(resume_from=...)`),
    except that the first post-resume BA window spans only keyframes created
    after the resume (the in-scan observation ring starts empty).

    on_compute_done: optional 0-arg callback invoked after ALL device work
    has completed (a one-element barrier) but BEFORE the full result is
    pulled to the host. The bench uses it to report device compute and the
    result fetch separately: through this environment's ~40 MB/s tunnel the
    ~6 MB observation-log/map fetch costs ~0.2 s, which production PCIe
    does in ~2 ms and is not the subsystem under test.
    """
    # Accept device-resident frames as-is: pulling them to host here would
    # round-trip the whole clip through the (slow, tunneled) host link; all
    # downstream uses are shape reads and per-chunk slices.
    if not isinstance(frames, jnp.ndarray):
        frames = np.asarray(frames)
    t_total = frames.shape[0]
    n_pairs = t_total - 1
    keys = jax.random.split(jax.random.PRNGKey(seed), max(n_pairs, 1))
    chunk = chunk_size or max(n_pairs, 1)  # single-frame clip: no pairs, avoid a zero range step

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    feats0 = jax.tree_util.tree_map(
        lambda x: x[0], detect_and_compute(frames[:1], config.vo.orb)
    )
    carry1 = (feats0, KeyframeState.initial(), jnp.eye(4, dtype=dtype))
    carry2 = _fused_carry_init(config, feats0, dtype)

    init_chain = init_obs = None
    trajectory = Trajectory()
    if resume_from:
        from ..io.checkpoint import load_pipeline_state

        map_state, kf_r, kf_t, kf_frames0, trajectory, obs = load_pipeline_state(
            resume_from
        )
        assert map_state.capacity == config.map_capacity, (
            f"checkpoint map capacity {map_state.capacity} != configured "
            f"{config.map_capacity}"
        )
        init_chain = (
            [np.asarray(r) for r in kf_r],
            [np.asarray(t) for t in kf_t],
            list(kf_frames0),
        )
        init_obs = obs if obs else ([], [], [], [])
        carry1 = (feats0, KeyframeState.initial(),
                  jnp.asarray(trajectory.global_pose, dtype))
        from ..ops.hamming import descriptor_bits

        resumed_map = jax.tree_util.tree_map(jnp.asarray, map_state)
        table_r, head_r = _free_table(resumed_map)
        bits_r, pops_r = descriptor_bits(resumed_map.descriptors)
        carry2 = carry2._replace(
            map_state=resumed_map,
            free_slots=table_r,
            free_head=head_r,
            map_bits=bits_r,
            map_pops=pops_r,
            kf_count=jnp.asarray(len(init_chain[0]), jnp.int32),
            prev_rot=jnp.asarray(init_chain[0][-1], dtype),
            prev_trans=jnp.asarray(init_chain[1][-1], dtype),
        )
    successful = 0
    step_outs = []
    res_list = []

    # NOTE on cold start: overlapping compiles on a background thread was
    # tried (r5) and does NOT help on this runtime — the remote compile
    # helper serializes concurrent requests. The persistent compilation
    # cache remains the cold-start story.
    for start in range(0, n_pairs, chunk):
        stop = min(start + chunk, n_pairs)
        block = frames[start + 1 : stop + 1]
        carry1, carry2, res, outs = _flagship_chunk(
            carry1[0], carry1[1], carry1[2], carry2, block, keys[start:stop],
            intrinsics, config,
            None, frames[start] if config.vo.refine_matches else None,
        )
        step_outs.append(outs)
        res_list.append(res)

    from ..utils.fetch import fetch_packed

    if step_outs:  # empty for single-frame clips (keyframe 0 only)
        # ONE host sync at the end: everything above queued asynchronously.
        # Concatenate on device first, then fetch the whole result — outputs
        # plus the final map state — as a single packed buffer: on the
        # tunneled runtime every separate leaf fetch is a ~35 ms round trip,
        # and this result has ~20 leaves (utils/fetch.py).
        outs_dev = jax.tree_util.tree_map(
            lambda *xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0),
            *step_outs,
        )
        if on_compute_done is not None:
            # One-element fetch = true execution barrier on this runtime
            # (block_until_ready is a no-op on axon arrays).
            np.asarray(outs_dev.kf_idx.ravel()[-1:])
            on_compute_done()
        outs, rot_all, trans_all, iskf_all, n_success, map_np = fetch_packed((
            outs_dev,
            jnp.concatenate([r.rotations for r in res_list]),
            jnp.concatenate([r.translations for r in res_list]),
            jnp.concatenate([r.is_keyframe for r in res_list]),
            sum(jnp.sum(r.success) for r in res_list),
            carry2.map_state,
        ))
        successful = int(n_success)
    else:
        outs = None
        rot_all = trans_all = iskf_all = None
        if on_compute_done is not None:
            np.asarray(carry2.map_state.next_id.ravel()[:1])
            on_compute_done()
        map_np = fetch_packed(carry2.map_state)

    recon = _phase2_host_reconstruct(
        outs, rot_all, trans_all, iskf_all, trajectory, config,
        init_chain=init_chain, init_obs=init_obs,
    )
    kf_rots, kf_trans, kf_frames, obs_tuple, ba_runs = recon

    return PointCloudResult(
        map_state=map_np,
        trajectory=trajectory,
        keyframe_rotations=np.stack(kf_rots),
        keyframe_translations=np.stack(kf_trans),
        keyframe_frame_idx=np.asarray(kf_frames),
        ba_runs=ba_runs,
        total_frames=t_total,
        successful_frames=successful,
        observations=obs_tuple,
    )


def _phase2_host_reconstruct(
    outs, rot_all, trans_all, iskf_all, trajectory, config,
    init_chain=None, init_obs=None,
):
    """Host-side reconstruction of the keyframe chain + observation log from
    fused-phase-2 step outputs (concatenated over all chunks, numpy).

    Returns (kf_rots, kf_trans, kf_frames, (obs_kf, obs_pt, obs_px, obs_id),
    ba_runs); fills `trajectory` with the reference-style artifact. Vectorized
    — the naive per-keyframe/per-slot Python loop is ~260k iterations at
    bench scale. Order-equivalence with the interleaved per-step loop:
    appends always precede any BA rewrite of the same index (a keyframe
    exists before BA can touch it), and applying the ring rewrites
    chronologically afterwards preserves last-write-wins.

    init_chain/init_obs: optional (kf_rots, kf_trans, kf_frames) and
    (obs_kf, obs_pt, obs_px, obs_id) seeds from a checkpoint; the fused
    steps' global keyframe indices then continue past the restored chain.
    """
    if init_chain is not None:
        kf_rots, kf_trans, kf_frames = (list(v) for v in init_chain)
    else:
        kf_rots: List[np.ndarray] = [np.eye(3)]
        kf_trans: List[np.ndarray] = [np.zeros(3)]
        kf_frames: List[int] = [0]
    obs_kf, obs_pt, obs_px, obs_id = (
        (list(v) for v in init_obs) if init_obs else ([], [], [], [])
    )
    ba_runs = 0
    if outs is None:
        return kf_rots, kf_trans, kf_frames, (obs_kf, obs_pt, obs_px, obs_id), 0

    # Reference-style trajectory artifact (frame numbering 1-based, keyframe
    # updates only; visual_odometry.rs:120-136).
    for pair_idx in np.nonzero(iskf_all)[0]:
        frame_idx = int(pair_idx) + 1
        trajectory.update(
            rot_all[pair_idx], trans_all[pair_idx],
            frame_idx + 1, frame_idx / config.vo.fps,
        )

    kf_steps = np.nonzero(outs.kf_idx >= 0)[0]
    kf_rots.extend(outs.new_rot[kf_steps])
    kf_trans.extend(outs.new_trans[kf_steps])
    kf_frames.extend((kf_steps + 1).tolist())
    rows, cols = np.nonzero(outs.obs_mask[kf_steps])
    obs_kf.extend(outs.kf_idx[kf_steps][rows].tolist())
    obs_pt.extend(outs.obs_slots[kf_steps][rows, cols].tolist())
    obs_px.extend(outs.obs_px[kf_steps][rows, cols])
    obs_id.extend(outs.obs_ids[kf_steps][rows, cols].tolist())
    ba_steps = np.nonzero(outs.ba_flag)[0]
    ba_runs += int(ba_steps.shape[0])
    for i in ba_steps:
        live = outs.ring_kf[i] >= 0
        for g, r, t in zip(
            outs.ring_kf[i][live], outs.ring_rot[i][live], outs.ring_trans[i][live]
        ):
            kf_rots[g] = r
            kf_trans[g] = t
    return kf_rots, kf_trans, kf_frames, (obs_kf, obs_pt, obs_px, obs_id), ba_runs
