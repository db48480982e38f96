"""Global landmark map as fixed-capacity struct-of-arrays.

TPU-native counterpart of /root/reference/src/mapping/map.rs. The reference's
HashMap<id, MapPoint> becomes a static-capacity SoA pytree: positions,
packed descriptors, observation counts, ids, and a validity mask. Insertion
scatters into free slots, pruning clears the mask, and re-association
(`find_matches`, map.rs:72-118) reuses the MXU Hamming matcher with the map's
descriptors as queries — a [capacity, K] distance matmul.

Reference semantics preserved: projection visibility uses z > 0 and the
rough 0<=x<4000, 0<=y<3000 bounds check (map.rs:90); match filtering uses the
same max(2*min_dist, 30) rule; observations start at 1 and prune keeps
observations >= min_observations (default 2, map.rs:26,130-137); ids are
assigned sequentially on insertion (map.rs:31-37).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..feature.matcher import FeatureMatcher
from ..odometry.camera import CameraIntrinsics
from .triangulation import MapPoint

__all__ = ["MapState", "Map", "map_insert", "map_find_matches", "map_update_observations", "map_prune"]


class MapState(NamedTuple):
    positions: jnp.ndarray  # [C, 3]
    descriptors: jnp.ndarray  # [C, 32] uint8
    observations: jnp.ndarray  # [C] int32
    ids: jnp.ndarray  # [C] int32 (-1 = empty slot)
    valid: jnp.ndarray  # [C] bool
    next_id: jnp.ndarray  # int32 scalar

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "MapState":
        return MapState(
            positions=jnp.zeros((capacity, 3), dtype),
            descriptors=jnp.zeros((capacity, 32), jnp.uint8),
            observations=jnp.zeros((capacity,), jnp.int32),
            ids=jnp.full((capacity,), -1, jnp.int32),
            valid=jnp.zeros((capacity,), bool),
            next_id=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]

    def size(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def map_insert(state: MapState, positions, descriptors, mask) -> MapState:
    """Scatter up to N new points into free slots (map.rs add_points, :31-37).

    positions [N,3], descriptors [N,32], mask [N] — only masked rows insert.
    If free slots run out, the overflow rows are dropped (the fixed-capacity
    analog of unbounded HashMap growth; size the capacity generously).
    """
    positions = jnp.asarray(positions, state.positions.dtype)
    descriptors = jnp.asarray(descriptors, jnp.uint8)
    mask = jnp.asarray(mask, bool)
    n = positions.shape[0]
    cap = state.capacity

    # Free slots in index order, WITHOUT a full sort (an argsort over the
    # capacity dominates per-keyframe cost inside the fused scan at 16k+
    # slots): rank every free slot by a cumsum and scatter its index into a
    # rank->slot table. Rows beyond the insert count never read past n-1
    # ranks, but building the full [C] table costs the same one scatter.
    free = ~state.valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # [C] rank of each free slot
    free_slots = (
        jnp.full((cap,), cap, jnp.int32)
        .at[jnp.where(free, free_rank, cap)]
        .set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    )
    n_free = cap - state.size()

    rank = (jnp.cumsum(mask.astype(jnp.int32)) - 1).astype(jnp.int32)  # insertion rank
    insert_ok = mask & (rank < n_free)
    # Park dropped rows at a scratch slot index == cap (scatter with
    # mode='drop' ignores them).
    slot = jnp.where(insert_ok, free_slots[jnp.clip(rank, 0, cap - 1)], cap).astype(jnp.int32)

    ids = state.next_id + rank.astype(jnp.int32)
    return MapState(
        positions=state.positions.at[slot].set(positions, mode="drop"),
        descriptors=state.descriptors.at[slot].set(descriptors, mode="drop"),
        observations=state.observations.at[slot].set(jnp.int32(1), mode="drop"),
        ids=state.ids.at[slot].set(ids, mode="drop"),
        valid=state.valid.at[slot].set(True, mode="drop"),
        # dtype pinned: under x64, jnp.sum(int32) promotes to int64 and the
        # widened next_id would poison every later ids scatter.
        next_id=state.next_id + jnp.sum(mask, dtype=jnp.int32),
    )


def map_find_matches(
    state: MapState,
    intrinsics: CameraIntrinsics,
    frame_descriptors,
    frame_mask,
    rotation,
    translation,
    ratio: float = 2.0,
    map_bits=None,
    map_pops=None,
    frame_xy=None,
):
    """Re-associate map points with current-frame features (map.rs:72-118).

    Projects every landmark with the current world-to-camera pose, keeps
    those in front of the camera and inside the rough bounds, Hamming-matches
    map->frame (query = map descriptors), applies the reference ratio filter.

    Returns (train_idx [C] int32 — matched keypoint per map slot,
    good [C] bool — slot matched). With frame_xy ([K, 2] keypoint pixels)
    also returns dist [C]: the pixel distance between each slot's projection
    and its matched keypoint (inf behind the camera) — the reprojection gate
    reuses THIS projection instead of projecting all C landmarks a second
    time (the fused pipeline's per-keyframe hot path).
    """
    # HIGHEST: landmark projection feeds the reproj-error observation gate;
    # TPU bf16-pass defaults cost ~0.4% relative -> several px at image scale
    # (and implicit defaults drift across libtpu builds, ops/epipolar.py:27-45).
    p_cam = jnp.einsum(
        "ij,nj->ni",
        jnp.asarray(rotation, state.positions.dtype),
        state.positions,
        precision=jax.lax.Precision.HIGHEST,
    )
    p_cam = p_cam + jnp.asarray(translation, state.positions.dtype)[None, :]
    z = p_cam[:, 2]
    z_safe = jnp.where(z > 0, z, 1.0)
    u = intrinsics.fx * (p_cam[:, 0] / z_safe) + intrinsics.cx
    v = intrinsics.fy * (p_cam[:, 1] / z_safe) + intrinsics.cy
    visible = state.valid & (z > 0.0) & (u >= 0.0) & (u < 4000.0) & (v >= 0.0) & (v < 3000.0)

    # Fused f32 matcher: the generic path materializes the [capacity, K]
    # distance matrix in f32, casts it to int32, masks it, then reduces —
    # four full passes over a 32 MB tensor per keyframe step at 16k
    # capacity. Distances are exact integers <= 256 in f32, so everything
    # the reference's filter needs (argmin, min, the max(ratio*min, 30)
    # threshold, map.rs:96-118) computes identically without the cast, and
    # XLA fuses mask+reduce into the matmul consumer.
    #
    # map_bits/map_pops: optional pre-unpacked map descriptor bits in the
    # ops/hamming.descriptor_bits layout. The fused pipeline carries them in
    # _FusedCarry and updates only the rows each insert touches
    # (pipeline/point_cloud.py kf_step); re-unpacking all 16k slots here
    # measured ~1.3 ms/keyframe on v5e. Stale bits in freed slots are
    # harmless: `visible` masks invalid slots out of the match.
    from ..ops.hamming import descriptor_bits

    if map_bits is None:
        q_bits, q_pop = descriptor_bits(state.descriptors)
    else:
        q_bits, q_pop = map_bits, map_pops
    t_bits, t_pop = descriptor_bits(jnp.asarray(frame_descriptors))
    dots = jax.lax.dot_general(
        q_bits, t_bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = q_pop[:, None] + t_pop[None, :] - 2.0 * dots  # [C, K] f32, exact ints
    big = jnp.float32(1 << 20)
    dist = jnp.where(jnp.asarray(frame_mask, bool)[None, :], dist, big)
    train_idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best = jnp.min(dist, axis=1)

    live = visible & jnp.asarray(frame_mask, bool)[train_idx]
    min_dist = jnp.min(jnp.where(live, best, big))
    threshold = jnp.maximum(ratio * min_dist, FeatureMatcher.DIST_FLOOR)
    good = live & (best < threshold)
    if frame_xy is None:
        return train_idx, good
    kp = jnp.asarray(frame_xy, state.positions.dtype)[train_idx]
    px_dist = jnp.hypot(u - kp[:, 0], v - kp[:, 1])
    px_dist = jnp.where(z > 1e-6, px_dist, jnp.inf)
    return train_idx, good, px_dist


def map_update_observations(state: MapState, matched_mask) -> MapState:
    """observations += 1 for matched slots (map.rs:121-127)."""
    inc = jnp.asarray(matched_mask, bool) & state.valid
    return state._replace(observations=state.observations + inc.astype(jnp.int32))


def map_prune(state: MapState, min_observations: int = 2) -> MapState:
    """Drop points with too few observations (map.rs:130-137). Returns the
    new state; the removed count is old_size - new_size."""
    keep = state.valid & (state.observations >= min_observations)
    return state._replace(valid=keep)


class Map:
    """Eager wrapper mirroring map.rs:17-160."""

    def __init__(self, intrinsics: CameraIntrinsics, capacity: int = 65536, min_observations: int = 2):
        self.intrinsics = intrinsics
        self.min_observations = min_observations
        self.state = MapState.empty(capacity)

    def add_points(self, points) -> None:
        """Accepts a list of MapPoint (eager) or a MapPoints batch."""
        if hasattr(points, "positions"):  # MapPoints SoA
            self.state = map_insert(self.state, points.positions, points.descriptors, points.valid)
            return
        if not points:
            return
        pos = np.stack([np.asarray(p.position) for p in points])
        desc = np.stack(
            [
                np.asarray(p.descriptor, np.uint8)
                if p.descriptor is not None
                else np.zeros(32, np.uint8)
                for p in points
            ]
        )
        self.state = map_insert(self.state, pos, desc, np.ones(len(points), bool))

    def find_matches(self, descriptors, pose, frame_mask=None, ratio: float = 2.0):
        """Returns a list of (map_id, keypoint_idx) like map.rs:72-118."""
        descriptors = jnp.asarray(descriptors, jnp.uint8)
        if frame_mask is None:
            frame_mask = jnp.ones((descriptors.shape[0],), bool)
        train_idx, good = map_find_matches(
            self.state, self.intrinsics, descriptors, frame_mask, pose[0], pose[1], ratio
        )
        good_np = np.asarray(good)
        ids = np.asarray(self.state.ids)
        tr = np.asarray(train_idx)
        return [(int(ids[i]), int(tr[i])) for i in np.nonzero(good_np)[0]]

    def update_observations(self, matches) -> None:
        """matches: list of (map_id, kp_idx) from find_matches."""
        ids = np.asarray(self.state.ids)
        mask = np.isin(ids, [m[0] for m in matches]) & np.asarray(self.state.valid)
        self.state = map_update_observations(self.state, jnp.asarray(mask))

    def prune_outliers(self) -> int:
        before = int(self.state.size())
        self.state = map_prune(self.state, self.min_observations)
        return before - int(self.state.size())

    def stable_points(self):
        obs = np.asarray(self.state.observations)
        valid = np.asarray(self.state.valid)
        keep = valid & (obs >= self.min_observations)
        return self._to_points(keep)

    def points(self):
        return self._to_points(np.asarray(self.state.valid))

    def _to_points(self, mask):
        pos = np.asarray(self.state.positions)
        desc = np.asarray(self.state.descriptors)
        obs = np.asarray(self.state.observations)
        ids = np.asarray(self.state.ids)
        return [
            MapPoint(position=pos[i], descriptor=desc[i], observations=int(obs[i]), id=int(ids[i]))
            for i in np.nonzero(mask)[0]
        ]

    def size(self) -> int:
        return int(self.state.size())

    def clear(self) -> None:
        self.state = MapState.empty(self.state.capacity)
