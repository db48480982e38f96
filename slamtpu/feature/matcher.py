"""Feature matcher — brute-force Hamming with the reference's match filter.

TPU-native counterpart of /root/reference/src/feature/matcher.rs. Matches are
a fixed-size struct-of-arrays with a validity mask instead of a Vec<DMatch>:
under jit every query keeps a slot, and `filter_good_matches` tightens the
mask rather than shrinking the array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.hamming import hamming_matrix_from_bits, match_best

__all__ = ["Matches", "FeatureMatcher"]


class Matches(NamedTuple):
    """Struct-of-arrays match set. query_idx is implicit (= arange)."""

    train_idx: jnp.ndarray  # [N] int32
    distance: jnp.ndarray  # [N] int32
    mask: jnp.ndarray  # [N] bool — True where the match slot is live

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))


class FeatureMatcher:
    """Brute-force Hamming matcher, crossCheck=false (matcher.rs:12-22)."""

    DIST_FLOOR = 30.0  # matcher.rs:57: max(ratio*min_dist, 30.0)

    def match_descriptors(self, query_packed, train_packed, query_mask=None, train_mask=None) -> Matches:
        """Best train match per query descriptor (matcher.rs:24-37).

        query_packed [N,32] uint8, train_packed [M,32] uint8. Optional masks
        mark live rows (static-shape replacement for variable-length
        descriptor sets); matches from/to dead rows are masked out.
        """
        query_packed = jnp.asarray(query_packed)
        train_packed = jnp.asarray(train_packed)
        n, m = query_packed.shape[0], train_packed.shape[0]
        if n == 0 or m == 0:
            # Empty-input → empty result (matcher.rs:29-31).
            return Matches(
                jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), bool),
            )
        if train_mask is not None:
            # Dead train rows must never win: overwrite with all-ones bytes is
            # not enough (a query could be all-ones too), so add the mask into
            # the distance domain instead.
            idx, dist = self._match_with_train_mask(query_packed, train_packed, train_mask)
        else:
            idx, dist = match_best(query_packed, train_packed)
        mask = jnp.ones((n,), bool)
        if query_mask is not None:
            mask = mask & jnp.asarray(query_mask, bool)
        if train_mask is not None:
            mask = mask & jnp.asarray(train_mask, bool)[idx]
        return Matches(idx, dist, mask)

    @staticmethod
    def _match_with_train_mask(query_packed, train_packed, train_mask):
        from ..ops.hamming import hamming_matrix

        dist = hamming_matrix(query_packed, train_packed)
        big = jnp.int32(1 << 20)
        dist = jnp.where(jnp.asarray(train_mask, bool)[None, :], dist, big)
        idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
        return idx, jnp.min(dist, axis=1)

    def match_from_bits(self, q_bits, q_pop, q_mask, t_bits, t_pop, t_mask) -> Matches:
        """match_descriptors on pre-unpacked bits (see ops.hamming
        descriptor_bits) — the fast path for pipelines that match every
        frame against a neighbor and would otherwise unpack twice per pair."""
        dist = hamming_matrix_from_bits(q_bits, q_pop, t_bits, t_pop)
        big = jnp.int32(1 << 20)
        if t_mask is not None:
            dist = jnp.where(jnp.asarray(t_mask, bool)[None, :], dist, big)
        idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
        best = jnp.min(dist, axis=1)
        mask = jnp.ones(q_bits.shape[:1], bool)
        if q_mask is not None:
            mask = mask & jnp.asarray(q_mask, bool)
        if t_mask is not None:
            mask = mask & jnp.asarray(t_mask, bool)[idx]
        return Matches(idx, best, mask)

    def filter_good_matches(self, matches: Matches, ratio: float = 2.0) -> Matches:
        """Keep matches with dist < max(ratio * min_dist, 30.0) (matcher.rs:39-66).

        All reference call sites pass ratio=2.0. min_dist is taken over live
        matches only; with no live matches the mask stays empty.
        """
        big = jnp.int32(1 << 20)
        live_dist = jnp.where(matches.mask, matches.distance, big)
        min_dist = jnp.min(live_dist).astype(jnp.float32)
        threshold = jnp.maximum(ratio * min_dist, self.DIST_FLOOR)
        good = matches.mask & (matches.distance.astype(jnp.float32) < threshold)
        return Matches(matches.train_idx, matches.distance, good)
