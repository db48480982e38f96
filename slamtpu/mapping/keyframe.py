"""Keyframe selection.

TPU-native counterpart of /root/reference/src/mapping/keyframe.rs. The
decision rule (keyframe.rs:50-88): a frame is a keyframe iff
  frames_since_last + 1 >= max_frames
  OR ||t|| >= min_translation
  OR rotation angle >= min_rotation
  OR (last_keyframe_matches > 0 AND num_matches / last_keyframe_matches < min_match_ratio)
evaluated in that order with short-circuiting; under jit all predicates are
evaluated and OR-ed, which is equivalent.

Two interfaces:
  * `KeyframeSelector` — stateful, frame-at-a-time, mirroring the Rust API.
  * `keyframe_step` — pure (state, inputs) -> (state, bool) step for
    `lax.scan` over a whole clip; `select_keyframes` scans it over [T] inputs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.lie import rotation_angle

__all__ = ["KeyframeConfig", "KeyframeSelector", "KeyframeState", "keyframe_step", "select_keyframes"]


@dataclasses.dataclass(frozen=True)
class KeyframeConfig:
    """Thresholds; defaults mirror keyframe.rs:16-25. The point_cloud example
    overrides to (0.03, 0.03, 0.7, 3) (/root/reference/examples/point_cloud.rs:113-119)."""

    min_translation: float = 0.1
    min_rotation: float = 0.1
    min_match_ratio: float = 0.8
    max_frames: int = 10


class KeyframeState(NamedTuple):
    """Scan-carried selector state (keyframe.rs:28-32)."""

    frames_since_last: jnp.ndarray  # int32 scalar
    last_keyframe_matches: jnp.ndarray  # int32 scalar

    @staticmethod
    def initial(dtype=jnp.int32) -> "KeyframeState":
        zero = jnp.zeros((), dtype=dtype)
        return KeyframeState(zero, zero)


def keyframe_step(config: KeyframeConfig, state: KeyframeState, rotation, translation, num_matches):
    """One selection step. Returns (new_state, is_keyframe: bool scalar).

    Pure function of (config, state, inputs); suitable as a `lax.scan` body.
    """
    frames = state.frames_since_last + 1

    force = frames >= config.max_frames
    trans = jnp.linalg.norm(translation) >= config.min_translation
    rot = rotation_angle(rotation) >= config.min_rotation
    have_prev = state.last_keyframe_matches > 0
    ratio = num_matches.astype(jnp.float32) / jnp.maximum(
        state.last_keyframe_matches.astype(jnp.float32), 1.0
    )
    degraded = have_prev & (ratio < config.min_match_ratio)

    is_kf = force | trans | rot | degraded
    new_state = KeyframeState(
        frames_since_last=jnp.where(is_kf, 0, frames).astype(state.frames_since_last.dtype),
        last_keyframe_matches=jnp.where(
            is_kf, num_matches.astype(state.last_keyframe_matches.dtype), state.last_keyframe_matches
        ),
    )
    return new_state, is_kf


def select_keyframes(config: KeyframeConfig, rotations, translations, num_matches, state=None):
    """Scan the selector over a clip.

    rotations [T,3,3], translations [T,3], num_matches [T] ->
    (final_state, is_keyframe [T] bool). The per-frame dependence is inherently
    serial (state resets on selection), so it runs as a `lax.scan`; everything
    around it stays batched.
    """
    if state is None:
        state = KeyframeState.initial()

    def body(carry, inputs):
        r, t, n = inputs
        return keyframe_step(config, carry, r, t, n)

    return jax.lax.scan(body, state, (rotations, translations, jnp.asarray(num_matches)))


class KeyframeSelector:
    """Stateful frame-at-a-time wrapper mirroring keyframe.rs:34-106."""

    def __init__(self, config: KeyframeConfig | None = None):
        self.config = config or KeyframeConfig()
        self._state = KeyframeState.initial()

    def should_be_keyframe(self, rotation, translation, num_matches: int) -> bool:
        new_state, is_kf = keyframe_step(
            self.config,
            self._state,
            jnp.asarray(rotation),
            jnp.asarray(translation),
            jnp.asarray(num_matches),
        )
        self._state = jax.tree_util.tree_map(lambda x: x, new_state)
        return bool(is_kf)

    def reset(self) -> None:
        self._state = KeyframeState.initial()

    def mark_as_keyframe(self, num_matches: int) -> None:
        self._state = KeyframeState(
            jnp.zeros((), jnp.int32), jnp.asarray(num_matches, jnp.int32)
        )

    @property
    def frames_since_last(self) -> int:
        return int(self._state.frames_since_last)
