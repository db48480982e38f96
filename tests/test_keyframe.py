"""KeyframeSelector vs reference unit tests (keyframe.rs:117-186) + scan path."""

import jax.numpy as jnp
import numpy as np

from slamtpu import KeyframeConfig, KeyframeSelector
from slamtpu.mapping.keyframe import select_keyframes


def _rotz(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def test_creation():
    sel = KeyframeSelector()
    assert sel.frames_since_last == 0


def test_force_keyframe_after_max_frames():
    sel = KeyframeSelector(KeyframeConfig(max_frames=5))
    r, t = np.eye(3), np.zeros(3)
    for i in range(4):
        assert not sel.should_be_keyframe(r, t, 100), f"frame {i}"
    assert sel.should_be_keyframe(r, t, 100)


def test_keyframe_on_large_translation():
    sel = KeyframeSelector()
    assert sel.should_be_keyframe(np.eye(3), np.array([0.2, 0.0, 0.0]), 100)


def test_keyframe_on_large_rotation():
    sel = KeyframeSelector()
    assert sel.should_be_keyframe(_rotz(0.15), np.zeros(3), 100)


def test_no_keyframe_small_motion():
    sel = KeyframeSelector()
    sel.mark_as_keyframe(100)
    assert not sel.should_be_keyframe(np.eye(3), np.array([0.01, 0.0, 0.0]), 95)


def test_match_degradation_triggers():
    sel = KeyframeSelector()
    sel.mark_as_keyframe(100)
    # ratio 0.5 < 0.8 default -> keyframe.
    assert sel.should_be_keyframe(np.eye(3), np.zeros(3), 50)


def test_scan_matches_stateful():
    """select_keyframes scan == frame-at-a-time selector over a mixed clip."""
    cfg = KeyframeConfig(max_frames=4)
    rng = np.random.default_rng(1)
    T = 40
    rots = np.stack([_rotz(a) for a in rng.uniform(0, 0.15, size=T)])
    trans = rng.uniform(0, 0.15, size=(T, 3)) * rng.integers(0, 2, size=(T, 1))
    matches = rng.integers(40, 120, size=T)

    sel = KeyframeSelector(cfg)
    expected = [sel.should_be_keyframe(r, t, int(n)) for r, t, n in zip(rots, trans, matches)]

    _, flags = select_keyframes(
        cfg, jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(matches)
    )
    np.testing.assert_array_equal(np.asarray(flags), expected)
