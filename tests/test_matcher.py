"""Hamming matcher kernel vs cv2 BFMatcher oracle (matcher.rs semantics)."""

import cv2
import jax.numpy as jnp
import numpy as np

from slamtpu import FeatureMatcher
from slamtpu.ops import hamming


def _random_desc(rng, n):
    return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)


def test_pack_unpack_roundtrip(rng):
    d = _random_desc(rng, 17)
    bits = hamming.unpack_bits(jnp.asarray(d))
    assert bits.shape == (17, 256)
    back = np.asarray(hamming.pack_bits(bits))
    np.testing.assert_array_equal(back, d)


def test_hamming_matrix_matches_numpy_popcount(rng):
    a, b = _random_desc(rng, 64), _random_desc(rng, 96)
    ours = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    xored = a[:, None, :] ^ b[None, :, :]
    oracle = np.unpackbits(xored, axis=-1).sum(-1)
    np.testing.assert_array_equal(ours, oracle)
    ours_pop = np.asarray(hamming.hamming_matrix_popcount(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(ours_pop, oracle)


def test_match_best_matches_cv2_bfmatcher(rng):
    a, b = _random_desc(rng, 200), _random_desc(rng, 300)
    idx, dist = hamming.match_best(jnp.asarray(a), jnp.asarray(b))

    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    matches = bf.match(a, b)
    matches = sorted(matches, key=lambda m: m.queryIdx)
    cv_dist = np.array([m.distance for m in matches])
    np.testing.assert_array_equal(np.asarray(dist), cv_dist)
    # Indices may differ only where distances tie; verify distances at our
    # chosen indices equal the optimum.
    d_at_idx = np.array([np.unpackbits(a[i] ^ b[j]).sum() for i, j in enumerate(np.asarray(idx))])
    np.testing.assert_array_equal(d_at_idx, cv_dist)


def test_match_top2(rng):
    a, b = _random_desc(rng, 50), _random_desc(rng, 80)
    idx, best, second = hamming.match_top2(jnp.asarray(a), jnp.asarray(b))
    full = np.unpackbits(a[:, None, :] ^ b[None, :, :], axis=-1).sum(-1)
    srt = np.sort(full, axis=1)
    np.testing.assert_array_equal(np.asarray(best), srt[:, 0])
    np.testing.assert_array_equal(np.asarray(second), srt[:, 1])
    np.testing.assert_array_equal(np.asarray(best), full[np.arange(50), np.asarray(idx)])


def test_filter_good_matches_semantics(rng):
    """filter keeps dist < max(ratio*min_dist, 30) (matcher.rs:39-66)."""
    a, b = _random_desc(rng, 120), _random_desc(rng, 150)
    m = FeatureMatcher()
    matches = m.match_descriptors(jnp.asarray(a), jnp.asarray(b))
    good = m.filter_good_matches(matches, ratio=2.0)

    dist = np.asarray(matches.distance)
    threshold = max(2.0 * dist.min(), 30.0)
    np.testing.assert_array_equal(np.asarray(good.mask), dist < threshold)


def test_empty_inputs():
    m = FeatureMatcher()
    empty = np.zeros((0, 32), np.uint8)
    full = np.ones((5, 32), np.uint8)
    for q, t in [(empty, full), (full, empty), (empty, empty)]:
        out = m.match_descriptors(jnp.asarray(q), jnp.asarray(t))
        assert int(out.count()) == 0


def test_train_mask_excludes_dead_rows(rng):
    a = _random_desc(rng, 20)
    b = np.vstack([a, _random_desc(rng, 10)])  # first 20 rows are exact matches
    mask = np.zeros(30, bool)
    mask[20:] = True  # kill the exact matches
    m = FeatureMatcher()
    out = m.match_descriptors(jnp.asarray(a), jnp.asarray(b), train_mask=jnp.asarray(mask))
    assert np.all(np.asarray(out.train_idx) >= 20)
