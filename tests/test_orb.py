"""ORB detector vs cv2 oracle: FAST positions, detector overlap, match-level
fidelity (SURVEY.md §7: compare at the match/pose level, not bit-level)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from slamtpu import FeatureMatcher, OrbDetector
from slamtpu.feature.detector import OrbConfig, features_per_level
from slamtpu.ops.fast import fast_score, nms3x3


def texture(rng, h=240, w=320):
    """Synthetic textured scene: smoothed noise + blobs, uint8."""
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 2.5)
    for _ in range(40):
        x, y = rng.integers(20, w - 20), rng.integers(20, h - 20)
        r = int(rng.integers(3, 10))
        cv2.circle(img, (int(x), int(y)), r, float(rng.uniform(0, 255)), -1)
    img = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX)
    return img.astype(np.uint8)


def test_features_per_level_sums_to_budget():
    for n in (100, 500, 1000, 3000):
        quotas = features_per_level(n, 8, 1.2)
        assert sum(quotas) == n
        assert all(q >= 0 for q in quotas)
        assert quotas[0] > quotas[1] > quotas[-2]


def test_blank_image_no_keypoints():
    # detector.rs:52-60: blank image -> 0 keypoints.
    det = OrbDetector(200)
    feats = det.detect_and_compute(np.zeros((128, 160), np.uint8))
    assert int(feats.count()) == 0


def test_fast_positions_match_cv2(rng):
    img = texture(rng)
    score = np.asarray(nms3x3(fast_score(jnp.asarray(img, jnp.float32)[None], 20.0))[0])
    ours = np.argwhere(score > 0)  # (y, x)

    fast = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = fast.detect(img, None)
    theirs = np.array([[kp.pt[1], kp.pt[0]] for kp in kps])

    # Interior only (cv2 handles borders differently).
    inner = lambda a: a[
        (a[:, 0] > 5) & (a[:, 0] < img.shape[0] - 5) & (a[:, 1] > 5) & (a[:, 1] < img.shape[1] - 5)
    ]
    ours_i, theirs_i = inner(ours), inner(theirs)
    assert len(theirs_i) > 100  # texture produces plenty of corners

    # Each cv2 corner should have one of ours within 1px (NMS tie-breaks can
    # shift by a pixel), and vice versa, for the vast majority.
    def coverage(a, b):
        d = np.abs(a[:, None, :] - b[None, :, :]).max(-1).min(1)
        return (d <= 1).mean()

    assert coverage(theirs_i, ours_i) > 0.9
    assert coverage(ours_i, theirs_i) > 0.9


def test_orb_keypoints_overlap_cv2(rng):
    img = texture(rng)
    det = OrbDetector(300)
    feats = det.detect_and_compute(img)
    live = np.asarray(feats.mask)
    ours = np.asarray(feats.xy)[live]
    assert live.sum() > 150

    orb = cv2.ORB_create(nfeatures=300)
    kps = orb.detect(img, None)
    theirs = np.array([kp.pt for kp in kps])

    d = np.linalg.norm(ours[:, None, :] - theirs[None, :, :], axis=-1).min(1)
    # Majority of our keypoints sit on (or within 2px of) a cv2 ORB keypoint.
    assert (d <= 2.0).mean() > 0.5


def test_descriptor_shape_and_mask_invariant(rng):
    img = texture(rng)
    feats = OrbDetector(250).detect_and_compute(img)
    assert feats.descriptors.shape == (250, 32)
    assert feats.descriptors.dtype == jnp.uint8
    assert feats.xy.shape == (250, 2)
    # Live keypoints stay inside the border margin.
    live = np.asarray(feats.mask)
    xy = np.asarray(feats.xy)[live]
    oct_ = np.asarray(feats.octave)[live]
    assert np.all(oct_ >= 0) and np.all(oct_ < 8)
    assert np.all(xy[:, 0] >= 0) and np.all(xy[:, 0] < img.shape[1])


def test_match_level_shift_recovery(rng):
    """Full ORB+matcher on a shifted pair recovers the shift."""
    shift = 12
    base = texture(rng, 256, 352)
    img1, img2 = base[:, :-shift], base[:, shift:]
    det = OrbDetector(400)
    f1 = det.detect_and_compute(img1)
    f2 = det.detect_and_compute(img2)

    m = FeatureMatcher()
    matches = m.filter_good_matches(m.match_descriptors(f1.descriptors, f2.descriptors, f1.mask, f2.mask))
    assert int(matches.count()) > 80

    live = np.asarray(matches.mask)
    p1 = np.asarray(f1.xy)[live]
    p2 = np.asarray(f2.xy)[np.asarray(matches.train_idx)[live]]
    disp = p2 - p1
    med = np.median(disp, axis=0)
    np.testing.assert_allclose(med, [-shift, 0.0], atol=0.75)
    # Most matches agree with the global shift (inlier behavior).
    inlier = (np.abs(disp - [-shift, 0]).max(1) <= 2).mean()
    assert inlier > 0.7


def test_rotation_steering(rng):
    """rBRIEF steering: matches survive a 30-degree in-plane rotation."""
    base = texture(rng, 300, 300)
    center = (150, 150)
    rot = cv2.getRotationMatrix2D(center, 30, 1.0)
    rotated = cv2.warpAffine(base, rot, (300, 300))

    det = OrbDetector(400)
    f1 = det.detect_and_compute(base)
    f2 = det.detect_and_compute(rotated)
    m = FeatureMatcher()
    matches = m.filter_good_matches(m.match_descriptors(f1.descriptors, f2.descriptors, f1.mask, f2.mask))

    live = np.asarray(matches.mask)
    p1 = np.asarray(f1.xy)[live]
    p2 = np.asarray(f2.xy)[np.asarray(matches.train_idx)[live]]
    # Matches should follow the known rotation.
    p1h = np.concatenate([p1, np.ones((len(p1), 1))], axis=1)
    pred = p1h @ rot.T
    err = np.linalg.norm(pred - p2, axis=1)
    consistent = (err < 3.0).mean()
    assert len(p1) > 40
    assert consistent > 0.5, f"only {consistent:.0%} of {len(p1)} matches follow the rotation"


def test_batched_detection_consistent(rng):
    imgs = np.stack([texture(rng), texture(rng)])
    det = OrbDetector(200)
    batch = det.detect_and_compute(imgs)
    solo0 = det.detect_and_compute(imgs[0])
    np.testing.assert_allclose(np.asarray(batch.xy[0]), np.asarray(solo0.xy))
    np.testing.assert_array_equal(np.asarray(batch.descriptors[0]), np.asarray(solo0.descriptors))
