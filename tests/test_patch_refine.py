"""SSD sub-pixel match refinement (ops/patch_refine.py) against a known
warp: a smooth textured image shifted by an exact sub-pixel displacement
must pull integer-quantized matches onto the true correspondence."""

import numpy as np
import pytest

from slamtpu.ops.patch_refine import refine_matches


def _smooth_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h, w))
    # Heavy low-pass so bilinear sub-pixel sampling is a faithful warp model
    # and the SSD surface is locally quadratic.
    for axis in (0, 1):
        k = np.ones(7) / 7.0
        img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), axis, img)
        img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), axis, img)
    return img.astype(np.float32)


def _shift_bilinear(img, dx, dy):
    """img2[y, x] = img[y - dy, x - dx] via bilinear interpolation: a feature
    at (x, y) in img appears at (x + dx, y + dy) in the output."""
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    xs = np.clip(xx - dx, 0, w - 1.001)
    ys = np.clip(yy - dy, 0, h - 1.001)
    x0, y0 = xs.astype(int), ys.astype(int)
    fx, fy = xs - x0, ys - y0
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    ).astype(np.float32)


@pytest.mark.parametrize("shift", [(0.3, -0.4), (1.2, 0.7)])
def test_recovers_known_subpixel_shift(shift):
    dx, dy = shift
    img1 = _smooth_image(96, 128)
    img2 = _shift_bilinear(img1, dx, dy)

    rng = np.random.default_rng(1)
    k = 40
    # Integer keypoints: the op anchors its template on round(p1) (ORB
    # keypoints are integer-grid at their level), so the oracle uses
    # integer queries to isolate the refinement error itself.
    p1 = np.round(
        np.stack([rng.uniform(20, 108, k), rng.uniform(20, 76, k)], axis=1)
    ).astype(np.float32)
    true_p2 = p1 + np.array([dx, dy], np.float32)
    # Integer-quantized, noisily matched positions (what ORB matching gives).
    p2 = np.round(true_p2 + rng.uniform(-0.6, 0.6, size=(k, 2))).astype(np.float32)

    refined = np.asarray(refine_matches(img1, img2, p1, p2, radius=4, search=2))
    err = np.linalg.norm(refined - true_p2, axis=1)
    start_err = np.linalg.norm(p2 - true_p2, axis=1)
    assert np.median(err) < 0.2, f"median err {np.median(err):.3f} px"
    assert np.median(err) < 0.5 * np.median(start_err)


def test_masked_matches_pass_through():
    img1 = _smooth_image(64, 64, seed=2)
    img2 = _shift_bilinear(img1, 0.5, 0.0)
    p1 = np.array([[30.0, 30.0], [40.0, 25.0]], np.float32)
    p2 = np.array([[31.0, 30.0], [40.0, 25.0]], np.float32)
    mask = np.array([True, False])
    refined = np.asarray(refine_matches(img1, img2, p1, p2, mask=mask))
    np.testing.assert_array_equal(refined[1], p2[1])  # dead slot untouched
    assert not np.allclose(refined[0], p2[0])  # live slot moved


def test_pipeline_with_refinement_enabled():
    """End-to-end flag path: VoConfig(refine_matches=True) threads previous
    frames through the chunked pipeline (pipeline/vo.py:138-148, including
    the padded-tail chunk) and must not hurt pose success on a clean scene."""
    from slamtpu.feature.detector import OrbConfig
    from slamtpu.io.synthetic import render_sequence_cached as render_sequence
    from slamtpu.odometry.camera import CameraIntrinsics
    from slamtpu.ops.ransac import RansacConfig
    from slamtpu.pipeline.vo import VoConfig, run_vo

    scene = render_sequence(
        n_frames=10, height=120, width=160, n_points=400, step=0.25,
        intrinsics=CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0),
        seed=9, noise=1.0,
    )
    base = VoConfig(orb=OrbConfig(max_features=128, n_levels=4),
                    ransac=RansacConfig(iters=128))
    import dataclasses

    refined_cfg = dataclasses.replace(base, refine_matches=True)
    plain = run_vo(scene.frames, scene.intrinsics, base, chunk_size=4, seed=0)
    refined = run_vo(scene.frames, scene.intrinsics, refined_cfg, chunk_size=4, seed=0)
    assert refined.successful_frames >= plain.successful_frames - 1
    assert refined.successful_frames >= 7


def test_flat_patch_keeps_integer_argmin():
    """A textureless region has a flat SSD surface (non-concave parabola
    stencil): the sub-pixel term must be suppressed, not extrapolated."""
    img = np.full((64, 64), 128.0, np.float32)
    p = np.array([[32.0, 32.0]], np.float32)
    refined = np.asarray(refine_matches(img, img, p, p))
    np.testing.assert_allclose(refined, p, atol=1e-6)
