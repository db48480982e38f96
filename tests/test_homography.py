"""Homography fitting/decomposition vs cv2 oracle; planar-scene rescue."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from slamtpu import CameraIntrinsics
from slamtpu.odometry.pose import estimate_relative_pose
from slamtpu.ops.homography import (
    decompose_homography,
    four_point_homography,
    homography_transfer_error,
    ransac_homography,
    recover_pose_from_homography,
)
from slamtpu.ops.ransac import RansacConfig


def planar_scene(rng, n=150, rotvec=(0.03, -0.02, 0.01), tvec=(0.4, 0.05, 0.1),
                 normal=(0.1, -0.2, 1.0), d=6.0, noise=0.0):
    """Points on the plane n.x = d; two calibrated views (p2 = R p1 + t)."""
    cam = CameraIntrinsics.webcam_vga()
    nrm = np.asarray(normal, float)
    nrm = nrm / np.linalg.norm(nrm)
    # Sample points on the plane within the view frustum.
    xy = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n)], 1)
    z = (d - xy @ nrm[:2]) / nrm[2]
    pts = np.concatenate([xy, z[:, None]], 1)
    r = Rotation.from_rotvec(rotvec).as_matrix()
    t = np.asarray(tvec, float)
    p1, p2 = pts, pts @ r.T + t
    n1 = (p1[:, :2] / p1[:, 2:3])
    n2 = (p2[:, :2] / p2[:, 2:3])
    if noise:
        n1 = n1 + rng.normal(scale=noise / cam.fx, size=n1.shape)
        n2 = n2 + rng.normal(scale=noise / cam.fx, size=n2.shape)
    h_true = r + np.outer(t, nrm) / d  # x2 ~ H x1 in normalized coords
    return cam, n1, n2, r, t, nrm, d, h_true


def test_four_point_exact(rng):
    _, n1, n2, _, _, _, _, h_true = planar_scene(rng, n=20)
    h = np.asarray(four_point_homography(jnp.asarray(n1), jnp.asarray(n2)))
    h = h / np.linalg.norm(h)
    ht = h_true / np.linalg.norm(h_true)
    if np.sum(h * ht) < 0:
        h = -h
    np.testing.assert_allclose(h, ht, atol=1e-7)
    err = np.asarray(homography_transfer_error(jnp.asarray(h_true), jnp.asarray(n1), jnp.asarray(n2)))
    assert err.max() < 1e-12


def test_matches_cv2_find_homography(rng):
    _, n1, n2, _, _, _, _, _ = planar_scene(rng, n=60, noise=0.3)
    ours = np.asarray(four_point_homography(jnp.asarray(n1), jnp.asarray(n2)))
    oracle, _ = cv2.findHomography(n1, n2, 0)  # least squares
    ours = ours / ours[2, 2]
    oracle = oracle / oracle[2, 2]
    np.testing.assert_allclose(ours, oracle, atol=2e-3)


def test_decompose_recovers_truth(rng):
    _, n1, n2, r, t, nrm, d, h_true = planar_scene(rng)
    rs, ts, ns = decompose_homography(jnp.asarray(h_true))
    rs, ts, ns = np.asarray(rs), np.asarray(ts), np.asarray(ns)
    rot_errs = [
        np.degrees(np.linalg.norm(Rotation.from_matrix(rs[i] @ r.T).as_rotvec()))
        for i in range(4)
    ]
    i = int(np.argmin(rot_errs))
    assert rot_errs[i] < 0.01, rot_errs
    # t is recovered up to the 1/d scale; compare directions.
    cos_t = np.dot(ts[i], t) / (np.linalg.norm(ts[i]) * np.linalg.norm(t))
    assert cos_t > 0.9999
    cos_n = abs(np.dot(ns[i], nrm))
    assert cos_n > 0.9999


def test_decompose_candidates_match_cv2(rng):
    _, _, _, r, t, nrm, d, h_true = planar_scene(rng)
    k = np.eye(3)
    n_sol, rs_cv, ts_cv, ns_cv = cv2.decomposeHomographyMat(h_true, k)
    rs, ts, ns = (np.asarray(v) for v in decompose_homography(jnp.asarray(h_true)))
    # Every cv2 rotation candidate appears in ours (up to ordering).
    for rc in rs_cv:
        errs = [np.linalg.norm(rs[i] - rc) for i in range(4)]
        assert min(errs) < 1e-4, f"cv2 candidate missing: {min(errs)}"


def test_recover_pose_cheirality(rng):
    _, n1, n2, r, t, nrm, _, h_true = planar_scene(rng)
    r_best, t_best, votes = recover_pose_from_homography(
        jnp.asarray(h_true), jnp.asarray(n1), jnp.asarray(n2)
    )
    rot_err = np.degrees(np.linalg.norm(Rotation.from_matrix(np.asarray(r_best) @ r.T).as_rotvec()))
    assert rot_err < 0.01
    cos_t = np.dot(np.asarray(t_best), t) / np.linalg.norm(t)
    assert cos_t > 0.999


def test_ransac_homography_with_outliers(rng):
    _, n1, n2, _, _, _, _, _ = planar_scene(rng, n=200, noise=0.3)
    n2c = n2.copy()
    n2c[:50] = rng.uniform(-0.5, 0.5, size=(50, 2))
    h, inliers, count = ransac_homography(
        jax.random.PRNGKey(0), jnp.asarray(n1), jnp.asarray(n2c), threshold_norm=1.5 / 500.0
    )
    inl = np.asarray(inliers)
    assert inl[50:].mean() > 0.9
    assert inl[:50].mean() < 0.1


def test_planar_scene_rescued_by_fallback(rng):
    """On a pure plane the 8-point path is degenerate; the homography
    fallback must recover an accurate pose."""
    cam, n1, n2, r, t, _, _, _ = planar_scene(rng, n=200, noise=0.3)
    pix1 = np.asarray(cam.project(jnp.concatenate([jnp.asarray(n1), jnp.ones((200, 1))], 1) * 5.0))
    pix2 = np.asarray(cam.project(jnp.concatenate([jnp.asarray(n2), jnp.ones((200, 1))], 1) * 5.0))

    cfg = RansacConfig(iters=300, homography_fallback=True)
    pose = estimate_relative_pose(jax.random.PRNGKey(1), cam, jnp.asarray(pix1), jnp.asarray(pix2), config=cfg)
    assert bool(pose.valid)
    rot_err = np.degrees(
        np.linalg.norm(Rotation.from_matrix(np.asarray(pose.rotation) @ r.T).as_rotvec())
    )
    cos_t = abs(np.dot(np.asarray(pose.translation), t)) / np.linalg.norm(t)
    assert rot_err < 1.0, f"rot err {rot_err:.2f} deg"
    assert cos_t > 0.95, f"t alignment {cos_t:.3f}"


def test_nonplanar_scene_keeps_essential(rng):
    """General 3D scenes must still route through the essential path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pose import make_scene, rot_err_deg

    cam, pix1, pix2, r, t = make_scene(rng, n=200, noise=0.3)
    cfg = RansacConfig(iters=300, homography_fallback=True)
    pose = estimate_relative_pose(jax.random.PRNGKey(2), cam, jnp.asarray(pix1), jnp.asarray(pix2), config=cfg)
    assert bool(pose.valid)
    assert rot_err_deg(np.asarray(pose.rotation), r) < 0.5
