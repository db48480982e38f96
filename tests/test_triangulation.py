"""Triangulator vs reference semantics (triangulation.rs:298-354) + cv2 oracle."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from slamtpu import CameraIntrinsics, Triangulator
from slamtpu.mapping.triangulation import MapPoint, triangulate_points


@pytest.fixture
def cam():
    return CameraIntrinsics.webcam_vga()


def two_poses():
    r1, t1 = np.eye(3), np.zeros(3)
    r2 = Rotation.from_rotvec([0.0, 0.05, 0.0]).as_matrix()
    t2 = np.array([-0.5, 0.0, 0.02])
    return (r1, t1), (r2, t2)


def project(cam, pose, pts):
    p = pts @ pose[0].T + pose[1]
    return np.stack([cam.fx * p[:, 0] / p[:, 2] + cam.cx, cam.fy * p[:, 1] / p[:, 2] + cam.cy], 1)


def test_map_point_invariants():
    mp = MapPoint(position=np.zeros(3), id=7)
    assert mp.observations == 1 and mp.id == 7 and mp.descriptor is None
    mp.add_observation()
    assert mp.observations == 2


def test_builder_setters(cam):
    tri = Triangulator(cam).with_min_parallax(2.5).with_max_reproj_error(1.5)
    assert tri.min_parallax_deg == 2.5 and tri.max_reproj_error == 1.5


def test_empty_and_mismatched_inputs(cam):
    tri = Triangulator(cam)
    pose1, pose2 = two_poses()
    assert tri.triangulate(pose1, pose2, np.zeros((0, 2)), np.zeros((0, 2))) == []
    with pytest.raises(ValueError):
        tri.triangulate(pose1, pose2, np.zeros((3, 2)), np.zeros((4, 2)))


def test_synthetic_fixture_recovers_points(cam, rng):
    # Reference fixture: known 3D points, two poses, depths in (5, 15).
    pts3d = np.stack(
        [rng.uniform(-3, 3, 50), rng.uniform(-2, 2, 50), rng.uniform(5.0, 15.0, 50)], 1
    )
    pose1, pose2 = two_poses()
    p1 = project(cam, pose1, pts3d)
    p2 = project(cam, pose2, pts3d)
    xyz, valid = triangulate_points(cam, pose1, pose2, jnp.asarray(p1), jnp.asarray(p2))
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(xyz), pts3d, atol=1e-5)
    assert np.all(np.asarray(xyz)[:, 2] > 5 - 1e-6) and np.all(np.asarray(xyz)[:, 2] < 15 + 1e-6)


def test_matches_cv2_triangulate_points(cam, rng):
    pts3d = np.stack(
        [rng.uniform(-3, 3, 30), rng.uniform(-2, 2, 30), rng.uniform(4.0, 20.0, 30)], 1
    )
    pose1, pose2 = two_poses()
    p1 = project(cam, pose1, pts3d) + rng.normal(scale=0.2, size=(30, 2))
    p2 = project(cam, pose2, pts3d) + rng.normal(scale=0.2, size=(30, 2))

    k = np.asarray(cam.to_matrix(jnp.float64))
    proj1 = k @ np.hstack([pose1[0], pose1[1][:, None]])
    proj2 = k @ np.hstack([pose2[0], pose2[1][:, None]])
    hom = cv2.triangulatePoints(proj1, proj2, p1.T, p2.T)
    oracle = (hom[:3] / hom[3]).T

    xyz, valid = triangulate_points(cam, pose1, pose2, jnp.asarray(p1), jnp.asarray(p2))
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(xyz), oracle, atol=5e-3)


def test_cheirality_mask(cam):
    pose1, pose2 = two_poses()
    pts3d = np.array([[0.5, 0.2, 8.0]])
    p1 = project(cam, pose1, pts3d)
    p2 = project(cam, pose2, pts3d)
    _, valid_good = triangulate_points(cam, pose1, pose2, jnp.asarray(p1), jnp.asarray(p2))
    assert bool(valid_good[0])
    # Observations of a point physically BEHIND both cameras (the pinhole
    # model happily produces pixels for z < 0): the DLT recovers the true
    # behind-camera point and the cheirality mask must reject it.
    pts_behind = np.array([[0.3, 0.1, -8.0]])
    p1b = project(cam, pose1, pts_behind)
    p2b = project(cam, pose2, pts_behind)
    _, valid_bad = triangulate_points(cam, pose1, pose2, jnp.asarray(p1b), jnp.asarray(p2b))
    assert not bool(valid_bad[0])


def test_reproj_enforcement_kills_outliers(cam, rng):
    pts3d = np.stack(
        [rng.uniform(-3, 3, 20), rng.uniform(-2, 2, 20), rng.uniform(5.0, 15.0, 20)], 1
    )
    pose1, pose2 = two_poses()
    p1 = project(cam, pose1, pts3d)
    p2 = project(cam, pose2, pts3d)
    p2[:5] += 40.0  # corrupt five correspondences
    tri = Triangulator(cam).with_enforcement(parallax=False, reproj=True)
    batch = tri.triangulate_batch(pose1, pose2, jnp.asarray(p1), jnp.asarray(p2))
    valid = np.asarray(batch.valid)
    assert valid[5:].all()
    assert not valid[:5].any()


def test_descriptor_attachment(cam, rng):
    pts3d = np.stack([rng.uniform(-2, 2, 10), rng.uniform(-1, 1, 10), rng.uniform(5, 10, 10)], 1)
    pose1, pose2 = two_poses()
    desc = rng.integers(0, 256, size=(10, 32), dtype=np.uint8)
    pts = Triangulator(cam).triangulate(
        pose1, pose2, project(cam, pose1, pts3d), project(cam, pose2, pts3d), descriptors=desc
    )
    assert len(pts) == 10
    for i, mp in enumerate(pts):
        np.testing.assert_array_equal(mp.descriptor, desc[i])
