"""Trajectory evaluation metrics (the reference's unchecked TODO.md:90)."""

import numpy as np
import pytest

from slamtpu.utils.evaluate import align_umeyama, ate_rmse, kitti_relative_errors


def _random_rotation(rng):
    from scipy.spatial.transform import Rotation

    return Rotation.from_rotvec(rng.normal(size=3)).as_matrix()


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))
    r_true = _random_rotation(rng)
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    mapped = (s_true * (r_true @ pts.T)).T + t_true

    s, r, t = align_umeyama(pts, mapped, with_scale=True)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(r, r_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)

    # SE(3) mode pins scale at 1.
    s1, _, _ = align_umeyama(pts, (r_true @ pts.T).T + t_true, with_scale=False)
    assert s1 == 1.0


def test_ate_alignment_modes():
    rng = np.random.default_rng(1)
    gt = np.cumsum(rng.normal(size=(100, 3)), axis=0)
    r = _random_rotation(rng)
    est = (3.0 * (r @ gt.T)).T + np.array([5.0, 0.0, -2.0])

    assert ate_rmse(est, gt, align="sim3") < 1e-9
    assert ate_rmse(est, gt, align="se3") > 1.0  # scale not removable
    off = gt + np.array([1.0, 0.0, 0.0])
    assert abs(ate_rmse(off, gt, align="none") - 1.0) < 1e-12
    with pytest.raises(ValueError):
        ate_rmse(est, gt, align="bogus")


def _straight_poses(n, step=1.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 2, 3] = step * np.arange(n)  # +z forward, 1 m per frame
    return poses


def test_kitti_errors_zero_on_exact():
    gt = _straight_poses(1000)
    err = kitti_relative_errors(gt, gt)
    assert err.n_segments > 100
    assert err.t_rel < 1e-12 and err.r_rel < 1e-9


def test_kitti_translational_drift():
    gt = _straight_poses(1000)
    est = gt.copy()
    est[:, 2, 3] *= 1.05  # 5% scale drift
    err = kitti_relative_errors(est, gt)
    assert abs(err.t_rel - 0.05) < 1e-3
    assert err.t_rel_percent == pytest.approx(100 * err.t_rel)


def test_kitti_rotational_drift():
    from scipy.spatial.transform import Rotation

    gt = _straight_poses(1000)
    c = np.radians(0.01)  # 0.01 deg/m yaw drift
    est = gt.copy()
    for i in range(1000):
        est[i, :3, :3] = Rotation.from_euler("y", c * i).as_matrix()
    err = kitti_relative_errors(est, gt)
    assert abs(err.r_rel - c) < 0.1 * c
    assert err.r_rel_deg_per_100m == pytest.approx(1.0, rel=0.1)


def test_kitti_too_short_path():
    gt = _straight_poses(50)  # 49 m of path: no 100 m segment exists
    err = kitti_relative_errors(gt, gt)
    assert err.n_segments == 0 and np.isnan(err.t_rel)
