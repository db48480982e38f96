"""Trajectory vs reference unit tests (trajectory.rs:139-191) + scan path."""

import json

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from slamtpu import Trajectory
from slamtpu.odometry.trajectory import (
    compose_relative_transforms,
    positions_from_relative,
)
from slamtpu.ops.lie import se3_matrix


def test_initial_origin_point():
    traj = Trajectory()
    assert len(traj) == 1
    assert traj.points[0].frame == 0
    assert traj.points[0].position == [0.0, 0.0, 0.0]


def test_update_position():
    traj = Trajectory()
    traj.update(np.eye(3), [1.0, 0.0, 0.0], frame=1, timestamp=0.1)
    assert len(traj) == 2
    assert traj.points[1].frame == 1
    assert abs(traj.points[1].position[0] - 1.0) < 1e-6


def test_total_distance_3_4_5():
    traj = Trajectory()
    traj.update(np.eye(3), [3.0, 0.0, 0.0], 1, 0.1)
    traj.update(np.eye(3), [0.0, 4.0, 0.0], 2, 0.2)
    assert abs(traj.total_distance() - 7.0) < 1e-6


def test_json_export_contains_position():
    traj = Trajectory()
    traj.update(np.eye(3), [1.0, 2.0, 3.0], 1, 0.1)
    text = traj.to_json()
    assert "position" in text
    data = json.loads(text)
    assert data[1]["frame"] == 1
    np.testing.assert_allclose(data[1]["position"], [1.0, 2.0, 3.0])


def test_scan_matches_sequential_composition(rng):
    """associative_scan path == reference's serial T_global = T_global @ T_rel."""
    T = 50
    rots = Rotation.from_rotvec(rng.normal(size=(T, 3)) * 0.1).as_matrix()
    trans = rng.normal(size=(T, 3)) * 0.5

    # Serial host reference (exactly trajectory.rs:32-69 semantics).
    g = np.eye(4)
    serial = []
    for r, t in zip(rots, trans):
        rel = np.eye(4)
        rel[:3, :3] = r
        rel[:3, 3] = t
        g = g @ rel
        serial.append(g.copy())
    serial = np.stack(serial)

    scanned = np.asarray(
        compose_relative_transforms(se3_matrix(jnp.asarray(rots), jnp.asarray(trans)))
    )
    np.testing.assert_allclose(scanned, serial, atol=1e-10)

    positions = np.asarray(positions_from_relative(jnp.asarray(rots), jnp.asarray(trans)))
    assert positions.shape == (T + 1, 3)
    np.testing.assert_allclose(positions[0], 0.0)
    np.testing.assert_allclose(positions[1:], serial[:, :3, 3], atol=1e-10)


def test_extend_batch_matches_updates(rng):
    rots = Rotation.from_rotvec(rng.normal(size=(10, 3)) * 0.2).as_matrix()
    trans = rng.normal(size=(10, 3))

    a = Trajectory()
    for i, (r, t) in enumerate(zip(rots, trans)):
        a.update(r, t, i + 1, 0.1 * (i + 1))

    b = Trajectory()
    b.extend_batch(rots, trans, np.arange(1, 11), 0.1 * np.arange(1, 11))

    assert len(a) == len(b)
    np.testing.assert_allclose(
        [p.position for p in a.points], [p.position for p in b.points], atol=1e-9
    )
    np.testing.assert_allclose(a.global_pose, b.global_pose, atol=1e-9)
