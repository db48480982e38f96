"""Bundle adjustment vs reference tests (bundle_adjustment.rs:404-455), the
synthetic example (examples/bundle_adjustment.rs), and a scipy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import least_squares
from scipy.spatial.transform import Rotation

from slamtpu import BundleAdjuster, CameraIntrinsics, Observation
from slamtpu.mapping.bundle_adjustment import (
    BaConfig,
    ObservationBatch,
    ba_solve,
    compute_total_error,
    pose_point_jacobians,
)
from slamtpu.ops.lie import so3_exp


@pytest.fixture
def cam():
    return CameraIntrinsics(500.0, 500.0, 320.0, 240.0)


def project(cam, r, t, x):
    p = r @ x + t
    return np.array([cam.fx * p[0] / p[2] + cam.cx, cam.fy * p[1] / p[2] + cam.cy])


def test_se3_jacobian_numerical(cam):
    # bundle_adjustment.rs:409-432: analytic rotation block vs finite diff.
    point = np.array([1.0, 2.0, 10.0])
    r = np.eye(3)
    t = np.array([0.1, -0.2, 0.05])
    j_pose, j_point = pose_point_jacobians(cam, r, t, point)
    j_pose = np.asarray(j_pose)

    eps = 1e-6
    for axis in range(3):
        d_omega = np.zeros(3)
        d_omega[axis] = eps
        r_pert = np.asarray(so3_exp(jnp.asarray(d_omega))) @ r
        num = (project(cam, r_pert, t, point) - project(cam, r, t, point)) / eps
        np.testing.assert_allclose(j_pose[:, axis], num, atol=1e-4)
    # Translation block and point block numerically too.
    for axis in range(3):
        dt = np.zeros(3)
        dt[axis] = eps
        num = (project(cam, r, t + dt, point) - project(cam, r, t, point)) / eps
        np.testing.assert_allclose(j_pose[:, 3 + axis], num, atol=1e-4)
        num_p = (project(cam, r, t, point + dt) - project(cam, r, t, point)) / eps
        np.testing.assert_allclose(np.asarray(j_point)[:, axis], num_p, atol=1e-4)


def test_rotation_convergence(cam):
    # bundle_adjustment.rs:434-455: perturbed single pose/point -> ~0 error.
    true_r = Rotation.from_euler("xyz", [0.1, 0.2, 0.05]).as_matrix()
    true_t = np.array([0.1, -0.1, 0.0])
    true_point = np.array([1.0, 0.5, 5.0])
    pix = project(cam, true_r, true_t, true_point)

    ba = BundleAdjuster(cam).with_max_iterations(30)
    poses = [(np.eye(3), np.zeros(3))]
    points = [np.array([1.5, 0.8, 6.0])]
    observations = [Observation(0, 0, pix)]
    _, _, final_error = ba.optimize(poses, points, observations, fix_first_pose=False)
    assert final_error < 1e-6, f"final error {final_error}"


def make_ba_problem(rng, n_poses=4, n_points=12, pose_noise=0.05, point_noise=0.12):
    """The synthetic example (examples/bundle_adjustment.rs:12-60), slightly
    larger for a better-conditioned test."""
    cam = CameraIntrinsics(500.0, 500.0, 320.0, 240.0)
    gt_points = np.stack(
        [rng.uniform(-2, 2, n_points), rng.uniform(-1.5, 1.5, n_points), rng.uniform(6, 12, n_points)], 1
    )
    gt_poses = []
    for i in range(n_poses):
        r = Rotation.from_rotvec(rng.normal(scale=0.02, size=3)).as_matrix()
        t = np.array([0.4 * i, 0.0, 0.0]) + rng.normal(scale=0.02, size=3)
        gt_poses.append((r, t))
    observations = [
        Observation(i, j, project(cam, *gt_poses[i], gt_points[j]))
        for i in range(n_poses)
        for j in range(n_points)
    ]
    noisy_poses = [
        (np.asarray(so3_exp(jnp.asarray(rng.normal(scale=pose_noise, size=3)))) @ r, t + rng.normal(scale=pose_noise, size=3))
        for r, t in gt_poses
    ]
    noisy_points = [p + rng.normal(scale=point_noise, size=3) for p in gt_points]
    return cam, gt_poses, gt_points, noisy_poses, noisy_points, observations


def test_synthetic_example_error_reduction(rng):
    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(rng)
    ba = BundleAdjuster(cam).with_max_iterations(30)
    initial = ba.compute_total_error(noisy_poses, noisy_points, observations)
    new_poses, new_points, final = ba.optimize(
        noisy_poses, noisy_points, observations, fix_first_pose=True
    )
    assert initial > 1.0
    assert final < 0.02 * initial, f"{initial:.2f} -> {final:.4f}"
    # Gauge: first pose untouched.
    np.testing.assert_allclose(new_poses[0][0], noisy_poses[0][0], atol=1e-12)
    np.testing.assert_allclose(new_poses[0][1], noisy_poses[0][1], atol=1e-12)


def test_matches_scipy_oracle(rng, cam):
    """Final reprojection error on par with scipy least_squares on the same
    parameterization (fix first pose, angle-axis increments)."""
    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(rng, n_poses=3, n_points=8)
    ba = BundleAdjuster(cam).with_max_iterations(50)
    _, _, ours = ba.optimize(noisy_poses, noisy_points, observations, fix_first_pose=True)

    n_poses, n_points = len(noisy_poses), len(noisy_points)

    def unpack(theta):
        poses = [noisy_poses[0]]
        for i in range(1, n_poses):
            w = theta[(i - 1) * 6 : (i - 1) * 6 + 3]
            t = theta[(i - 1) * 6 + 3 : (i - 1) * 6 + 6]
            poses.append((Rotation.from_rotvec(w).as_matrix() @ noisy_poses[i][0], noisy_poses[i][1] + t))
        pts = theta[(n_poses - 1) * 6 :].reshape(n_points, 3) + np.stack(noisy_points)
        return poses, pts

    def residuals(theta):
        poses, pts = unpack(theta)
        out = []
        for o in observations:
            out.extend(project(cam, *poses[o.keyframe_idx], pts[o.point_idx]) - o.pixel)
        return np.array(out)

    sol = least_squares(residuals, np.zeros((n_poses - 1) * 6 + n_points * 3), method="lm")
    poses_s, pts_s = unpack(sol.x)
    oracle = ba.compute_total_error(poses_s, [p for p in pts_s], observations)
    # scipy converges to ~machine zero on this noiseless problem; ours should
    # be within the same order of smallness.
    assert ours <= max(10.0 * oracle, 1e-3), f"ours {ours} vs scipy {oracle}"


def test_local_bundle_adjustment_freezes_old_poses(rng):
    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(rng, n_poses=5, n_points=10)
    ba = BundleAdjuster(cam).with_max_iterations(15)
    initial = ba.compute_total_error(noisy_poses, noisy_points, observations)
    new_poses, new_points, final = ba.local_bundle_adjustment(
        noisy_poses, noisy_points, observations, window_size=2
    )
    # Out-of-window poses are bit-identical.
    for i in range(3):
        np.testing.assert_allclose(new_poses[i][0], noisy_poses[i][0], atol=1e-12)
        np.testing.assert_allclose(new_poses[i][1], noisy_poses[i][1], atol=1e-12)
    # Window error (obs on last 2 poses) decreased.
    local_obs = [o for o in observations if o.keyframe_idx >= 3]
    before = ba.compute_total_error(noisy_poses, noisy_points, local_obs)
    after = ba.compute_total_error(new_poses, new_points, local_obs)
    assert after < before


def test_empty_observations(cam):
    ba = BundleAdjuster(cam)
    poses, points, err = ba.optimize([(np.eye(3), np.zeros(3))], [np.array([0, 0, 5.0])], [], True)
    assert err == 0.0


def test_out_of_range_observation_ignored(cam):
    """Observations indexing beyond poses/points are skipped by the reference
    (:169-171, :214-216); we require callers to mask instead — verify the
    masked path."""
    rot = jnp.asarray(np.eye(3)[None])
    trans = jnp.zeros((1, 3))
    pts = jnp.asarray([[0.0, 0.0, 5.0]])
    pix = jnp.asarray([[320.0, 240.0], [999.0, 999.0]])
    obs = ObservationBatch(
        kf_idx=jnp.asarray([0, 0], jnp.int32),
        pt_idx=jnp.asarray([0, 0], jnp.int32),
        pixels=pix,
        mask=jnp.asarray([True, False]),
    )
    err = compute_total_error(CameraIntrinsics(500.0, 500.0, 320.0, 240.0), rot, trans, pts, obs)
    assert float(err) < 1e-9  # masked bogus observation contributes nothing


def test_landmark_chunked_schur_matches_unchunked(rng):
    """The chunked Schur assembly is algebraically identical to a single
    chunk covering all landmarks — solutions must agree to float tolerance."""
    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(
        rng, n_poses=5, n_points=23
    )
    rot = jnp.asarray(np.stack([p[0] for p in noisy_poses]))
    trans = jnp.asarray(np.stack([p[1] for p in noisy_poses]))
    pts = jnp.asarray(np.stack(noisy_points))
    obs = ObservationBatch.from_list(observations)
    outs = {}
    for chunk in (7, 23, 64):  # uneven split, exact fit, single oversize chunk
        r, t, x, err, it = ba_solve(
            cam, rot, trans, pts, obs, landmark_chunk=chunk
        )
        outs[chunk] = (np.asarray(r), np.asarray(t), np.asarray(x), float(err))
    for chunk in (7, 23):
        np.testing.assert_allclose(outs[chunk][0], outs[64][0], atol=1e-8)
        np.testing.assert_allclose(outs[chunk][1], outs[64][1], atol=1e-8)
        np.testing.assert_allclose(outs[chunk][2], outs[64][2], atol=1e-8)
        assert abs(outs[chunk][3] - outs[64][3]) < 1e-6


def test_coobs_schur_matches_dense(rng):
    """The co-observation pair assembly (schur_method="coobs") is the same
    algebra as the dense product whenever no landmark exceeds coobs_k
    observers — solutions must agree to float tolerance."""
    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(
        rng, n_poses=5, n_points=23
    )
    rot = jnp.asarray(np.stack([p[0] for p in noisy_poses]))
    trans = jnp.asarray(np.stack([p[1] for p in noisy_poses]))
    pts = jnp.asarray(np.stack(noisy_points))
    obs = ObservationBatch.from_list(observations)
    dense = ba_solve(cam, rot, trans, pts, obs, schur_method="dense")
    coobs = ba_solve(cam, rot, trans, pts, obs, schur_method="coobs", coobs_k=16)
    np.testing.assert_allclose(np.asarray(coobs[0]), np.asarray(dense[0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(coobs[1]), np.asarray(dense[1]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(coobs[2]), np.asarray(dense[2]), atol=1e-8)
    assert abs(float(coobs[3]) - float(dense[3])) < 1e-6


def test_coobs_overflow_drops_observations(rng):
    """With coobs_k smaller than a landmark's observer count, the overflow
    observations are dropped from the WHOLE problem (not just the coupling),
    so the solve equals a dense solve on the manually truncated set."""
    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(
        rng, n_poses=5, n_points=23
    )
    rot = jnp.asarray(np.stack([p[0] for p in noisy_poses]))
    trans = jnp.asarray(np.stack([p[1] for p in noisy_poses]))
    pts = jnp.asarray(np.stack(noisy_points))
    obs = ObservationBatch.from_list(observations)
    k = 2
    # Manual truncation: keep each landmark's first k observations in order.
    seen: dict = {}
    keep = np.zeros(len(observations), bool)
    for i, o in enumerate(observations):
        c = seen.get(o.point_idx, 0)
        if c < k:
            keep[i] = True
        seen[o.point_idx] = c + 1
    trunc = ObservationBatch(
        obs.kf_idx, obs.pt_idx, obs.pixels, obs.mask & jnp.asarray(keep)
    )
    coobs = ba_solve(cam, rot, trans, pts, obs, schur_method="coobs", coobs_k=k)
    dense = ba_solve(cam, rot, trans, pts, trunc, schur_method="dense")
    np.testing.assert_allclose(np.asarray(coobs[0]), np.asarray(dense[0]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(coobs[2]), np.asarray(dense[2]), atol=1e-8)


@pytest.mark.slow
def test_coobs_global_scale(rng):
    """Global-BA scale under the co-observation assembly: 400 poses x 20k
    landmarks x ~80k observations, band-limited co-observation (each
    landmark seen by <= 6 consecutive poses). Two LM iterations must run
    (the dense path's O(P^2 L) product would be ~100x the FLOPs here) and
    cut the error."""
    n_poses, n_points = 400, 20_000
    cam = CameraIntrinsics(500.0, 500.0, 320.0, 240.0)
    gt = np.stack(
        [
            rng.uniform(-10, 130, n_points),
            rng.uniform(-5, 5, n_points),
            rng.uniform(8, 40, n_points),
        ],
        1,
    )
    # Each landmark observed by up to 6 consecutive poses near its x position.
    kf, pt, px = [], [], []
    for j in range(n_points):
        base = int(np.clip(gt[j, 0] / 0.3, 0, n_poses - 6))
        for i in range(base, base + rng.integers(2, 7)):
            t = np.array([0.3 * i, 0.0, 0.0])
            p = gt[j] - t  # identity rotations; camera at t looking +z
            if p[2] < 1.0:
                continue
            kf.append(i)
            pt.append(j)
            px.append([cam.fx * p[0] / p[2] + cam.cx, cam.fy * p[1] / p[2] + cam.cy])
    obs = ObservationBatch(
        jnp.asarray(kf, jnp.int32),
        jnp.asarray(pt, jnp.int32),
        jnp.asarray(np.array(px), jnp.float32),
        jnp.ones((len(kf),), bool),
    )
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (n_poses, 1, 1)))
    trans = jnp.asarray(
        np.stack([[-0.3 * i, 0.0, 0.0] for i in range(n_poses)]).astype(np.float32)
        + rng.normal(scale=0.02, size=(n_poses, 3)).astype(np.float32)
    )
    pts = jnp.asarray((gt + rng.normal(scale=0.2, size=gt.shape)).astype(np.float32))
    err0 = float(compute_total_error(cam, rot, trans, pts, obs))
    r, t, x, err, it = ba_solve(
        cam, rot, trans, pts, obs,
        BaConfig(max_iterations=2), schur_method="coobs", coobs_k=8,
    )
    assert np.isfinite(float(err))
    assert float(err) < 0.5 * err0, f"{err0:.1f} -> {float(err):.1f}"


def test_global_scale_ba_memory_bounded(rng):
    """A global-BA-shaped problem far beyond the old dense coupling's reach:
    the dense [P, L, 6, 3] tensor alone would be P*L*18*8 bytes (~7.4 GB at
    this size in f64); the chunked path peaks at O(P * chunk). Run two LM
    iterations and require the error to drop."""
    n_poses, n_points, obs_per_pose = 128, 8192, 400
    cam = CameraIntrinsics(500.0, 500.0, 320.0, 240.0)
    gt_points = np.stack(
        [
            rng.uniform(-30, 30, n_points),
            rng.uniform(-5, 5, n_points),
            rng.uniform(5, 60, n_points),
        ],
        1,
    )
    kf, pt, px = [], [], []
    for i in range(n_poses):
        t = np.array([0.3 * i, 0.0, 0.0])
        r = np.eye(3)
        js = rng.choice(n_points, obs_per_pose, replace=False)
        for j in js:
            p = r @ gt_points[j] + t
            if p[2] < 1.0:
                continue
            kf.append(i)
            pt.append(j)
            px.append(
                [cam.fx * p[0] / p[2] + cam.cx, cam.fy * p[1] / p[2] + cam.cy]
            )
    obs = ObservationBatch(
        jnp.asarray(kf, jnp.int32),
        jnp.asarray(pt, jnp.int32),
        jnp.asarray(np.array(px), jnp.float32),
        jnp.ones((len(kf),), bool),
    )
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (n_poses, 1, 1)))
    trans = jnp.asarray(
        np.stack([[0.3 * i, 0.0, 0.0] for i in range(n_poses)]).astype(np.float32)
    ) + jnp.asarray(rng.normal(scale=0.02, size=(n_poses, 3)).astype(np.float32))
    pts = jnp.asarray(
        (gt_points + rng.normal(scale=0.3, size=gt_points.shape)).astype(np.float32)
    )
    from slamtpu.mapping.bundle_adjustment import BaConfig

    err0 = float(compute_total_error(cam, rot, trans, pts, obs))
    r, t, x, err, it = ba_solve(
        cam, rot, trans, pts, obs,
        BaConfig(max_iterations=2), landmark_chunk=1024,
    )
    assert np.isfinite(float(err))
    assert float(err) < 0.5 * err0, f"{err0:.1f} -> {float(err):.1f}"


def test_near_camera_landmark_f32_stays_finite(rng):
    """TPU regression: a landmark grazing the z > 1e-6 validity plane made
    f32 normal-equation/Schur products overflow to inf -> NaN poses, and the
    all-invalid garbage state then scored a PERFECT error of 0 and was
    accepted (flagship phase-2 chain poisoned). The Jacobian depth floor +
    the inf-on-zero-valid error metric must keep the solve finite."""
    import jax

    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(
        rng, n_poses=4, n_points=10
    )
    rot = jnp.asarray(np.stack([p[0] for p in noisy_poses]), jnp.float32)
    trans = jnp.asarray(np.stack([p[1] for p in noisy_poses]), jnp.float32)
    pts = np.stack(noisy_points).astype(np.float32)
    # Put one landmark essentially ON the camera plane of pose 0 (z ~ 2e-6:
    # valid by the reference's z > 1e-6 rule, catastrophic for f32 J^T J).
    r0, t0 = noisy_poses[0]
    pts[0] = np.linalg.inv(r0) @ (np.array([0.3, 0.2, 2e-6]) - t0)
    obs = ObservationBatch.from_list(observations, dtype=jnp.float32)

    new_rot, new_trans, new_pts, err, iters = ba_solve(
        cam, rot, trans, jnp.asarray(pts), obs
    )
    assert np.isfinite(np.asarray(new_rot)).all()
    assert np.isfinite(np.asarray(new_trans)).all()
    assert np.isfinite(float(err))
    assert float(err) > 0.0  # a zero score here would be the masked-NaN bug


def test_zero_valid_projections_scores_inf(cam):
    """All landmarks behind the camera -> +inf, not a 'perfect' 0."""
    rot = jnp.asarray(np.eye(3)[None])
    trans = jnp.zeros((1, 3))
    pts = jnp.asarray([[0.0, 0.0, -5.0]])  # behind
    obs = ObservationBatch(
        kf_idx=jnp.asarray([0], jnp.int32),
        pt_idx=jnp.asarray([0], jnp.int32),
        pixels=jnp.asarray([[320.0, 240.0]]),
        mask=jnp.ones((1,), bool),
    )
    err = compute_total_error(cam, rot, trans, pts, obs)
    assert np.isinf(float(err))


def test_onehot_segment_method_matches_scatter(rng):
    """ba_solve's one-hot matmul assembly (the TPU hot path: indicator
    matrices built once per solve, every per-pose/per-landmark reduction one
    MXU matmul) must be numerically equivalent to the scatter-add path —
    same problem, same shapes, so the only difference is floating-point
    summation order inside the reductions."""
    from slamtpu.mapping.bundle_adjustment import BaConfig

    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(
        rng, n_poses=5, n_points=24
    )
    rot = jnp.asarray(np.stack([p[0] for p in noisy_poses]))
    trans = jnp.asarray(np.stack([p[1] for p in noisy_poses]))
    pts = jnp.asarray(np.stack(noisy_points))
    obs = ObservationBatch.from_list(observations)

    out_scatter = ba_solve(
        cam, rot, trans, pts, obs, BaConfig(max_iterations=4),
        segment_method="scatter",
    )
    out_onehot = ba_solve(
        cam, rot, trans, pts, obs, BaConfig(max_iterations=4),
        segment_method="onehot",
    )
    np.testing.assert_allclose(
        np.asarray(out_onehot[0]), np.asarray(out_scatter[0]), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_onehot[1]), np.asarray(out_scatter[1]), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_onehot[2]), np.asarray(out_scatter[2]), rtol=0, atol=1e-4
    )
    err_s, err_o = float(out_scatter[3]), float(out_onehot[3])
    assert abs(err_s - err_o) <= 1e-6 * max(err_s, 1.0), (err_s, err_o)


def test_gather_segment_method_matches_scatter(rng):
    """ba_solve's gather-mode reductions (per-landmark observer TABLE built
    once per solve; every segment sum a gather + K-wide sum, the TPU
    LM-iteration fast path) must match the scatter-add path up to summation
    order — including with a slack K (padding rows must contribute exact
    zeros) and with masked-out observations."""
    from slamtpu.mapping.bundle_adjustment import BaConfig

    cam, _, _, noisy_poses, noisy_points, observations = make_ba_problem(
        rng, n_poses=5, n_points=24
    )
    rot = jnp.asarray(np.stack([p[0] for p in noisy_poses]))
    trans = jnp.asarray(np.stack([p[1] for p in noisy_poses]))
    pts = jnp.asarray(np.stack(noisy_points))
    obs = ObservationBatch.from_list(observations)
    # Mask a few observations out: the table build must skip them.
    mask = np.asarray(obs.mask).copy()
    mask[:: 7] = False
    obs = obs._replace(mask=jnp.asarray(mask))
    k_exact = int(np.bincount(np.asarray(obs.pt_idx)[mask]).max())

    out_scatter = ba_solve(
        cam, rot, trans, pts, obs, BaConfig(max_iterations=4),
        segment_method="scatter",
    )
    for k in (k_exact, k_exact + 3):
        out_gather = ba_solve(
            cam, rot, trans, pts, obs, BaConfig(max_iterations=4),
            segment_method="gather", gather_k_pt=k,
        )
        np.testing.assert_allclose(
            np.asarray(out_gather[0]), np.asarray(out_scatter[0]), rtol=0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out_gather[1]), np.asarray(out_scatter[1]), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_gather[2]), np.asarray(out_scatter[2]), rtol=0, atol=1e-4
        )
        err_s, err_g = float(out_scatter[3]), float(out_gather[3])
        assert abs(err_s - err_g) <= 1e-6 * max(err_s, 1.0), (err_s, err_g)
