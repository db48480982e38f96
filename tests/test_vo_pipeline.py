"""End-to-end VO pipeline on rendered synthetic sequences.

Fidelity gates (SURVEY.md §6): per-step pose accuracy vs ground truth, and
trajectory agreement with a cv2 oracle pipeline that mirrors
examples/visual_odometry.rs frame by frame.
"""

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from slamtpu.io.synthetic import render_sequence_cached as render_sequence
from slamtpu.pipeline.vo import VoConfig, run_vo
from slamtpu.feature.detector import OrbConfig
from slamtpu.ops.ransac import RansacConfig


@pytest.fixture(scope="module")
def scene():
    return render_sequence(n_frames=25, height=240, width=320, n_points=700, step=0.35, seed=3)


@pytest.fixture(scope="module")
def vo_result(scene):
    cfg = VoConfig(orb=OrbConfig(max_features=400), ransac=RansacConfig(iters=300))
    return run_vo(scene.frames, scene.intrinsics, cfg, seed=0), cfg


def rot_err_deg(a, b):
    return np.degrees(np.linalg.norm(Rotation.from_matrix(a @ b.T).as_rotvec()))


def dir_err_deg(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < 1e-9 or nb < 1e-9:
        return 0.0
    cos = abs(np.dot(a, b) / (na * nb))
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def test_pipeline_pose_accuracy(scene, vo_result):
    run, _ = vo_result
    assert run.total_frames == 25
    assert run.successful_frames >= 22, f"only {run.successful_frames} successes"

    rot_errs, dir_errs = [], []
    for i in np.nonzero(run.success)[0]:
        rot_errs.append(rot_err_deg(run.rotations[i], scene.rel_rotations[i]))
        dir_errs.append(dir_err_deg(run.translations[i], scene.rel_translations[i]))
    # Calibration: the cv2 oracle pipeline on these exact frames scores
    # median 0.28 deg rotation / 9.9 deg t-direction with 18/24 successes
    # (forward motion = epipole in view, the hardest direction geometry).
    # Margin policy (VERDICT r3 item 1): bounds are set from fresh host
    # measurements with >= 15% headroom so host/XLA codegen drift cannot
    # flip the gate. Measured on this host with the GN consensus polish
    # (the r3 rework): rot 0.135 deg (bound 0.5 = 3.7x headroom), dir
    # 10.02 deg (bound 12.0 = 20% headroom; the unpolished path measures
    # 8.86, the retired IRLS refit 7.00 — the GN polish trades per-step
    # direction spread for unbiased composition, and the trajectory-level
    # gates below + tests/test_ate.py are the primary accuracy contract;
    # oracle parity on these frames is 9.9 deg).
    assert np.median(rot_errs) < 0.5, f"median rot err {np.median(rot_errs):.2f} deg"
    assert np.median(dir_errs) < 12.0, f"median dir err {np.median(dir_errs):.2f} deg"


def test_keyframe_every_successful_frame(vo_result):
    # recoverPose returns |t|=1 >= min_translation 0.1, so every successful
    # frame is a keyframe (reference quirk, replicated).
    run, _ = vo_result
    assert run.keyframe_count == run.successful_frames
    assert len(run.trajectory) == run.keyframe_count + 1


def test_chunked_matches_single_shot(scene):
    cfg = VoConfig(orb=OrbConfig(max_features=300), ransac=RansacConfig(iters=200))
    whole = run_vo(scene.frames[:13], scene.intrinsics, cfg, seed=0)
    chunked = run_vo(scene.frames[:13], scene.intrinsics, cfg, chunk_size=4, seed=0)
    np.testing.assert_array_equal(whole.is_keyframe, chunked.is_keyframe)
    np.testing.assert_array_equal(whole.num_matches, chunked.num_matches)
    a = np.array([p.position for p in whole.trajectory.points])
    b = np.array([p.position for p in chunked.trajectory.points])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_trajectory_against_cv2_oracle(scene, vo_result):
    """Same pipeline frame-at-a-time with cv2 kernels; compare ATE."""
    run, cfg = vo_result
    cam = scene.intrinsics
    k = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])

    orb = cv2.ORB_create(nfeatures=400)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    oracle_rel = {}  # pair index -> (R, t)
    prev = None
    for f in range(scene.frames.shape[0]):
        kp, desc = orb.detectAndCompute(scene.frames[f], None)
        if prev is not None and desc is not None and prev[1] is not None:
            matches = bf.match(prev[1], desc)
            if matches:
                min_d = min(m.distance for m in matches)
                good = [m for m in matches if m.distance < max(2.0 * min_d, 30.0)]
                if len(good) >= 8:
                    p1 = np.float64([prev[0][m.queryIdx].pt for m in good])
                    p2 = np.float64([kp[m.trainIdx].pt for m in good])
                    e, _ = cv2.findEssentialMat(p1, p2, k, cv2.RANSAC, 0.999, 1.0)
                    if e is not None and e.shape == (3, 3):
                        n_in, r, t, _ = cv2.recoverPose(e, p1, p2, k)
                        if n_in >= 8:
                            oracle_rel[f - 1] = (r, t[:, 0])
        prev = (kp, desc)

    # Success patterns differ (the oracle fails more frames than we do);
    # compose both trajectories over the pairs BOTH pipelines recovered so
    # the step sequences align.
    common = [i for i in range(scene.frames.shape[0] - 1) if run.success[i] and i in oracle_rel]
    assert len(common) >= 15, f"only {len(common)} common successful pairs"

    def compose(rel_list):
        g = np.eye(4)
        out = [g[:3, 3].copy()]
        for r, t in rel_list:
            rel = np.eye(4)
            rel[:3, :3] = r
            rel[:3, 3] = t
            g = g @ rel
            out.append(g[:3, 3].copy())
        return np.array(out)

    oracle = compose([oracle_rel[i] for i in common])
    ours = compose([(run.rotations[i], run.translations[i]) for i in common])
    # Both estimates are noisy (≈8-10 deg per-step direction error on this
    # forward-motion scene), so comparing them to each other conflates two
    # error sources. Gate instead on ATE versus the unit-step ground truth:
    # ours must be at least as accurate as the cv2 oracle (with slack for
    # run-to-run RANSAC variation).
    gt = compose(
        [
            (
                scene.rel_rotations[i],
                scene.rel_translations[i] / np.linalg.norm(scene.rel_translations[i]),
            )
            for i in common
        ]
    )
    ate_ours = np.sqrt(np.mean(np.sum((ours - gt) ** 2, axis=1)))
    ate_oracle = np.sqrt(np.mean(np.sum((oracle - gt) ** 2, axis=1)))
    path_len = float(len(common))
    assert ate_ours / path_len < 0.10, f"ours ATE {ate_ours:.3f} over {path_len}"
    # Tight gate (VERDICT r2 item 4 retired the 1.25x + 0.05*path slack):
    # the oracle's own ATE on this short low-res clip is noisy, so a small
    # absolute cushion (1% of path) absorbs seed-level RANSAC variance; the
    # primary forward-regime gates live in tests/test_ate.py at a strict
    # 1.01x on the fair 80/160-frame corridors.
    assert ate_ours <= 1.01 * ate_oracle + 0.01 * path_len, (
        f"ours {ate_ours:.3f} vs oracle {ate_oracle:.3f}"
    )


def test_batched_matches_per_sequence(scene):
    """run_vo_batched == run_vo per sequence (same key schedule)."""
    from slamtpu.pipeline.vo import run_vo_batched

    cfg = VoConfig(orb=OrbConfig(max_features=200), ransac=RansacConfig(iters=150))
    frames = np.stack([scene.frames[:10], scene.frames[8:18]])  # two sequences
    runs = run_vo_batched(frames, scene.intrinsics, cfg, seed=0)
    assert len(runs) == 2
    for i in range(2):
        solo = run_vo(frames[i], scene.intrinsics, cfg, seed=i)
        np.testing.assert_array_equal(runs[i].success, solo.success)
        np.testing.assert_array_equal(runs[i].num_matches, solo.num_matches)
        np.testing.assert_allclose(runs[i].rotations, solo.rotations, atol=1e-5)
