"""cv2 reference-pipeline VO oracle, shared by fidelity tests.

Replicates examples/visual_odometry.rs frame by frame with OpenCV kernels:
ORB detect+compute, BFMatcher with the reference's `max(2*min, 30)` distance
filter (src/feature/matcher.rs), 5-point RANSAC essential + recoverPose
(src/odometry/pose.rs:64-101). The reference's BA is computed then discarded
(SURVEY.md §3.2), so trajectory composition over these relative poses IS the
full reference-pipeline trajectory.
"""

import cv2
import numpy as np


def cv2_vo_relative(frames, intrinsics, nfeatures=400, ransac_thresh=1.0):
    """Run the reference pipeline; returns {pair_index: (R, t_unit)}."""
    k = np.array(
        [
            [intrinsics.fx, 0, intrinsics.cx],
            [0, intrinsics.fy, intrinsics.cy],
            [0, 0, 1],
        ]
    )
    orb = cv2.ORB_create(nfeatures=nfeatures)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    out = {}
    prev = None
    for f in range(frames.shape[0]):
        kp, desc = orb.detectAndCompute(frames[f], None)
        if prev is not None and desc is not None and prev[1] is not None:
            matches = bf.match(prev[1], desc)
            if matches:
                min_d = min(m.distance for m in matches)
                good = [m for m in matches if m.distance < max(2.0 * min_d, 30.0)]
                if len(good) >= 8:
                    p1 = np.float64([prev[0][m.queryIdx].pt for m in good])
                    p2 = np.float64([kp[m.trainIdx].pt for m in good])
                    e, _ = cv2.findEssentialMat(p1, p2, k, cv2.RANSAC, 0.999, ransac_thresh)
                    if e is not None and e.shape == (3, 3):
                        n_in, r, t, _ = cv2.recoverPose(e, p1, p2, k)
                        if n_in >= 8:
                            out[f - 1] = (r, t[:, 0])
        prev = (kp, desc)
    return out


def compose_positions(rel_list):
    """T_global = T_global @ T_rel chain; returns [N+1, 3] positions."""
    g = np.eye(4)
    out = [g[:3, 3].copy()]
    for r, t in rel_list:
        rel = np.eye(4)
        rel[:3, :3] = r
        rel[:3, 3] = t
        g = g @ rel
        out.append(g[:3, 3].copy())
    return np.array(out)
