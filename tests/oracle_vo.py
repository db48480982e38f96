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


def cv2_vo_relative_cached(frames, intrinsics, nfeatures=400, ransac_thresh=1.0):
    """`cv2_vo_relative` with a disk cache next to the scene cache.

    The oracle is deterministic for fixed inputs (cv2's RANSAC draws from
    OpenCV's default-seeded theRNG, which this fresh-process test run never
    re-seeds), and it costs ~1-2 min per 160-frame scene on this 1-core
    host — the single biggest fast-tier chunk (VERDICT r4 item 7). Key:
    sha256 of the frame bytes + intrinsics + params + the cv2 version
    (a cv2 upgrade may legitimately change RANSAC draws).
    """
    import hashlib
    import json
    import os
    import tempfile

    key_src = json.dumps(
        {
            "cv2": cv2.__version__,
            "shape": list(frames.shape),
            "dtype": str(frames.dtype),
            "frames": hashlib.sha256(np.ascontiguousarray(frames).tobytes()).hexdigest(),
            "k": [float(intrinsics.fx), float(intrinsics.fy),
                  float(intrinsics.cx), float(intrinsics.cy)],
            "nfeatures": nfeatures,
            "ransac_thresh": ransac_thresh,
        },
        sort_keys=True,
    )
    key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".scene_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"oracle_{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return {
            int(i): (r, t) for i, r, t in zip(z["idx"], z["rot"], z["trans"])
        }
    out = cv2_vo_relative(frames, intrinsics, nfeatures, ransac_thresh)
    idx = np.array(sorted(out.keys()), np.int64)
    rot = np.stack([out[i][0] for i in idx]) if idx.size else np.zeros((0, 3, 3))
    trans = np.stack([out[i][1] for i in idx]) if idx.size else np.zeros((0, 3))
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".npz.tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, idx=idx, rot=rot, trans=trans)
    os.replace(tmp, path)
    return out


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
