"""Synthetic 3D scene renderer with ground-truth trajectories.

Test/bench data source: the environment has no KITTI sequences and no video
files, so end-to-end fidelity (ATE vs the cv2 oracle pipeline, SURVEY.md §6)
is measured on rendered sequences with exact ground truth. The renderer
splats Gaussian sprites from a fixed 3D landmark field through a moving
pinhole camera — enough parallax and corner texture for ORB/FAST while
staying a few lines of numpy.

Camera convention matches the rest of the stack: pose (R, t) is
world-to-camera, p_cam = R @ p_world + t; the camera path is returned as both
per-frame absolute poses and frame-to-frame relative motions (p2 = R_rel p1
+ t_rel, the OpenCV recoverPose convention).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..odometry.camera import CameraIntrinsics

__all__ = [
    "SyntheticScene",
    "render_sequence",
    "forward_path",
    "lateral_path",
    "orbit_path",
]


@dataclasses.dataclass
class SyntheticScene:
    frames: np.ndarray  # [T, H, W] uint8
    rotations: np.ndarray  # [T, 3, 3] world-to-camera
    translations: np.ndarray  # [T, 3]
    rel_rotations: np.ndarray  # [T-1, 3, 3] (p_next = R p_cur + t)
    rel_translations: np.ndarray  # [T-1, 3]
    points: np.ndarray  # [N, 3] world landmarks
    intrinsics: CameraIntrinsics
    depths: np.ndarray = None  # [T, H, W] f32 depth maps (0 = background), when requested


def _rot_y(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def forward_path(n_frames: int, step: float = 0.3, yaw_rate: float = 0.002):
    """KITTI-like path: camera drives forward (+z in world) with gentle yaw.

    Returns world-to-camera (R, t) per frame.
    """
    rotations = np.zeros((n_frames, 3, 3))
    translations = np.zeros((n_frames, 3))
    heading = 0.0
    position = np.zeros(3)
    for i in range(n_frames):
        r_wc = _rot_y(heading).T  # world-to-camera
        rotations[i] = r_wc
        translations[i] = -r_wc @ position
        direction = _rot_y(heading) @ np.array([0.0, 0.0, 1.0])
        position = position + step * direction
        heading += yaw_rate
    return rotations, translations


def lateral_path(n_frames: int, step: float = 0.1, direction=(1.0, 0.0, 0.0)):
    """Sideways-tracking path: the camera translates along `direction` (world
    frame, normalized here) while looking down +z. The epipole sits far
    outside the image — the well-conditioned geometry for essential-matrix
    estimation (unlike forward motion, where the epipole is at the principal
    point). A slightly off-axis direction (e.g. (1, 0.15, 0.08)) avoids the
    axis-aligned degeneracy where integer keypoint quantization snaps the
    flow field into EXACT consistency with the true essential matrix, which
    flatters whichever pipeline quantizes harder.

    Returns world-to-camera (R, t) per frame.
    """
    d = np.asarray(direction, float)
    d = d / np.linalg.norm(d)
    rotations = np.broadcast_to(np.eye(3), (n_frames, 3, 3)).copy()
    positions = step * np.arange(n_frames)[:, None] * d[None, :]
    translations = -positions  # R = I, so t = -R @ position = -position
    return rotations, translations


def orbit_path(n_frames: int, radius: float = 15.0, angle_step: float = 0.004):
    """Orbit path: the camera circles the world origin in the xz-plane,
    always looking at the center. Strong sideways parallax at every frame.

    Returns world-to-camera (R, t) per frame.
    """
    rotations = np.zeros((n_frames, 3, 3))
    translations = np.zeros((n_frames, 3))
    for i in range(n_frames):
        a = angle_step * i
        position = radius * np.array([np.sin(a), 0.0, -np.cos(a)])
        # Camera z-axis points from the camera toward the origin.
        fwd = -position / np.linalg.norm(position)
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        r_cw = np.stack([right, up, fwd], axis=1)  # camera-to-world columns
        rotations[i] = r_cw.T
        translations[i] = -rotations[i] @ position
    return rotations, translations


def render_sequence(
    n_frames: int = 30,
    height: int = 240,
    width: int = 320,
    n_points: int = 600,
    step: float = 0.3,
    yaw_rate: float = 0.002,
    intrinsics: CameraIntrinsics | None = None,
    seed: int = 0,
    noise: float = 2.0,
    render_depth: bool = False,
    motion: str = "forward",
    lateral_depth: tuple = (8.0, 30.0),
    sprite_size: tuple = (0.05, 0.25),
    lateral_dir: tuple = (1.0, 0.0, 0.0),
    textured: bool = False,
) -> SyntheticScene:
    """Render a moving-camera sequence through a random landmark field.

    motion selects the camera path and a matching landmark layout:
      * "forward" — KITTI-like corridor drive (default; `step`/`yaw_rate`).
      * "lateral" — sideways tracking shot past a landmark wall (`step` is
        per-frame sideways motion); well-conditioned epipolar geometry.
      * "orbit" — circling the landmark cloud, always facing it (`step` is
        the per-frame angle in radians at radius 15).

    With render_depth=True, per-pixel ground-truth depth maps are produced
    alongside (depth of the sprite whose splat dominates the pixel; 0 where
    only background is visible) — the oracle for depth-fusion pipelines.
    """
    rng = np.random.default_rng(seed)
    cam = intrinsics or CameraIntrinsics(
        fx=0.9 * width, fy=0.9 * width, cx=width / 2.0, cy=height / 2.0
    )

    if motion == "forward":
        # Landmark corridor: a tube of points that FOLLOWS the camera path
        # (the path yaws, so a straight axis-aligned box would starve the
        # frustum on long sequences — the camera drifts laterally out of a
        # fixed corridor). Sample an arc-length position along the path
        # (extended 40 units past the final frame), then offset laterally/
        # vertically in that position's local heading frame; for a straight
        # path this reduces exactly to the uniform box corridor.
        n_ext = n_frames + int(np.ceil(40.0 / max(step, 1e-6)))
        headings = yaw_rate * np.arange(n_ext + 1)
        directions = np.stack([np.sin(headings), np.zeros(n_ext + 1), np.cos(headings)], axis=1)
        path = np.concatenate([np.zeros((1, 3)), np.cumsum(step * directions[:-1], axis=0)])
        s_idx = rng.uniform(2.0 / max(step, 1e-6), n_ext, n_points)
        base = path[s_idx.astype(int)]
        frac = (s_idx - s_idx.astype(int))[:, None]
        base = base + frac * step * directions[s_idx.astype(int)]
        h = headings[s_idx.astype(int)]
        dx = rng.uniform(-12.0, 12.0, n_points)
        dy = rng.uniform(-6.0, 6.0, n_points)
        points = base + np.stack(
            [dx * np.cos(h), dy, -dx * np.sin(h)], axis=1
        )
        rotations, translations = forward_path(n_frames, step, yaw_rate)
    elif motion == "lateral":
        # A deep landmark wall in front of the track: spans the whole travel
        # in x/y, depth lateral_depth for parallax diversity.
        d = np.asarray(lateral_dir, float)
        d = d / np.linalg.norm(d)
        travel = step * n_frames
        points = np.stack(
            [
                rng.uniform(min(0.0, travel * d[0]) - 8.0, max(0.0, travel * d[0]) + 8.0, n_points),
                rng.uniform(min(0.0, travel * d[1]) - 6.0, max(0.0, travel * d[1]) + 6.0, n_points),
                rng.uniform(lateral_depth[0], lateral_depth[1], n_points),
            ],
            axis=1,
        )
        points[:, 2] += travel * max(d[2], 0.0) * rng.uniform(0.0, 1.0, n_points)
        rotations, translations = lateral_path(n_frames, step, lateral_dir)
    elif motion == "orbit":
        # A landmark ball around the orbit center, kept inside the orbit.
        points = rng.normal(0.0, 3.0, (n_points, 3))
        points[:, 1] = rng.uniform(-4.0, 4.0, n_points)
        rotations, translations = orbit_path(n_frames, angle_step=step)
    else:
        raise ValueError(f"unknown motion {motion!r}")

    intensities = rng.uniform(60.0, 255.0, n_points)
    sizes = rng.uniform(sprite_size[0], sprite_size[1], n_points)  # world radii
    # Optional per-sprite texture: plain Gaussian splats are rotationally
    # symmetric, so every sprite yields a near-identical BRIEF descriptor and
    # brute-force Hamming matching (ours AND the cv2 oracle) degenerates to
    # chance. An angular + radial modulation unique to each sprite gives ORB
    # distinctive corners and discriminative descriptors.
    tex_k = rng.integers(2, 6, n_points)
    tex_phi = rng.uniform(0.0, 2 * np.pi, n_points)
    tex_rk = rng.uniform(1.5, 3.5, n_points)

    frames = np.full((n_frames, height, width), 96.0, np.float32)
    depths = np.zeros((n_frames, height, width), np.float32) if render_depth else None
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    for f in range(n_frames):
        p_cam = points @ rotations[f].T + translations[f]
        z = p_cam[:, 2]
        vis = z > 0.5
        u = cam.fx * (p_cam[:, 0] / z) + cam.cx
        v = cam.fy * (p_cam[:, 1] / z) + cam.cy
        radius = cam.fx * sizes / z
        inside = vis & (u > -10) & (u < width + 10) & (v > -10) & (v < height + 10)
        img = frames[f]
        for idx in np.nonzero(inside)[0]:
            r = max(float(radius[idx]), 0.7)
            half = int(np.ceil(3 * r))
            x0, x1 = int(u[idx]) - half, int(u[idx]) + half + 1
            y0, y1 = int(v[idx]) - half, int(v[idx]) + half + 1
            sx0, sx1 = max(x0, 0), min(x1, width)
            sy0, sy1 = max(y0, 0), min(y1, height)
            if sx0 >= sx1 or sy0 >= sy1:
                continue
            wy = yy[sy0:sy1, sx0:sx1] - v[idx]
            wx = xx[sy0:sy1, sx0:sx1] - u[idx]
            splat = np.exp(-(wx * wx + wy * wy) / (2.0 * r * r))
            if textured:
                ang = np.arctan2(wy, wx)
                rad = np.sqrt(wx * wx + wy * wy) / r
                pattern = (0.55 + 0.45 * np.cos(tex_k[idx] * ang + tex_phi[idx])) * (
                    0.6 + 0.4 * np.cos(tex_rk[idx] * rad)
                )
                splat = splat * pattern
            values = 96.0 + (intensities[idx] - 96.0) * splat
            region = img[sy0:sy1, sx0:sx1]
            if depths is not None:
                won = values > region
                dreg = depths[f, sy0:sy1, sx0:sx1]
                dreg[won] = z[idx]
            img[sy0:sy1, sx0:sx1] = np.maximum(region, values)
        if noise:
            img += rng.normal(0.0, noise, img.shape).astype(np.float32)

    frames = np.clip(frames, 0, 255).astype(np.uint8)

    # Frame-to-frame relative motion: T_rel = T_next @ T_cur^-1 restricted to
    # (R, t): R_rel = R_next R_cur^T, t_rel = t_next - R_rel t_cur.
    rel_r = np.einsum("tij,tkj->tik", rotations[1:], rotations[:-1])
    rel_t = translations[1:] - np.einsum("tij,tj->ti", rel_r, translations[:-1])

    return SyntheticScene(
        frames=frames,
        rotations=rotations,
        translations=translations,
        rel_rotations=rel_r,
        rel_translations=rel_t,
        points=points,
        intrinsics=cam,
        depths=depths,
    )
