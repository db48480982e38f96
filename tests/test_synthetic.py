"""Renderer correctness: the grouped/vectorized sprite splatter must be
bit-exact with the straightforward per-sprite loop it replaced (the loop is
re-stated here as the oracle). Any drift would silently shift every
rendered-scene fixture in the suite (ATE gates, robustness scenes, bench
validation), so equality is asserted to the bit, not to a tolerance.
"""

import numpy as np

from slamtpu.io.synthetic import SyntheticScene, render_sequence
from slamtpu.odometry.camera import CameraIntrinsics


def _naive_render(cam, points, rotations, translations,
                  intensities, sizes, tex, noise_draws, height, width,
                  render_depth):
    """The original scalar renderer (pre-vectorization), kept verbatim as the
    oracle for the grouped implementation."""
    n_frames = rotations.shape[0]
    frames = np.full((n_frames, height, width), 96.0, np.float32)
    depths = np.zeros((n_frames, height, width), np.float32) if render_depth else None
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    tex_k, tex_phi, tex_rk = tex if tex is not None else (None, None, None)
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
            if tex is not None:
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
        if noise_draws is not None:
            img += noise_draws[f]
    return np.clip(frames, 0, 255).astype(np.uint8), depths


def _replay_scene_inputs(n_frames, height, width, n_points, seed, motion,
                         step, textured):
    """Recreate the RNG-derived scene inputs exactly as render_sequence does
    (same generator consumption order), so the oracle renders from identical
    sprites."""
    rng = np.random.default_rng(seed)
    cam = CameraIntrinsics(fx=0.9 * width, fy=0.9 * width, cx=width / 2.0, cy=height / 2.0)
    from slamtpu.io import synthetic as syn

    assert motion == "forward"
    n_ext = n_frames + int(np.ceil(40.0 / max(step, 1e-6)))
    yaw_rate = 0.002
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
    points = base + np.stack([dx * np.cos(h), dy, -dx * np.sin(h)], axis=1)
    rotations, translations = syn.forward_path(n_frames, step, yaw_rate)
    intensities = rng.uniform(60.0, 255.0, n_points)
    sizes = rng.uniform(0.05, 0.25, n_points)
    tex_k = rng.integers(2, 6, n_points)
    tex_phi = rng.uniform(0.0, 2 * np.pi, n_points)
    tex_rk = rng.uniform(1.5, 3.5, n_points)
    return cam, points, rotations, translations, intensities, sizes, (tex_k, tex_phi, tex_rk), rng


def _check(textured, render_depth):
    n_frames, height, width, n_points, seed, step = 6, 72, 96, 80, 3, 0.3
    scene = render_sequence(
        n_frames=n_frames, height=height, width=width, n_points=n_points,
        step=step, seed=seed, noise=1.5, textured=textured,
        render_depth=render_depth,
    )
    cam, points, rotations, translations, intensities, sizes, tex, rng = (
        _replay_scene_inputs(n_frames, height, width, n_points, seed, "forward", step, textured)
    )
    noise_draws = [
        rng.normal(0.0, 1.5, (height, width)).astype(np.float32) for _ in range(n_frames)
    ]
    frames, depths = _naive_render(
        cam, points, rotations, translations, intensities, sizes,
        tex if textured else None, noise_draws, height, width, render_depth,
    )
    np.testing.assert_array_equal(scene.frames, frames)
    if render_depth:
        np.testing.assert_array_equal(scene.depths, depths)


def test_vectorized_render_matches_naive_loop():
    _check(textured=False, render_depth=False)


def test_vectorized_render_matches_naive_loop_textured_depth():
    _check(textured=True, render_depth=True)


def test_render_sequence_basic_properties():
    scene = render_sequence(n_frames=4, height=60, width=80, n_points=50, seed=0)
    assert isinstance(scene, SyntheticScene)
    assert scene.frames.shape == (4, 60, 80)
    assert scene.frames.dtype == np.uint8
    assert scene.rel_rotations.shape == (3, 3, 3)
    # Relative motions must recompose to the absolute poses.
    r = scene.rotations[0]
    t = scene.translations[0]
    for i in range(3):
        r = scene.rel_rotations[i] @ r
        t = scene.rel_rotations[i] @ t + scene.rel_translations[i]
    np.testing.assert_allclose(r, scene.rotations[3], atol=1e-12)
    np.testing.assert_allclose(t, scene.translations[3], atol=1e-12)


def test_oversized_sprite_terminates():
    """A single sprite whose window exceeds the splatter's 2M-element batch
    budget (radius > ~236 px — e.g. a near-camera sprite at KITTI focal
    lengths) used to spin the grouping loop forever; it must now render in
    its own batch."""
    from slamtpu.io.synthetic import _splat_sprites

    img = np.full((120, 160), 96.0, np.float32)
    u = np.array([80.0])
    v = np.array([60.0])
    z = np.array([1.0])
    radius = np.array([300.0])  # half = 900, window 1801^2 > 2M elements
    intensities = np.array([255.0])
    _splat_sprites(img, None, np.array([0]), u, v, z, radius, intensities, None)
    assert img[60, 80] > 200.0  # the sprite actually landed
