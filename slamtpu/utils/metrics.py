"""Metrics, timing, and optional observability.

The reference's observability is println! counters and an optional Rerun 3D
viewer (SURVEY.md §5). Here:
  * `StepTimer` — wall-clock FPS/latency counters with TRUE device
    synchronization (on the axon remote runtime `block_until_ready` is a
    no-op; only a device->host fetch waits, so the timer fetches one element
    of a designated output).
  * `MetricsLog` — structured per-step metric dicts with running summaries
    (the reference's every-30-frames progress lines, as data).
  * `RerunLogger` — optional Rerun logging of trajectory/points/frames,
    gated on the `rerun` package (mirrors the reference's cargo feature;
    absent here, it degrades to a no-op stub).
  * `profile_trace` — context manager around jax.profiler for TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np

__all__ = ["force_sync", "StepTimer", "MetricsLog", "RerunLogger", "profile_trace"]


def force_sync(tree):
    """Wait for real device completion by fetching one element per leaf."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
    return tree


class StepTimer:
    """Accumulates per-step wall time; fps()/ms() summarize."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, sync_output=None, items: int = 1):
        if sync_output is not None:
            force_sync(sync_output)
        assert self._t0 is not None
        dt = time.time() - self._t0
        self.times.extend([dt / items] * items)
        self._t0 = None
        return dt

    def fps(self, skip: int = 1) -> float:
        t = self.times[skip:] or self.times
        return 1.0 / (sum(t) / len(t)) if t else 0.0

    def ms(self, skip: int = 1) -> float:
        t = self.times[skip:] or self.times
        return 1000.0 * sum(t) / len(t) if t else 0.0


class MetricsLog:
    """Append-only structured metrics with interval printing."""

    def __init__(self, print_every: int = 30):
        self.records: List[Dict] = []
        self.print_every = print_every

    def log(self, step: int, **values):
        rec = {"step": step, **values}
        self.records.append(rec)
        if self.print_every and step % self.print_every == 0:
            parts = " | ".join(f"{k}: {v}" for k, v in values.items())
            print(f"Step {step:5} | {parts}")

    def summary(self) -> Dict:
        if not self.records:
            return {}
        keys = [k for k in self.records[-1] if k != "step" and isinstance(self.records[-1][k], (int, float))]
        return {
            k: float(np.mean([r[k] for r in self.records if k in r])) for k in keys
        }


class RerunLogger:
    """Optional Rerun logging, mirroring the reference's viewer surface
    (examples/point_cloud.rs:546-770): same entity paths, colors, radii, and
    per-frame time sequence. Degrades to a no-op when the `rerun` package is
    unavailable — the cargo `rerun` feature's analog (point_cloud.rs:61-75).

    Event cadence matches the reference main loop (point_cloud.rs:169-394):
    every frame logs the image; every successful pose logs the camera
    transform; every keyframe logs the 2D match overlay + side-by-side match
    image; every BA run logs the 3D map points and the trajectory strip.
    """

    def __init__(self, app_id: str = "slamtpu", enabled: bool = True, save_path: str | None = None):
        self._rr = None
        if not enabled:
            return
        try:
            import rerun as rr
        except ImportError:
            self._rr = None
            return
        rr.init(app_id, spawn=False)
        if save_path:
            rr.save(save_path)
        else:
            # No sink = every log call lands in an unconnected in-memory
            # recording that is dropped at exit; spawn the viewer like the
            # reference's --rerun does (falls back to a no-op sink on
            # headless machines, where only --rerun-save makes sense).
            try:
                rr.spawn()
            except Exception:
                pass
        self._rr = rr
        # Right-Up-Back view coordinates, static (point_cloud.rs:149).
        try:
            rr.log("world", rr.ViewCoordinates.RUB, static=True)
        except (AttributeError, TypeError):
            pass  # older rerun API; view coords are cosmetic

    @property
    def active(self) -> bool:
        return self._rr is not None

    def set_frame(self, frame: int):
        """set_time_sequence("frame", n) (point_cloud.rs:173)."""
        if self._rr:
            self._rr.set_time_sequence("frame", int(frame))

    def log_trajectory(self, positions):
        """Green 3D line strip at world/trajectory (point_cloud.rs:726-755);
        skipped below 2 points like the reference."""
        positions = np.asarray(positions, np.float32)
        if self._rr and positions.shape[0] >= 2:
            self._rr.log(
                "world/trajectory",
                self._rr.LineStrips3D(
                    [positions], colors=[[0, 255, 0]], radii=[0.01]
                ),
            )

    def log_points(self, positions, colors=None):
        """Depth-colored Points3D at world/points (point_cloud.rs:688-724);
        default colors use the blue->green->red 0..50m heatmap shared with
        the PLY exporter (depth_to_color, point_cloud.rs:757-770)."""
        positions = np.asarray(positions, np.float32)
        if not self._rr or positions.shape[0] == 0:
            return
        if colors is None:
            colors = _depth_colors(positions[:, 2])
        self._rr.log(
            "world/points",
            self._rr.Points3D(positions, colors=colors, radii=[0.02]),
        )

    def log_camera(self, rotation, translation):
        """Camera-to-world Transform3D at world/camera (point_cloud.rs:
        573-599; rotation/translation arrive world-to-camera, as stored)."""
        if self._rr:
            r_ctw = np.asarray(rotation, np.float32).T
            t_ctw = -r_ctw @ np.asarray(translation, np.float32)
            self._rr.log("world/camera", self._rr.Transform3D(translation=t_ctw, mat3x3=r_ctw))

    def log_frame(self, image):
        """Camera image at world/camera/image (point_cloud.rs:546-571);
        grayscale input is expanded to RGB like the reference's cvt_color."""
        if self._rr:
            self._rr.log("world/camera/image", self._rr.Image(_to_rgb(image)))

    def log_matches_2d(self, pts_prev, pts_cur, max_points: int = 100):
        """Keyframe match keypoints overlaid on the camera image: previous
        keyframe green, current red, radius 3, capped at 100 for visibility
        (point_cloud.rs:601-641)."""
        if not self._rr:
            return
        n = min(len(pts_prev), len(pts_cur), max_points)
        p1 = np.asarray(pts_prev, np.float32)[:n]
        p2 = np.asarray(pts_cur, np.float32)[:n]
        # Distinct child entities: two logs of the same archetype to ONE
        # path at one timepoint overwrite each other under Rerun's
        # latest-at semantics (the green set silently vanished).
        self._rr.log(
            "world/camera/image/kp_prev",
            self._rr.Points2D(p1, colors=[[0, 255, 0]], radii=[3.0]),
        )
        self._rr.log(
            "world/camera/image/kp_cur",
            self._rr.Points2D(p2, colors=[[255, 0, 0]], radii=[3.0]),
        )

    def log_matches_image(self, prev_image, image, pts_prev, pts_cur):
        """Side-by-side keyframe match image at world/keyframe_matches
        (point_cloud.rs:643-686 — there via cv2::draw_matches; here a
        dependency-free numpy render of the same picture: both frames
        concatenated, green match lines, red endpoint dots)."""
        if self._rr:
            canvas = draw_match_image(prev_image, image, pts_prev, pts_cur)
            self._rr.log("world/keyframe_matches", self._rr.Image(canvas))

    def log_depth(self, rgb_image, depth_colored, frame_idx: int):
        """Depth-estimation viewer surface (examples/depth_estimation.rs:
        306-343): the input frame at camera/rgb, the colormapped disparity
        at camera/depth_colored, and a "Frame: N" text document at info.
        The reference ships BGR byte buffers because its Mats are BGR;
        frames here are already RGB (grayscale expanded like cvt_color)."""
        if not self._rr:
            return
        self._rr.log("camera/rgb", self._rr.Image(_to_rgb(rgb_image)))
        self._rr.log(
            "camera/depth_colored",
            self._rr.Image(np.asarray(depth_colored, np.uint8)),
        )
        self._rr.log("info", self._rr.TextDocument(f"Frame: {int(frame_idx)}"))


def _depth_colors(depths) -> np.ndarray:
    """Vectorized blue->green->red 0..50m ramp (same truncating casts as
    io/export.depth_to_color_ply / point_cloud.rs:901-908) — the per-point
    Python loop ran up to map_capacity interpreter iterations per keyframe."""
    n = np.clip(np.asarray(depths, np.float64) / 50.0, 0.0, 1.0)
    t_lo = n * 2.0
    t_hi = (n - 0.5) * 2.0
    lo = n < 0.5
    r = np.where(lo, 0.0, 255.0 * t_hi)
    g = np.where(lo, 255.0 * t_lo, 255.0 * (1.0 - t_hi))
    b = np.where(lo, 255.0 * (1.0 - t_lo), 0.0)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _to_rgb(image) -> np.ndarray:
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    return img


def draw_match_image(img1, img2, pts1, pts2, max_lines: int = 200) -> np.ndarray:
    """Pure-numpy analog of cv2::draw_matches' side-by-side picture: frames
    concatenated horizontally, green match segments, red keypoint dots."""
    a, b = _to_rgb(img1), _to_rgb(img2)
    h = max(a.shape[0], b.shape[0])
    canvas = np.zeros((h, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1] :] = b
    off = a.shape[1]
    p1 = np.asarray(pts1, np.float32).reshape(-1, 2)[:max_lines]
    p2 = np.asarray(pts2, np.float32).reshape(-1, 2)[:max_lines]
    n = min(len(p1), len(p2))
    for (x1, y1), (x2, y2) in zip(p1[:n], p2[:n]):
        steps = int(max(abs(x2 + off - x1), abs(y2 - y1), 1)) + 1
        xs = np.linspace(x1, x2 + off, steps).round().astype(int)
        ys = np.linspace(y1, y2, steps).round().astype(int)
        ok = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < canvas.shape[1])
        canvas[ys[ok], xs[ok]] = (0, 255, 0)
    for pts, xoff, color in ((p1[:n], 0, (255, 0, 0)), (p2[:n], off, (255, 0, 0))):
        for x, y in pts:
            yy, xx = int(round(y)), int(round(x)) + xoff
            y0, y1_ = max(yy - 1, 0), min(yy + 2, h)
            x0, x1_ = max(xx - 1, 0), min(xx + 2, canvas.shape[1])
            if y0 < y1_ and x0 < x1_:
                canvas[y0:y1_, x0:x1_] = color
    return canvas


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/slamtpu_trace"):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
