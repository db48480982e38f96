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
    """Optional Rerun logging (examples/point_cloud.rs:546-770 equivalent).

    Degrades to a no-op when the `rerun` package is unavailable — the cargo
    `rerun` feature's analog."""

    def __init__(self, app_id: str = "slamtpu", enabled: bool = True):
        self._rr = None
        if not enabled:
            return
        try:  # pragma: no cover — rerun is not installed in this image
            import rerun as rr

            rr.init(app_id, spawn=False)
            self._rr = rr
        except ImportError:
            self._rr = None

    @property
    def active(self) -> bool:
        return self._rr is not None

    def log_trajectory(self, positions):  # pragma: no cover
        if self._rr:
            self._rr.log("world/trajectory", self._rr.LineStrips3D([np.asarray(positions)]))

    def log_points(self, positions, colors=None):  # pragma: no cover
        if self._rr:
            self._rr.log("world/points", self._rr.Points3D(np.asarray(positions), colors=colors))

    def log_camera(self, rotation, translation):  # pragma: no cover
        if self._rr:
            r_ctw = np.asarray(rotation).T
            t_ctw = -r_ctw @ np.asarray(translation)
            self._rr.log("world/camera", self._rr.Transform3D(translation=t_ctw, mat3x3=r_ctw))

    def log_frame(self, image):  # pragma: no cover
        if self._rr:
            self._rr.log("world/camera/image", self._rr.Image(np.asarray(image)))


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/slamtpu_trace"):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
