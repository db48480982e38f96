"""Frame sources: video files, image directories, synthetic scenes.

Counterpart of the reference's OpenCV videoio usage (src/main.rs:37-61,
examples/*: VideoCapture + cvt_color BGR->GRAY). cv2 is an optional
dependency — synthetic clips and raw .npy stacks work without it.

Input specs accepted by `load_frames`:
  * a video file path (needs cv2),
  * a directory of images (sorted; needs cv2),
  * "synthetic:<T>" or "synthetic:<T>x<H>x<W>" — rendered scene with ground
    truth (io/synthetic.py),
  * a .npy file containing [T, H, W] uint8.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..odometry.camera import CameraIntrinsics

__all__ = ["load_frames"]


def _require_cv2():
    try:
        import cv2  # noqa: F401

        return cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "cv2 is required for video/image input; use synthetic:<T> or .npy"
        ) from e


def load_frames(
    spec: str,
    max_frames: Optional[int] = None,
    skip_frames: int = 0,
) -> Tuple[np.ndarray, Optional[CameraIntrinsics], float]:
    """Returns (frames [T, H, W] uint8, intrinsics or None, fps)."""
    if spec.startswith("synthetic:"):
        parts = spec.split(":", 1)[1]
        dims = [int(v) for v in parts.split("x")]
        t = dims[0]
        h, w = (dims[1], dims[2]) if len(dims) == 3 else (376, 1241)
        from .synthetic import render_sequence

        scene = render_sequence(n_frames=t, height=h, width=w, n_points=max(600, (h * w) // 600))
        frames = scene.frames
        if max_frames:
            frames = frames[: max_frames * (skip_frames + 1)]
        return frames[:: skip_frames + 1], scene.intrinsics, 30.0

    if spec.endswith(".npy"):
        frames = np.load(spec)
        assert frames.ndim == 3, "expected [T, H, W]"
        return frames[:: skip_frames + 1][:max_frames], None, 30.0

    if os.path.isdir(spec) and os.path.exists(os.path.join(spec, "calib.txt")):
        # KITTI odometry sequence directory: calib.txt + image_0/.
        from .kitti import load_sequence

        frames, cam, times = load_sequence(spec, max_frames=max_frames)
        frames = frames[:: skip_frames + 1]
        fps = 1.0 / max(float(np.median(np.diff(times))), 1e-6) if len(times) > 1 else 10.0
        return frames, cam, fps

    if os.path.isdir(spec):
        names = sorted(
            f for f in os.listdir(spec) if f.lower().endswith((".png", ".jpg", ".jpeg", ".pgm", ".bmp"))
        )
        names = names[:: skip_frames + 1]
        if max_frames:
            names = names[:max_frames]
        # Prefer the native multithreaded decoder for PNG/PGM directories
        # (KITTI layout); fall back to cv2 for other formats.
        if names and all(n.lower().endswith((".png", ".pgm")) for n in names):
            from .native_loader import NativeFrameLoader, native_available

            if native_available():
                paths = [os.path.join(spec, n) for n in names]
                with NativeFrameLoader(paths) as loader:
                    return loader.read(len(paths)), None, 30.0
        cv2 = _require_cv2()
        frames = []
        for name in names:
            img = cv2.imread(os.path.join(spec, name), cv2.IMREAD_GRAYSCALE)
            if img is not None:
                frames.append(img)
        return np.stack(frames), None, 30.0

    cv2 = _require_cv2()

    cap = cv2.VideoCapture(spec)
    if not cap.isOpened():
        raise FileNotFoundError(spec)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if not (skip_frames and i % (skip_frames + 1)):
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
        i += 1
        if max_frames and len(frames) >= max_frames:
            break
    cap.release()
    return np.stack(frames), None, float(fps)
