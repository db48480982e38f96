"""slamtpu — a TPU-native visual-SLAM frontend built on JAX/XLA/Pallas.

Feature parity target: the `slamkit-rs` crate (MostlyKIGuess/slam-rs). The
public API is re-exported flat at the package root, mirroring
/root/reference/src/lib.rs:1-15, but every kernel is designed TPU-first:
whole video batches per step, static shapes with validity masks, MXU matmuls
for matching, vmapped fixed-iteration RANSAC, scan-based trajectories, and a
Schur-complement Levenberg-Marquardt bundle adjuster in pure JAX.

All exports are lazy: importing `slamtpu` costs nothing beyond jax itself;
heavy optional dependencies (flax for MonoDepth2) load on first attribute
access.
"""

from __future__ import annotations

import importlib

__version__ = "0.1.0"

# Flat public API (mirrors /root/reference/src/lib.rs:1-15): name -> submodule.
_EXPORTS = {
    "OrbDetector": "slamtpu.feature.detector",
    "FeatureMatcher": "slamtpu.feature.matcher",
    "Matches": "slamtpu.feature.matcher",
    "CameraIntrinsics": "slamtpu.odometry.camera",
    "PoseEstimator": "slamtpu.odometry.pose",
    "Trajectory": "slamtpu.odometry.trajectory",
    "TrajectoryPoint": "slamtpu.odometry.trajectory",
    "KeyframeConfig": "slamtpu.mapping.keyframe",
    "KeyframeSelector": "slamtpu.mapping.keyframe",
    "Triangulator": "slamtpu.mapping.triangulation",
    "MapPoint": "slamtpu.mapping.triangulation",
    "Map": "slamtpu.mapping.map",
    "BundleAdjuster": "slamtpu.mapping.bundle_adjustment",
    "Observation": "slamtpu.mapping.bundle_adjustment",
    "MonoDepth2": "slamtpu.depth.monodepth2",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    module_name = _EXPORTS.get(name)
    if module_name is None:
        raise AttributeError(f"module 'slamtpu' has no attribute {name!r}")
    return getattr(importlib.import_module(module_name), name)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
