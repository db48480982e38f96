"""Regression test for the turnkey KITTI kit (tools/run_kitti.py).

The one command that matters on real-data day must not rot: VERDICT r4
item 8. Runs the kit's `synthetic` dry-run IN-PROCESS (so the conftest CPU
mesh and the persistent compile cache apply) on a trimmed clip, asserting
rc == 0 and the summary.json gates — the same go/no-go surface a real
KITTI run is judged by, including the r5 --global-ba pass.
"""

import importlib.util
import json
import os
import sys

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _load_kit():
    spec = importlib.util.spec_from_file_location(
        "run_kitti_kit", os.path.join(_TOOLS, "run_kitti.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_kitti_kit_synthetic_gates(tmp_path):
    kit = _load_kit()
    out = tmp_path / "kitti_run"
    # Half-size frames (rescaled intrinsics) keep the whole kit path — VO,
    # gates, flagship, global BA, artifacts — under ~3 min on this CPU host
    # (full-size synthetic is the nightly/TPU posture).
    rc = kit.main(
        ["synthetic", "--max-frames", "40", "--synthetic-shape", "188", "620",
         "--out", str(out), "--global-ba"]
    )
    assert rc == 0, "kit returned nonzero — a gate failed (see stdout)"

    summary = json.loads((out / "summary.json").read_text())
    assert summary["n_frames"] == 40
    gates = summary["gates"]
    assert gates and all(gates.values()), gates
    # The synthetic branch has exact GT, so the ATE gate must be present
    # (a refactor that silently drops GT plumbing would otherwise pass).
    assert "ate/path<=0.05" in gates
    gba = summary["global_ba"]
    assert gba["err_after"] <= gba["err_before"] * 1.001, gba
    # Reference-compatible artifacts on disk.
    for name in ("trajectory.json", "point_cloud.ply", "point_cloud.json"):
        assert (out / name).exists(), name
