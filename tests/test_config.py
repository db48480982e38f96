"""Unified config tree: JSON round trip and pipeline-config derivation."""

import dataclasses

from slamtpu.feature.detector import OrbConfig
from slamtpu.ops.ransac import RansacConfig
from slamtpu.utils.config import SlamConfig, from_json, load_config, save_config, to_json


def test_json_roundtrip_default():
    cfg = SlamConfig()
    assert from_json(to_json(cfg)) == cfg


def test_json_roundtrip_modified(tmp_path):
    cfg = SlamConfig(
        orb=OrbConfig(max_features=1234, fast_threshold=15.0),
        ransac=RansacConfig(iters=256, solver="eigh"),
        fps=10.0,
        map_capacity=2048,
    )
    path = tmp_path / "cfg.json"
    save_config(cfg, str(path))
    loaded = load_config(str(path))
    assert loaded == cfg
    assert loaded.orb.max_features == 1234
    assert loaded.ransac.solver == "eigh"


def test_derived_pipeline_configs():
    cfg = SlamConfig(fps=10.0, ba_interval=3)
    vo = cfg.vo()
    assert vo.fps == 10.0 and vo.orb == cfg.orb
    pc = cfg.point_cloud()
    assert pc.ba_interval == 3 and pc.vo.fps == 10.0
    # Frozen dataclasses stay hashable (jit static args).
    hash(vo)
    hash(pc)


def test_partial_json_uses_defaults():
    cfg = from_json('{"orb": {"max_features": 99}, "fps": 5.0}')
    assert cfg.orb.max_features == 99
    assert cfg.orb.n_levels == 8  # default preserved
    assert cfg.fps == 5.0
    assert cfg.ransac == RansacConfig()
