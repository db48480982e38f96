"""Torch-FREE golden-fixture test of the MonoDepth2 converter + architecture.

tests/fixtures/depth_golden.npz records torch-oracle activations (generated
once by tools/make_depth_fixtures.py) for weights derived deterministically
from (seed, key, shape). Regenerate the same weights here in pure numpy, run
them through convert_encoder/convert_decoder and the Flax network, and match
the recorded outputs — so converter or architecture regressions are caught on
hosts without torch, the regime the published-checkpoint loader
(/root/reference/weights/README.md:46-228) will meet in production.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_depth_fixtures import deterministic_state_dict  # noqa: E402

from slamtpu.depth.convert import convert_decoder, convert_encoder  # noqa: E402
from slamtpu.depth.monodepth2 import MonoDepth2  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "depth_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE, allow_pickle=True)


@pytest.fixture(scope="module")
def model(golden):
    seed = int(golden["seed"])
    h, w = int(golden["height"]), int(golden["width"])
    enc_shapes = {
        k: tuple(int(d) for d in s.split(",") if d)
        for k, s in zip(golden["enc_keys"], golden["enc_shapes"])
    }
    dec_shapes = {
        k: tuple(int(d) for d in s.split(",") if d)
        for k, s in zip(golden["dec_keys"], golden["dec_shapes"])
    }
    enc_sd = deterministic_state_dict(seed, enc_shapes)
    dec_sd = deterministic_state_dict(seed, dec_shapes)
    # The published checkpoint carries the training resolution + an
    # "encoder." prefix (weights/README.md layout); reproduce both.
    enc_sd = {f"encoder.{k}": v for k, v in enc_sd.items()}
    enc_sd["height"] = np.int64(h)
    enc_sd["width"] = np.int64(w)
    md = MonoDepth2(
        encoder_vars=convert_encoder(enc_sd),
        decoder_vars=convert_decoder(dec_sd),
        width=w,
        height=h,
    )
    return md, h, w


def _input_image(golden):
    import zlib

    seed = int(golden["seed"])
    h, w = int(golden["height"]), int(golden["width"])
    rng = np.random.default_rng([seed, zlib.crc32(b"__input__")])
    return rng.uniform(0, 1, size=(1, h, w, 3)).astype(np.float32)


def test_encoder_levels_match_golden(golden, model):
    md, h, w = model
    x = _input_image(golden)
    feats = md.encoder.apply(md.encoder_vars, x)
    assert len(feats) == 5
    for i, f in enumerate(feats):
        f = np.asarray(f)
        np.testing.assert_allclose(
            f[0, :6, :6, :8], golden[f"feat{i}_slice"], atol=2e-4,
            err_msg=f"encoder level {i} slice drifted",
        )
        np.testing.assert_allclose(
            f.mean(), golden[f"feat{i}_mean"], atol=2e-4,
            err_msg=f"encoder level {i} mean drifted",
        )


def test_disparity_matches_golden(golden, model):
    md, h, w = model
    x = _input_image(golden)
    disp = np.asarray(md.predict_raw(x[0] * 255.0))
    assert disp.shape == (h, w)
    np.testing.assert_allclose(disp, golden["disp0"], atol=5e-4)
