"""Generate the depth-converter golden fixture (tests/fixtures/depth_golden.npz).

Runs the torch oracle (tests/test_depth.py's literal re-implementation of the
upstream torchvision-ResNet18 + MonoDepth2 DepthDecoder graphs, the layout of
/root/reference/weights/README.md checkpoints) on DETERMINISTIC numpy-seeded
weights and records compact activation snapshots. The committed fixture lets
tests/test_depth_golden.py verify the Flax architecture + converter end to end
WITHOUT torch installed: the test regenerates the identical weights from
(seed, key, shape) via `deterministic_state_dict` below and compares against
the recorded torch outputs.

Usage (needs torch): python tools/make_depth_fixtures.py
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SEED = 20260819
H, W = 64, 96  # multiples of 32; smallest size that exercises all 5 levels


def _key_rng(seed: int, key: str) -> np.random.Generator:
    """Independent, order-insensitive stream per parameter name."""
    return np.random.default_rng([seed, zlib.crc32(key.encode())])


def deterministic_value(seed: int, key: str, shape, dtype=np.float32):
    """The fixture's weight-generation contract (also used torch-free by
    tests/test_depth_golden.py — keep in sync with nothing, this IS the
    definition)."""
    rng = _key_rng(seed, key)
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if key.endswith("running_var"):
        return rng.uniform(0.5, 1.5, size=shape).astype(dtype)
    if key.endswith("running_mean"):
        return rng.normal(0.0, 0.5, size=shape).astype(dtype)
    if len(shape) <= 1 and key.endswith(".weight"):  # BatchNorm gamma
        return rng.uniform(0.8, 1.2, size=shape).astype(dtype)
    if key.endswith(".bias"):
        return rng.normal(0.0, 0.1, size=shape).astype(dtype)
    # Conv kernels: fan-in-ish scaling keeps 18 layers from saturating.
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    return rng.normal(0.0, 1.0 / np.sqrt(fan_in), size=shape).astype(dtype)


def deterministic_state_dict(seed: int, key_shapes: dict):
    return {k: deterministic_value(seed, k, tuple(s)) for k, s in key_shapes.items()}


def main():
    import torch

    from test_depth import TorchDecoder, TorchEncoder, torch_forward

    enc = TorchEncoder().eval()
    dec = TorchDecoder().eval()

    enc_shapes = {k: tuple(v.shape) for k, v in enc.state_dict().items()}
    dec_shapes = {k: tuple(v.shape) for k, v in dec.state_dict().items()}
    enc_np = deterministic_state_dict(SEED, enc_shapes)
    dec_np = deterministic_state_dict(SEED, dec_shapes)
    enc.load_state_dict({k: torch.from_numpy(v) for k, v in enc_np.items()})
    dec.load_state_dict({k: torch.from_numpy(v) for k, v in dec_np.items()})

    x = _key_rng(SEED, "__input__").uniform(0, 1, size=(1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        feats, outs = torch_forward(enc, dec, torch.from_numpy(x).permute(0, 3, 1, 2))

    out_path = os.path.join(REPO, "tests", "fixtures", "depth_golden.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    payload = {
        "seed": np.int64(SEED),
        "height": np.int64(H),
        "width": np.int64(W),
        # Key/shape tables so the torch-free test regenerates exact weights.
        "enc_keys": np.array(sorted(enc_shapes), dtype=object),
        "enc_shapes": np.array(
            [",".join(map(str, enc_shapes[k])) for k in sorted(enc_shapes)], dtype=object
        ),
        "dec_keys": np.array(sorted(dec_shapes), dtype=object),
        "dec_shapes": np.array(
            [",".join(map(str, dec_shapes[k])) for k in sorted(dec_shapes)], dtype=object
        ),
        # Golden outputs: full scale-0 disparity + a corner slice of each
        # encoder level (NHWC), enough to localize a regression per stage.
        "disp0": outs[0][0, 0].numpy().astype(np.float32),
    }
    for i, f in enumerate(feats):
        payload[f"feat{i}_slice"] = (
            f.permute(0, 2, 3, 1)[0, :6, :6, :8].numpy().astype(np.float32)
        )
        payload[f"feat{i}_mean"] = np.float32(f.mean().item())
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path} ({os.path.getsize(out_path)} bytes)")


if __name__ == "__main__":
    main()
