"""MonoDepth2 checkpoint converter: torch state dicts -> Flax params.

Consumes the upstream `encoder.pth` / `depth.pth` files (the same artifacts
the reference converts to TorchScript, /root/reference/weights/README.md:46-
228) and produces the {params, batch_stats} variable trees for
models.resnet.ResNet18Encoder and models.depth_decoder.DepthDecoder.

Conventions: torch conv kernels are OIHW, Flax wants HWIO; BatchNorm
weight/bias become scale/bias and running stats go under batch_stats.
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_encoder", "convert_decoder", "load_state_dict"]


def load_state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "numpy") or hasattr(v, "shape")}


def _kernel(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd, prefix):
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]), "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def convert_encoder(state_dict):
    """encoder.pth state dict -> {'params': ..., 'batch_stats': ...}.

    MonoDepth2's encoder.pth prefixes everything with 'encoder.' and adds
    height/width/use_stereo entries (filtered here).
    """
    sd = {k[len("encoder."):] if k.startswith("encoder.") else k: v
          for k, v in state_dict.items()
          if k not in ("height", "width", "use_stereo")}

    params = {"conv1": {"kernel": _kernel(sd["conv1.weight"])}}
    batch_stats = {}
    params["bn1"], batch_stats["bn1"] = _bn(sd, "bn1")

    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_{block}"
            tp = f"layer{stage}.{block}"
            p = {
                "conv1": {"kernel": _kernel(sd[f"{tp}.conv1.weight"])},
                "conv2": {"kernel": _kernel(sd[f"{tp}.conv2.weight"])},
            }
            bs = {}
            p["bn1"], bs["bn1"] = _bn(sd, f"{tp}.bn1")
            p["bn2"], bs["bn2"] = _bn(sd, f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                p["downsample_conv"] = {"kernel": _kernel(sd[f"{tp}.downsample.0.weight"])}
                p["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{tp}.downsample.1")
            params[name] = p
            batch_stats[name] = bs

    return {"params": params, "batch_stats": batch_stats}


def convert_decoder(state_dict, scales=(0, 1, 2, 3)):
    """depth.pth state dict -> {'params': ...}.

    Upstream DepthDecoder registers its convs as a ModuleList in the order
    [("upconv",4,0), ("upconv",4,1), ..., ("upconv",0,1),
     ("dispconv",0), ..., ("dispconv",3)], giving keys
    'decoder.{idx}.conv.conv.*' (ConvBlock) and 'decoder.{idx}.conv.*'
    (disparity Conv3x3).
    """
    sd = dict(state_dict)
    params = {}
    idx = 0
    for i in range(4, -1, -1):
        for j in (0, 1):
            params[f"upconv_{i}_{j}"] = {
                "conv": {
                    "kernel": _kernel(sd[f"decoder.{idx}.conv.conv.weight"]),
                    "bias": np.asarray(sd[f"decoder.{idx}.conv.conv.bias"]),
                }
            }
            idx += 1
    for s in scales:
        params[f"dispconv_{s}"] = {
            "conv": {
                "kernel": _kernel(sd[f"decoder.{idx}.conv.weight"]),
                "bias": np.asarray(sd[f"decoder.{idx}.conv.bias"]),
            }
        }
        idx += 1
    return {"params": params}
