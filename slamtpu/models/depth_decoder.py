"""MonoDepth2 depth decoder (Flax).

Mirrors the upstream DepthDecoder the reference runs through TorchScript
(/root/reference/src/depth/monodepth2.rs:70-198: 5 encoder features in,
sigmoid disparities at 4 scales out): per level i = 4..0, a 3x3
reflection-padded conv + ELU, nearest 2x upsample, skip concat (i > 0),
another conv block, and a sigmoid disparity head at scales 0-3.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


__all__ = ["DepthDecoder", "NUM_CH_DEC"]

NUM_CH_DEC = (16, 32, 64, 128, 256)


class ConvBlock(nn.Module):
    """Reflection-pad 3x3 conv + ELU (upstream ConvBlock)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.channels, (3, 3), padding="VALID", name="conv")(x)
        return nn.elu(x)


class DispConv(nn.Module):
    """Reflection-pad 3x3 conv -> 1 channel (upstream Conv3x3 disparity head)."""

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(1, (3, 3), padding="VALID", name="conv")(x)


def _upsample(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class DepthDecoder(nn.Module):
    """features (5 maps from ResNet18Encoder) -> [disp0, disp1, disp2, disp3]
    sigmoid disparities, disp0 at input/1 resolution... disp_s at 1/2^s."""

    scales: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, features):
        x = features[-1]
        disps = {}
        for i in range(4, -1, -1):
            x = ConvBlock(NUM_CH_DEC[i], name=f"upconv_{i}_0")(x)
            x = _upsample(x)
            if i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlock(NUM_CH_DEC[i], name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disps[i] = nn.sigmoid(DispConv(name=f"dispconv_{i}")(x))
        return [disps[s] for s in sorted(disps)]
