"""ResNet-18 encoder (Flax) for MonoDepth2.

Mirrors torchvision's resnet18 layer graph — the layout the MonoDepth2
checkpoints were trained with (/root/reference/src/depth/monodepth2.rs:28-66
loads a TorchScript trace of exactly this encoder) — returning the five
feature maps MonoDepth2's decoder consumes:

  f0: conv1+bn+relu               (H/2,  64)
  f1: maxpool + layer1            (H/4,  64)
  f2: layer2                      (H/8,  128)
  f3: layer3                      (H/16, 256)
  f4: layer4                      (H/32, 512)

Inference-only: BatchNorm uses stored running statistics (the reference runs
TorchScript in eval mode). Input is RGB in [0, 1]; MonoDepth2's encoder
normalization (x - 0.45) / 0.225 is applied here, matching the upstream
ResnetEncoder.forward.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

__all__ = ["ResNet18Encoder", "NUM_CH_ENC"]

NUM_CH_ENC = (64, 64, 128, 256, 512)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=True, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet18Encoder(nn.Module):
    """Returns the 5 MonoDepth2 feature maps. Input [B, H, W, 3] RGB in [0,1]."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x):
        x = (x - 0.45) / 0.225  # MonoDepth2 ResnetEncoder normalization

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        f0 = nn.relu(x)

        x = nn.max_pool(f0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = [f0]
        channels = (64, 128, 256, 512)
        for stage, (n_blocks, ch) in enumerate(zip(self.stage_sizes, channels), start=1):
            for block in range(n_blocks):
                stride = 2 if (stage > 1 and block == 0) else 1
                x = BasicBlock(ch, stride, name=f"layer{stage}_{block}")(x)
            feats.append(x)
        return feats
