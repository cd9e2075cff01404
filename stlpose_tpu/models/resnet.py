"""
ResNet backbone (NHWC, Flax) for the detector stage.

TPU-native stand-in for the torchvision ResNet-50 the reference's Faster
R-CNN builds on (reference: lib/model_setup.py:70-73 uses
``fasterrcnn_resnet50_fpn``). Returns the C2..C5 pyramid features.

``folded=True`` serves the BN-folded graph (see
``hrnet.fold_batchnorms`` — the stem pair ``stem_conv``/``stem_bn`` is
folded by the same helper); ``quant`` selects the int8 PTQ serving
flavors for the bottleneck ConvBNs (models/quantize.py — the trunk's fat
256..2048-channel convs are exactly the shape where the v5e int8 MXU
path pays, unlike HRNet's thin branches). The 7x7 stem conv stays
un-quantized: 3 input channels make it a negligible-FLOP, image-domain
layer.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stlpose_tpu.models.hrnet import ConvBN


class ResNetBottleneck(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    folded: bool = False
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(self.features, 1, 1, relu=True, dtype=self.dtype,
                   folded=self.folded, quant=self.quant, name="cb1")(x, train)
        y = ConvBN(self.features, 3, self.stride, relu=True,
                   dtype=self.dtype, folded=self.folded, quant=self.quant,
                   name="cb2")(y, train)
        y = ConvBN(self.features * 4, 1, 1, relu=False, dtype=self.dtype,
                   folded=self.folded, quant=self.quant, name="cb3")(y, train)
        if self.downsample:
            residual = ConvBN(self.features * 4, 1, self.stride, relu=False,
                              dtype=self.dtype, folded=self.folded,
                              quant=self.quant, name="down")(x, train)
        return nn.relu(y + residual).astype(self.dtype)


class ResNet(nn.Module):
    """ResNet-{50,101} trunk; returns [C2, C3, C4, C5] (strides 4..32)."""
    stage_sizes: Sequence[int] = (3, 4, 6, 3)     # ResNet-50
    width: int = 64
    dtype: Any = jnp.float32
    folded: bool = False
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=self.folded,
                    dtype=self.dtype, name="stem_conv")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="stem_bn")(x)
        x = nn.relu(x).astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        feats = []
        planes = self.width
        for s, n_blocks in enumerate(self.stage_sizes):
            stride = 1 if s == 0 else 2
            for b in range(n_blocks):
                x = ResNetBottleneck(
                    planes, stride=stride if b == 0 else 1,
                    downsample=(b == 0), dtype=self.dtype,
                    folded=self.folded, quant=self.quant,
                    name=f"layer{s + 1}_{b}")(x, train)
            feats.append(x)
            planes *= 2
        return feats


RESNET50_TINY = dict(stage_sizes=(1, 1, 1, 1), width=8)
