"""
EfficientNet backbone (NHWC, Flax) for EfficientDet.

TPU-native replacement for the reference's vendored lukemelas EfficientNet
(reference: models/efficientnet/model.py:17-109, utils.py:38-313): MBConv
inverted-bottleneck blocks with squeeze-excitation and swish, compound
width/depth scaling for the b0/b3 variants the reference wires up
(lib/model_setup.py:75-89). BatchNorm statistics in f32; drop-connect
omitted (inference parity is what the detector stage needs; training works
without it).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# (expand_ratio, channels, repeats, stride, kernel)
B0_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

SCALING = {           # width_mult, depth_mult, input resolution
    "b0": (1.0, 1.0, 512),
    "b3": (1.2, 1.4, 896),
}


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


class MBConv(nn.Module):
    """Inverted bottleneck: expand 1x1 -> depthwise kxk -> SE -> project."""
    cin: int
    cout: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.99, epsilon=1e-3,
                                       dtype=jnp.float32, name=name)
        h = x
        mid = self.cin * self.expand
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(h)
            h = nn.swish(bn("bn0")(h)).astype(self.dtype)
        k, s = self.kernel, self.stride
        # TF-style SAME padding (asymmetric for stride 2): the reference's
        # vendored lukemelas backbone emulates exactly this
        # (models/efficientnet/utils.py Conv2dStaticSamePadding), so
        # imported torch weights see identical spatial taps
        h = nn.Conv(mid, (k, k), strides=(s, s), padding="SAME",
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(h)
        h = nn.swish(bn("bn1")(h)).astype(self.dtype)
        # squeeze & excitation
        se_ch = max(1, int(self.cin * self.se_ratio))
        se = h.mean(axis=(1, 2), keepdims=True)
        se = nn.swish(nn.Conv(se_ch, (1, 1), dtype=self.dtype,
                              name="se_reduce")(se))
        se = nn.sigmoid(nn.Conv(mid, (1, 1), dtype=self.dtype,
                                name="se_expand")(se))
        h = h * se
        h = nn.Conv(self.cout, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        h = bn("bn2")(h).astype(self.dtype)
        if self.stride == 1 and self.cin == self.cout:
            h = h + x
        return h


class EfficientNet(nn.Module):
    """Backbone trunk; returns the feature maps feeding BiFPN:
    [C3 (stride 8), C4 (stride 16), C5 (stride 32)]."""
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem_ch = round_filters(32, self.width_mult)
        x = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.swish(nn.BatchNorm(use_running_average=not train,
                                  momentum=0.99, epsilon=1e-3,
                                  dtype=jnp.float32, name="stem_bn")(x))
        x = x.astype(self.dtype)

        feats = []
        cin = stem_ch
        bi = 0
        for si, (expand, ch, reps, stride, kernel) in enumerate(B0_BLOCKS):
            cout = round_filters(ch, self.width_mult)
            reps = round_repeats(reps, self.depth_mult)
            for r in range(reps):
                s = stride if r == 0 else 1
                x = MBConv(cin, cout, expand, s, kernel, dtype=self.dtype,
                           name=f"block{bi}")(x, train)
                cin = cout
                bi += 1
            # stage ends feeding BiFPN: after stages with output strides
            # 8, 16, 32 -> stage indices 2, 4 (before s=2 of next), 6
            if si in (2, 4, 6):
                feats.append(x)
        return feats
