"""
VGG16 feature extractor and LPIPS-style perceptual loss in Flax.

Equivalent of the reference's ``VGGPerceptualLoss`` (reference:
lib/loss.py:17-58): four feature blocks (torchvision ``features`` slices
[:4], [4:9], [9:16], [16:23]), ImageNet normalization, optional bilinear
resize to 224x224, L1 distance summed over blocks. The reference only ever
consumes *precomputed* perceptual losses (lib/loss.py:154-198 reads a JSON
produced offline); here the loss is a jittable batched function, so styled
samples can be scored inline on TPU during training or by the offline aux
script.

Weight loading: ``torch_vgg16_to_flax`` maps torchvision's
``features.{i}.weight/bias`` state_dict onto this module.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv layout: index -> out_channels
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
VGG16_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
# maxpool after these conv positions (0-based conv counter)
_POOL_AFTER = {1, 3, 6, 9, 12}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """VGG16 convolutional trunk (NHWC); returns activations after the
    ReLU of selected conv layers.

    ``taps``: indices into the conv sequence (0-based) after whose ReLU the
    activation is returned. Default taps (1, 3, 6, 9) are the block ends
    used by the perceptual loss (torchvision features[:4], [4:9], [9:16],
    [16:23] == relu1_2, relu2_2, relu3_3, relu4_3).
    """
    taps: Sequence[int] = (1, 3, 6, 9)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        n_convs = max(self.taps) + 1
        for i in range(n_convs):
            x = nn.Conv(VGG16_CHANNELS[i], (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
            if i in self.taps:
                outs.append(x)
            if i in _POOL_AFTER and i != n_convs - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outs


def torch_vgg16_to_flax(state: dict, taps=(1, 3, 6, 9)) -> dict:
    """torchvision vgg16 ``features.*`` state_dict (numpy) -> Flax params."""
    params = {}
    n_convs = max(taps) + 1
    for ci in range(n_convs):
        ti = VGG16_CONV_IDX[ci]
        w = np.asarray(state[f"features.{ti}.weight"]).transpose(2, 3, 1, 0)
        b = np.asarray(state[f"features.{ti}.bias"])
        params[f"conv{ci}"] = {"kernel": w.astype(np.float32),
                               "bias": b.astype(np.float32)}
    return {"params": params}


def _resize_bilinear(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[3]),
                            method="bilinear")


def make_perceptual_loss_fn(vgg: VGG16Features, variables,
                            resize: bool = True, per_sample: bool = True):
    """Build a jittable perceptual-loss function.

    fn(input, target) with NHWC images in [0, 1]; returns per-sample (N,)
    L1 feature distances summed over the four blocks (reference semantics:
    lib/loss.py:41-58, which returns the batch-summed scalar — per_sample
    False reproduces that)."""

    def fn(inp, tgt):
        if inp.shape[-1] != 3:
            inp = jnp.repeat(inp, 3, axis=-1)
            tgt = jnp.repeat(tgt, 3, axis=-1)
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        inp = (inp - mean) / std
        tgt = (tgt - mean) / std
        if resize:
            inp = _resize_bilinear(inp, (224, 224))
            tgt = _resize_bilinear(tgt, (224, 224))
        feats_i = vgg.apply(variables, inp)
        feats_t = vgg.apply(variables, tgt)
        loss = 0.0
        for fi, ft in zip(feats_i, feats_t):
            diff = jnp.abs(fi - ft)
            if per_sample:
                loss = loss + diff.mean(axis=(1, 2, 3))
            else:
                loss = loss + diff.mean()
        return loss

    return jax.jit(fn)
