"""
AdaIN style-transfer stylizer as an inline XLA stage.

The reference consumes Styled-COCO images pre-stylized OFFLINE (its
stylization pipeline lives outside the repo; the datasets just read
``images_style_{s}_alpha_{a}`` directories, reference:
data/data_loaders.py:84-100). The BASELINE north star upgrades this to an
inline batched VGG encoder/decoder stylizer running on TPU inside the input
pipeline (BASELINE.json), which is what this module provides:

    t = AdaIN(enc(content), enc(style))
    out = dec(alpha * t + (1 - alpha) * enc(content))

Encoder: VGG16 trunk to relu3_3 shared with models/vgg.py (pretrained
weights convertible from torchvision); decoder: mirrored convs with
nearest-neighbor upsampling, trained with the standard AdaIN
content+style losses (``train_adain_decoder`` below, CLI:
scripts/aux_train_adain_decoder.py) or loaded from a checkpoint.
Everything is NHWC, static-shape, one jit program per batch.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from stlpose_tpu.models.vgg import VGG16Features, IMAGENET_MEAN, IMAGENET_STD


def adain(content_feat, style_feat, eps: float = 1e-5):
    """Adaptive instance normalization over spatial dims (NHWC)."""
    c_mean = content_feat.mean(axis=(1, 2), keepdims=True)
    c_std = jnp.sqrt(content_feat.var(axis=(1, 2), keepdims=True) + eps)
    s_mean = style_feat.mean(axis=(1, 2), keepdims=True)
    s_std = jnp.sqrt(style_feat.var(axis=(1, 2), keepdims=True) + eps)
    return s_std * (content_feat - c_mean) / c_std + s_mean


class AdaINDecoder(nn.Module):
    """Mirror of the VGG trunk up to relu3_3: 256 -> 128 -> 64 -> 3 with
    nearest 2x upsampling between blocks."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def up(x):
            n, h, w, c = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (n, h, 2, w, 2, c))
            return x.reshape(n, h * 2, w * 2, c)

        conv = lambda f, name: nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)],
                                       dtype=self.dtype, name=name)
        x = nn.relu(conv(256, "dec0")(x))
        x = nn.relu(conv(128, "dec1")(up(x)))
        x = nn.relu(conv(128, "dec2")(x))
        x = nn.relu(conv(64, "dec3")(up(x)))
        x = nn.relu(conv(64, "dec4")(x))
        x = conv(3, "dec5")(x)
        return x


class AdaINStylizer:
    """Batched stylization callable.

    Args:
      enc_variables / dec_variables: params for the shared VGG16 encoder
        (taps up to relu3_3) and the decoder.
    """

    # relu1_2, relu2_2, relu3_3 — last is the AdaIN feature; all three feed
    # the style loss during decoder training
    ENC_TAPS = (1, 3, 6)

    def __init__(self, enc_variables=None, dec_variables=None, rng=None):
        self.encoder = VGG16Features(taps=self.ENC_TAPS)
        self.decoder = AdaINDecoder()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        if enc_variables is None:
            enc_variables = self.encoder.init(rng, dummy)
        if dec_variables is None:
            feat = self.encoder.apply(enc_variables, dummy)[-1]
            dec_variables = self.decoder.init(rng, feat)
        self.enc_variables = enc_variables
        self.dec_variables = dec_variables
        self._stylize = jax.jit(self._stylize_impl)

    def _stylize_impl(self, enc_v, dec_v, content, style, alpha):
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        cn = (content - mean) / std
        sn = (style - mean) / std
        c_feat = self.encoder.apply(enc_v, cn)[-1]
        s_feat = self.encoder.apply(enc_v, sn)[-1]
        t = adain(c_feat, s_feat)
        alpha = jnp.asarray(alpha, jnp.float32).reshape(-1, 1, 1, 1)
        t = alpha * t + (1.0 - alpha) * c_feat
        out = self.decoder.apply(dec_v, t)
        return jnp.clip(out * std + mean, 0.0, 1.0)

    def __call__(self, content, style, alpha=1.0):
        """Stylize a batch.

        Args:
          content: (N, H, W, 3) in [0, 1]; style: (N or 1, H, W, 3);
          alpha: scalar or (N,) stylization strength (the reference's
            alpha in styled-COCO directory names).
        """
        content = jnp.asarray(content, jnp.float32)
        style = jnp.asarray(style, jnp.float32)
        if style.shape[0] == 1 and content.shape[0] > 1:
            style = jnp.broadcast_to(style, content.shape)
        alpha = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32),
                                 (content.shape[0],))
        return self._stylize(self.enc_variables, self.dec_variables,
                             content, style, alpha)


def adain_train_losses(encoder, enc_variables, decoder, dec_params,
                       content, style, style_weight: float = 10.0,
                       recon_weight: float = 0.0):
    """Standard AdaIN training objective for the decoder: content loss on
    relu3_3 + style loss (mean/std match) over encoder taps. Returns
    (total, content_loss, style_loss).

    ``recon_weight`` > 0 adds a pixel reconstruction term at alpha=0
    (decode the UN-stylized content feature, compare to the content image)
    — a stabilizer that pins the decoder to an approximate encoder inverse
    so the alpha dial behaves like the reference's styled-COCO alpha
    (data/data_loaders.py:84-100: alpha in the directory names)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    cn = (content - mean) / std
    sn = (style - mean) / std
    c_feat = encoder.apply(enc_variables, cn)[-1]
    s_feats = encoder.apply(enc_variables, sn)
    t = adain(c_feat, s_feats[-1])
    out = decoder.apply({"params": dec_params}, t)
    o_feats = encoder.apply(enc_variables, out)

    content_loss = jnp.mean((o_feats[-1] - t) ** 2)
    style_loss = 0.0
    for of, sf in zip(o_feats, s_feats):
        style_loss += jnp.mean((of.mean(axis=(1, 2)) -
                                sf.mean(axis=(1, 2))) ** 2)
        style_loss += jnp.mean((of.std(axis=(1, 2)) -
                                sf.std(axis=(1, 2))) ** 2)
    total = content_loss + style_weight * style_loss
    if recon_weight:
        recon = decoder.apply({"params": dec_params}, c_feat)
        total = total + recon_weight * jnp.mean((recon - cn) ** 2)
    return total, content_loss, style_loss


def train_adain_decoder(encoder, enc_variables, decoder, dec_params,
                        batches, lr: float = 1e-4,
                        style_weight: float = 10.0,
                        recon_weight: float = 1.0,
                        callback=None):
    """Optimize the AdaIN decoder over an iterable of (content, style)
    image batches ((N, H, W, 3) float32 in [0, 1] each).

    The encoder stays frozen (pretrained VGG or fixed random features —
    both give a usable stylizer; the reference stylizes offline outside
    its repo, data/data_loaders.py:84-100, so this trainer is what makes
    the inline-stylizer path self-contained). Returns
    (trained dec_params, per-step loss history list).
    """
    import optax

    tx = optax.adam(lr)
    opt_state = tx.init(dec_params)

    @jax.jit
    def step(params, opt_state, content, style):
        def loss_fn(p):
            total, cl, sl = adain_train_losses(
                encoder, enc_variables, decoder, p, content, style,
                style_weight=style_weight, recon_weight=recon_weight)
            return total, (cl, sl)

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    history = []
    for content, style in batches:
        dec_params, opt_state, total = step(
            dec_params, opt_state, jnp.asarray(content, jnp.float32),
            jnp.asarray(style, jnp.float32))
        history.append(float(total))
        if callback is not None:
            callback(len(history), history[-1])
    return dec_params, history


def build_inline_stylizer(inline_cfg, crop_hw=(256, 192)):
    """(stylizer, style_bank, alpha) from the ``dataset.inline_style``
    experiment parameter — the CLI entry point of BASELINE config #4
    ("style-transfer-augmented training with the VGG stylizer inline"),
    upgrading the reference's offline styled-image directories
    (data/data_loaders.py:84-100) to an in-pipeline XLA stage.

    Args:
      inline_cfg: dict with keys
        style_dir (required): directory of style exemplar images;
        decoder_ckpt: npz with trained AdaIN decoder params
          (scripts/aux_train_adain_decoder.py output) — default-init
          decoder otherwise;
        vgg_weights: torchvision VGG16 ``.pth`` for the encoder —
          random (fixed) features otherwise;
        alpha: stylization strength (default 1.0).
      crop_hw: (H, W) the style exemplars are resized to (the pose crop
        shape, so one jit program covers content and style encoding).

    Returns (None, None, 1.0) when inline_cfg is falsy or has no
    style_dir.
    """
    import os

    import numpy as np

    if not inline_cfg or not inline_cfg.get("style_dir"):
        return None, None, 1.0
    import cv2

    style_dir = inline_cfg["style_dir"]
    files = [f for f in sorted(os.listdir(style_dir))
             if f.lower().endswith((".jpg", ".jpeg", ".png"))]
    if not files:
        raise FileNotFoundError(
            f"inline_style.style_dir has no images: {style_dir}")
    H, W = crop_hw
    bank = np.stack([
        cv2.resize(cv2.cvtColor(cv2.imread(os.path.join(style_dir, f)),
                                cv2.COLOR_BGR2RGB), (W, H))
        .astype(np.float32) / 255.0 for f in files])

    enc_vars = None
    if inline_cfg.get("vgg_weights"):
        import torch

        from stlpose_tpu.models.vgg import torch_vgg16_to_flax
        state = {k: v.numpy() for k, v in
                 torch.load(inline_cfg["vgg_weights"],
                            map_location="cpu").items()}
        enc_vars = torch_vgg16_to_flax(state, taps=AdaINStylizer.ENC_TAPS)
    dec_vars = None
    if inline_cfg.get("decoder_ckpt"):
        import numpy as np
        blob = np.load(inline_cfg["decoder_ckpt"], allow_pickle=True)
        dec_vars = {"params": blob["params"].item()}
    stylizer = AdaINStylizer(enc_variables=enc_vars,
                             dec_variables=dec_vars)
    return stylizer, bank, float(inline_cfg.get("alpha", 1.0))
