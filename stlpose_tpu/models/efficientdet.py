"""
EfficientDet person detector (one-stage, BiFPN), TPU-native.

Capability parity with the reference's second detector family
(reference: models/EfficientDet.py:17-125,
models/efficientdet_utils/model.py — EfficientNet backbone, fast-attention
BiFPN, shared separable-conv box/class heads, multi-scale anchors, decode +
NMS postprocess; d0/d3 variants wired in lib/model_setup.py:75-89).

TPU-first shape discipline mirrors the Faster R-CNN stage: anchors are
static grids, focal-loss target assignment is fully masked, postprocess is
top-k + masked greedy NMS, and detections return in the same padded
{boxes, scores, labels, valid} format so engines can swap detector
families (DETECTOR_CONFIGS in engines/detector_trainer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stlpose_tpu.models.efficientnet import EfficientNet
from stlpose_tpu.ops.boxes import (box_iou, encode_boxes, decode_boxes,
                                   clip_boxes, smooth_l1)
from stlpose_tpu.ops.nms import box_nms_jax


@dataclasses.dataclass(frozen=True)
class EfficientDetConfig:
    num_classes: int = 1                    # person (no background class)
    compound: str = "d0"
    image_size: int = 512
    fpn_channels: int = 64
    fpn_repeats: int = 3
    head_repeats: int = 3
    strides: tuple = (8, 16, 32, 64, 128)   # P3..P7
    anchor_scale: float = 4.0
    # (w_mult, h_mult) pairs, octave-major then ratio — the exact values
    # AND order of the reference's anchor grid (efficientdet_utils/
    # utils.py:115-131, lib/model_setup.py:80-81), so imported head
    # weights line up with the anchor channel layout
    anchor_ratios: tuple = ((1.0, 1.0), (1.4, 0.7), (0.7, 1.4))
    anchor_octaves: tuple = (0.0, 1.0 / 3.0, 2.0 / 3.0)
    # training
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    focal_alpha: float = 0.25
    focal_gamma: float = 1.5
    box_loss_weight: float = 50.0
    # inference
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 64
    pre_nms_top_n: int = 256
    width_mult: float = 1.0
    depth_mult: float = 1.0


EFFICIENTDET_D0 = EfficientDetConfig()
EFFICIENTDET_D3 = EfficientDetConfig(
    compound="d3", image_size=896, fpn_channels=160, fpn_repeats=6,
    head_repeats=4, width_mult=1.2, depth_mult=1.4)
EFFICIENTDET_TINY = EfficientDetConfig(
    image_size=128, fpn_channels=16, fpn_repeats=1, head_repeats=1,
    width_mult=0.35, depth_mult=0.35, pre_nms_top_n=64,
    detections_per_img=8)


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (reference:
    efficientdet_utils/model.py:14-52)."""
    features: int
    dtype: Any = jnp.float32
    use_bias: bool = True

    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        x = nn.Conv(cin, (3, 3), padding="SAME",
                    feature_group_count=cin, use_bias=False,
                    dtype=self.dtype, name="dw")(x)
        return nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                       bias_init=self.bias_init,
                       dtype=self.dtype, name="pw")(x)


class BiFPNLayer(nn.Module):
    """One bidirectional FPN pass with fast-attention weighted fusion
    (reference: efficientdet_utils/model.py:55-304).

    ``first_time`` layers take the raw backbone (C3, C4, C5) and own the
    down-channel projections: conv+BN laterals for P3-P5, a conv+BN+pool
    P5->P6 and pooled P6->P7, plus a SECOND set of C4/C5 down-channels
    feeding the bottom-up residuals — the exact structure of the
    reference's first BiFPN cell (efficientdet_utils/model.py:97-127), so
    zylo117-layout checkpoints map one-to-one."""
    channels: int
    first_time: bool = False
    dtype: Any = jnp.float32

    def _fuse(self, inputs, name):
        w = self.param(name, nn.initializers.ones, (len(inputs),))
        w = nn.relu(w)
        w = w / (w.sum() + 1e-4)
        out = sum(wi * x for wi, x in zip(w, inputs))
        return out

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        def conv(name):
            return SeparableConv(self.channels, dtype=self.dtype, name=name)

        def bn(name, x):
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, dtype=jnp.float32,
                                name=name)(x)

        def down_channel(name, x):
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name=f"{name}_conv")(x)
            return bn(f"{name}_bn", h).astype(self.dtype)

        def up(x, like):
            n, h, w, c = x.shape
            th, tw = like.shape[1], like.shape[2]
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (n, h, 2, w, 2, c)).reshape(
                                     n, 2 * h, 2 * w, c)
            return x[:, :th, :tw]

        def down(x, like):
            # SAME-padded 3x3/2 max pool (reference
            # MaxPool2dStaticSamePadding: asymmetric pad on even extents)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding="SAME")[
                                   :, :like.shape[1], :like.shape[2]]

        if self.first_time:
            c3, c4, c5 = feats
            p3 = down_channel("dc3", c3)
            p4 = down_channel("dc4", c4)
            p5 = down_channel("dc5", c5)
            p6 = nn.max_pool(down_channel("dc6", c5), (3, 3),
                             strides=(2, 2), padding="SAME")
            p7 = nn.max_pool(p6, (3, 3), strides=(2, 2), padding="SAME")
            feats = [p3, p4, p5, p6, p7]
            # bottom-up residuals for P4/P5 re-project the RAW backbone
            # maps through a second down-channel (model.py:120-127)
            residual = [p3, down_channel("dc4b", c4),
                        down_channel("dc5b", c5), p6, p7]
        else:
            residual = feats

        L = len(feats)
        # top-down pass
        td = [None] * L
        td[L - 1] = feats[L - 1]
        for i in range(L - 2, -1, -1):
            fused = self._fuse([feats[i], up(td[i + 1], feats[i])],
                               f"w_td_{i}")
            td[i] = bn(f"bn_td_{i}", conv(f"conv_td_{i}")(
                nn.swish(fused))).astype(self.dtype)
        # bottom-up pass
        out = [None] * L
        out[0] = td[0]
        for i in range(1, L):
            ins = [residual[i], td[i], down(out[i - 1], feats[i])]
            if i == L - 1:
                ins = [residual[i], down(out[i - 1], feats[i])]
            fused = self._fuse(ins, f"w_bu_{i}")
            out[i] = bn(f"bn_bu_{i}", conv(f"conv_bu_{i}")(
                nn.swish(fused))).astype(self.dtype)
        return out


class HeadNet(nn.Module):
    """Shared separable-conv head across levels
    (reference: efficientdet_utils/model.py:306-380)."""
    out_per_anchor: int
    num_anchors: int
    repeats: int
    channels: int
    dtype: Any = jnp.float32
    bias_init_value: float = 0.0

    @nn.compact
    def __call__(self, feats, train: bool = False):
        convs = [SeparableConv(self.channels, dtype=self.dtype,
                               name=f"conv{r}") for r in range(self.repeats)]
        # prior-probability bias lives IN the header conv (not added at
        # call time) so imported checkpoint biases replace it cleanly
        head = SeparableConv(self.num_anchors * self.out_per_anchor,
                             dtype=self.dtype, name="head",
                             bias_init=nn.initializers.constant(
                                 self.bias_init_value))
        outs = []
        for li, x in enumerate(feats):
            for r, c in enumerate(convs):
                x = c(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 dtype=jnp.float32,
                                 name=f"bn{r}_{li}")(x)
                x = nn.swish(x).astype(self.dtype)
            y = head(x)
            outs.append(y.reshape(y.shape[0], -1, self.out_per_anchor))
        return jnp.concatenate(outs, axis=1)


class EfficientDetModule(nn.Module):
    config: EfficientDetConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.backbone = EfficientNet(width_mult=cfg.width_mult,
                                     depth_mult=cfg.depth_mult,
                                     dtype=self.dtype)
        self.bifpn = [BiFPNLayer(cfg.fpn_channels, first_time=(i == 0),
                                 dtype=self.dtype)
                      for i in range(cfg.fpn_repeats)]
        n_anchors = len(cfg.anchor_ratios) * len(cfg.anchor_octaves)
        self.classifier = HeadNet(cfg.num_classes, n_anchors,
                                  cfg.head_repeats, cfg.fpn_channels,
                                  dtype=self.dtype, bias_init_value=-4.59)
        self.regressor = HeadNet(4, n_anchors, cfg.head_repeats,
                                 cfg.fpn_channels, dtype=self.dtype)

    def __call__(self, images, train: bool = False):
        feats = self.backbone(images, train)      # (C3, C4, C5)
        for layer in self.bifpn:
            feats = layer(feats, train)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        cls = self.classifier(feats, train)       # (N, A_total, classes)
        reg = self.regressor(feats, train)        # (N, A_total, 4)
        return cls, reg, shapes


def generate_det_anchors(cfg: EfficientDetConfig, level_shapes):
    """Static multi-octave anchor grid, concatenated (A_total, 4) xyxy
    (reference: efficientdet_utils/utils.py:62-144)."""
    out = []
    for (h, w), stride in zip(level_shapes, cfg.strides):
        base = []
        for octave in cfg.anchor_octaves:
            size = cfg.anchor_scale * stride * (2 ** octave)
            for rw, rh in cfg.anchor_ratios:
                bw = size * rw
                bh = size * rh
                base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
        base = np.asarray(base, np.float32)
        ys = (np.arange(h) + 0.5) * stride
        xs = (np.arange(w) + 0.5) * stride
        cx, cy = np.meshgrid(xs, ys)
        shifts = np.stack([cx, cy, cx, cy], -1).reshape(-1, 1, 4)
        out.append((shifts + base[None]).reshape(-1, 4).astype(np.float32))
    return np.concatenate(out)    # numpy: safe to cache across jit traces


def _focal_loss(logits, targets, alpha, gamma):
    """Sigmoid focal loss, elementwise."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


class EfficientDet:
    """Detector facade with the same protocol as FasterRCNN
    (init / loss_fn / predict)."""

    def __init__(self, config: EfficientDetConfig = EFFICIENTDET_D0,
                 dtype=jnp.float32):
        self.config = config
        self.module = EfficientDetModule(config=config, dtype=dtype)
        self._anchors = None

    def init(self, rng, batch_size: int = 1):
        s = self.config.image_size
        return self.module.init(rng, jnp.zeros((batch_size, s, s, 3)),
                                train=False)

    def _get_anchors(self, shapes):
        if self._anchors is None:
            self._anchors = generate_det_anchors(self.config, shapes)
        return jnp.asarray(self._anchors)

    def loss_fn(self, variables, batch, rng, train: bool = True):
        """Focal classification + smooth-L1 box regression. Loss dict keys
        mirror the one-stage naming; summed total like the reference
        (02_train_faster_rcnn.py:212)."""
        cfg = self.config
        (cls, reg, shapes), updates = self.module.apply(
            variables, batch["image"], train=train,
            mutable=["batch_stats"])
        anchors = self._get_anchors(shapes)

        def per_image(i):
            iou = box_iou(anchors, batch["boxes"][i])
            iou = jnp.where(batch["box_mask"][i][None, :] > 0, iou, -1.0)
            best = iou.max(axis=1)
            matched = iou.argmax(axis=1)
            pos = best >= cfg.fg_iou
            neg = best < cfg.bg_iou
            valid = pos | neg
            # one-hot class targets (person = class 0 of the sigmoid head)
            labels = batch["labels"][i][matched] - 1
            tgt = jax.nn.one_hot(labels, cfg.num_classes) * \
                pos[:, None].astype(jnp.float32)
            fl = _focal_loss(cls[i], tgt, cfg.focal_alpha, cfg.focal_gamma)
            n_pos = jnp.maximum(pos.sum(), 1)
            loss_cls = jnp.where(valid[:, None], fl, 0.0).sum() / n_pos
            deltas = encode_boxes(batch["boxes"][i][matched], anchors)
            lb = smooth_l1(reg[i], deltas, beta=0.11).sum(axis=-1)
            loss_box = jnp.where(pos, lb, 0.0).sum() / n_pos
            return loss_cls, loss_box

        N = batch["image"].shape[0]
        losses = [per_image(i) for i in range(N)]
        l_cls = sum(l[0] for l in losses) / N
        l_box = sum(l[1] for l in losses) / N
        total = l_cls + l_box
        return total, ({"loss_classifier": l_cls, "loss_box_reg": l_box},
                       updates["batch_stats"])

    def predict(self, variables, images):
        """Padded detections {boxes, scores, labels, valid}; labels follow
        the torchvision convention (person = 1) so downstream filtering is
        detector-agnostic (reference returns torchvision-style dicts,
        models/EfficientDet.py:76-125)."""
        cfg = self.config
        cls, reg, shapes = self.module.apply(variables, images, train=False)
        anchors = self._get_anchors(shapes)

        def per_image(cls_i, reg_i):
            scores_all = jax.nn.sigmoid(cls_i)           # (A, C)
            best_c = scores_all.argmax(axis=1)
            best_s = scores_all.max(axis=1)
            top_s, top_i = jax.lax.top_k(best_s, cfg.pre_nms_top_n)
            boxes = decode_boxes(reg_i[top_i], anchors[top_i])
            boxes = clip_boxes(boxes, (cfg.image_size, cfg.image_size))
            ok = top_s > cfg.score_thresh
            keep = box_nms_jax(boxes, jnp.where(ok, top_s, -jnp.inf),
                               cfg.nms_thresh, valid_mask=ok,
                               max_keep=cfg.detections_per_img)
            sc = jnp.where(keep & ok, top_s, -jnp.inf)
            out_s, oi = jax.lax.top_k(sc, cfg.detections_per_img)
            return (boxes[oi], jnp.maximum(out_s, 0.0),
                    best_c[top_i][oi] + 1, out_s > -jnp.inf)

        # vmap over the batch: ONE compiled copy of the postprocess graph
        # instead of N unrolled copies (same fix as FasterRCNN.predict)
        b, s, l, v = jax.vmap(per_image)(cls, reg)
        return {"boxes": b, "scores": s, "labels": l.astype(jnp.int32),
                "valid": v}
