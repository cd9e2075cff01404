"""
Faster R-CNN (ResNet-FPN) person detector, TPU-native.

Capability parity with the reference's torchvision
``fasterrcnn_resnet50_fpn`` person detector (reference:
lib/model_setup.py:50-106; train/eval engines 02_train_faster_rcnn.py,
03_evaluate_faster_rcnn.py). The architecture follows the published
Faster R-CNN + FPN design, but every stage is re-shaped for XLA
(SURVEY.md §7 hard part #1 — "dynamic-shape NMS/proposal filtering must
become fixed-size masked top-k"):

  * proposal selection = per-level static top-k -> masked greedy NMS
    (ops/nms.box_nms_jax) -> fixed-size top-k, never a dynamic gather;
  * anchor/proposal target assignment and minibatch sampling use
    rank-based masking (randomized priorities + argsort) instead of
    dynamic index sets;
  * RoIAlign slices each box's assigned-level patch and resamples it with
    two banded interpolation matmuls (ops/roi_align.multilevel_roi_align;
    the sample-every-level mask-select formulation survives as the oracle
    ``multilevel_roi_align_reference``);
  * the whole train step (backbone, RPN, heads, losses) is one jit program
    batched over images with vmap.

Detections come back torchvision-style as fixed-size padded
{boxes, labels, scores, valid} arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stlpose_tpu.models.resnet import ResNet
from stlpose_tpu.ops.boxes import (box_iou, encode_boxes, decode_boxes,
                                   clip_boxes, smooth_l1, box_area)
from stlpose_tpu.ops.nms import box_nms_jax
from stlpose_tpu.ops.roi_align import multilevel_roi_align


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int = 2                   # background + person
    image_size: int = 400                  # square canvas side
    # backbone
    stage_sizes: tuple = (3, 4, 6, 3)
    width: int = 64
    fpn_channels: int = 256
    # anchors: one size per level x 3 ratios (torchvision defaults)
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    strides: tuple = (4, 8, 16, 32, 64)
    # RPN
    pre_nms_top_n_train: int = 1000
    pre_nms_top_n_test: int = 500
    post_nms_top_n_train: int = 512
    post_nms_top_n_test: int = 256
    rpn_nms_thresh: float = 0.7
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    # RoI head
    roi_fg_iou: float = 0.5
    roi_batch_per_image: int = 256
    roi_positive_fraction: float = 0.25
    box_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    # inference
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 64


# Eval preset matching torchvision fasterrcnn_resnet50_fpn's proposal/
# detection budgets — what the reference actually fine-tunes and evaluates
# (reference: lib/model_setup.py:70-73 uses torchvision defaults verbatim:
# pre/post-NMS 1000/1000 at test, 2000/2000 at train, 100 detections/img).
# The default FasterRCNNConfig above uses deliberately tighter budgets
# (500/256/64) as the SERVING configuration; use this preset for AP-parity
# runs so a budget gap is never mis-attributed to numerics
# (scripts/RUNBOOK_AP_PARITY.md).
FASTER_RCNN_TORCHVISION_PARITY = FasterRCNNConfig(
    pre_nms_top_n_train=2000, pre_nms_top_n_test=1000,
    post_nms_top_n_train=2000, post_nms_top_n_test=1000,
    detections_per_img=100)


FASTER_RCNN_TINY = FasterRCNNConfig(
    stage_sizes=(1, 1, 1, 1), width=8, fpn_channels=32, image_size=128,
    pre_nms_top_n_train=64, pre_nms_top_n_test=64,
    post_nms_top_n_train=32, post_nms_top_n_test=32,
    roi_batch_per_image=32, detections_per_img=8)


# ------------------------------------------------------------------ modules
class FPN(nn.Module):
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """C2..C5 -> P2..P5 (+P6 maxpool) with top-down pathway."""
        laterals = [nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                            name=f"lateral{i}")(f)
                    for i, f in enumerate(feats)]
        outs = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = outs[0]
            n, h, w, c = up.shape
            th, tw = laterals[i].shape[1], laterals[i].shape[2]
            up = jnp.broadcast_to(up[:, :, None, :, None, :],
                                  (n, h, 2, w, 2, c)).reshape(
                                      n, h * 2, w * 2, c)[:, :th, :tw]
            outs.insert(0, laterals[i] + up)
        ps = [nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=self.dtype, name=f"out{i}")(o)
              for i, o in enumerate(outs)]
        p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
        return ps + [p6]


class RPNHead(nn.Module):
    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(feats[0].shape[-1], (3, 3),
                       padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name="reg")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(reg(t))
        return logits, deltas


class BoxHead(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc7")(x))
        cls = nn.Dense(self.num_classes, dtype=self.dtype,
                       name="cls_score")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                       name="bbox_pred")(x)
        return cls, reg


class FasterRCNNModule(nn.Module):
    """Parameterized trunk: backbone + FPN + RPN head + box head.

    ``pallas_roi`` statically routes RoIAlign to the fused Pallas kernel
    (ops/pallas_roi.py — one contiguous patch DMA per box + on-chip
    resampling; ~3x the XLA gather path on TPU). The facade resolves the
    STLPOSE_PALLAS_ROI gate ONCE at construction (never under trace).
    ``roi_patch_quant`` additionally quantizes the RoI patch pyramid to
    int8 before the kernel's DMA stage (exact per-channel dequant after
    pooling; see ops/pallas_roi.py) — a serving-throughput knob.

    ``trunk_folded``/``trunk_quant`` select the serving trunk flavor: BN
    folded into the ResNet convs (``fold_frcnn_trunk``) and optionally the
    int8 PTQ bottlenecks (``quantize_frcnn_trunk`` — the trunk's fat
    256..2048-channel convs are the shape where the v5e int8 MXU path
    pays, unlike HRNet's thin branches). Serving-only: training requires
    the live-BN graph."""
    config: FasterRCNNConfig
    dtype: Any = jnp.float32
    pallas_roi: bool = False
    roi_patch_quant: bool = False
    roi_mode: str | None = None      # None -> ops.pallas_roi._ROI_MODE
    trunk_folded: bool = False
    trunk_quant: str = "none"

    def setup(self):
        cfg = self.config
        self.backbone = ResNet(stage_sizes=cfg.stage_sizes, width=cfg.width,
                               dtype=self.dtype, folded=self.trunk_folded,
                               quant=self.trunk_quant)
        self.fpn = FPN(channels=cfg.fpn_channels, dtype=self.dtype)
        self.rpn_head = RPNHead(num_anchors=len(cfg.anchor_ratios),
                                dtype=self.dtype)
        self.box_head = BoxHead(num_classes=cfg.num_classes,
                                dtype=self.dtype)

    def features(self, images, train: bool = False):
        cs = self.backbone(images, train)
        return self.fpn(cs)

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi(self, feats, boxes):
        """feats: P2..P5 for ONE image; boxes (P, 4)."""
        pooled = multilevel_roi_align(
            [f for f in feats], boxes,
            strides=self.config.strides[:len(feats)])
        return self.box_head(pooled)

    def roi_batched(self, feats, boxes):
        """feats: P2..P5 as (B, h, w, C) maps; boxes (B, P, 4). One fused
        Pallas RoIAlign over ALL B*P boxes (no vmap-of-pallas), box head
        applied flat. Returns ((B, P, classes), (B, P, 4*classes))."""
        from stlpose_tpu.ops.pallas_roi import (
            multilevel_roi_align_pallas_batched)
        B, P = boxes.shape[:2]
        if self.pallas_roi:
            pooled = multilevel_roi_align_pallas_batched(
                [f for f in feats], boxes,
                strides=self.config.strides[:len(feats)],
                patch_quant=self.roi_patch_quant, mode=self.roi_mode)
        else:
            pooled = jax.vmap(
                lambda fs, bx: multilevel_roi_align(
                    list(fs), bx,
                    strides=self.config.strides[:len(feats)]))(
                tuple(feats), boxes)
        flat = pooled.reshape(B * P, *pooled.shape[2:])
        cls_logits, box_deltas = self.box_head(flat)
        return (cls_logits.reshape(B, P, -1),
                box_deltas.reshape(B, P, -1))

    def __call__(self, images, train: bool = False):
        feats = self.features(images, train)
        logits, deltas = self.rpn(feats)
        return feats, logits, deltas

    def full_init(self, images):
        """Init-only path touching every submodule (incl. the box head)."""
        feats, logits, deltas = self(images, train=False)
        dummy = jnp.asarray([[0.0, 0.0, 32.0, 32.0]], jnp.float32)
        return self.roi([f[0] for f in feats[:4]], dummy)


# ---------------------------------------------------------------- anchors
def generate_anchors(cfg: FasterRCNNConfig, level_shapes):
    """Static anchor grid per level -> concatenated (A_total, 4) xyxy."""
    all_anchors = []
    for (h, w), stride, size in zip(level_shapes, cfg.strides,
                                    cfg.anchor_sizes):
        base = []
        for ratio in cfg.anchor_ratios:
            bw = size * np.sqrt(1.0 / ratio)
            bh = size * np.sqrt(ratio)
            base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
        base = np.asarray(base, np.float32)                  # (A, 4)
        ys = (np.arange(h, dtype=np.float32)) * stride
        xs = (np.arange(w, dtype=np.float32)) * stride
        cx, cy = np.meshgrid(xs, ys)
        shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + base[None]).reshape(-1, 4)
        all_anchors.append(anchors)
    return [jnp.asarray(a) for a in all_anchors]


# ---------------------------------------------------- static-shape helpers
def _rank_desc(values):
    """rank[i] = position of element i in descending sort (static shape)."""
    order = jnp.argsort(-values)
    return jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))


def sample_balanced(labels, rng, batch_size: int, positive_fraction: float):
    """Rank-mask minibatch sampling: up to batch*frac positives, negatives
    fill the remainder. labels: 1 pos, 0 neg, -1 ignore. Returns
    (pos_mask, neg_mask) with static shapes."""
    r1, r2 = jax.random.split(rng)
    pos = labels == 1
    neg = labels == 0
    max_pos = int(batch_size * positive_fraction)
    pos_rank = _rank_desc(jnp.where(
        pos, jax.random.uniform(r1, labels.shape), -1.0))
    pos_sel = pos & (pos_rank < max_pos)
    n_pos = pos_sel.sum()
    neg_rank = _rank_desc(jnp.where(
        neg, jax.random.uniform(r2, labels.shape), -1.0))
    neg_sel = neg & (neg_rank < batch_size - n_pos)
    return pos_sel, neg_sel


def match_to_gt(anchors, gt_boxes, gt_mask, fg_iou, bg_iou,
                force_best_per_gt: bool = True):
    """IoU matching -> (labels {1,0,-1}, matched_idx).

    Padded GT rows (gt_mask 0) never match. Anchors with IoU >= fg_iou are
    positive, < bg_iou negative, between ignored; optionally the best anchor
    for each GT is forced positive (RPN rule)."""
    iou = box_iou(anchors, gt_boxes)                        # (A, G)
    iou = jnp.where(gt_mask[None, :] > 0, iou, -1.0)
    best_iou = iou.max(axis=1)
    matched = iou.argmax(axis=1)
    labels = jnp.where(best_iou >= fg_iou, 1,
                       jnp.where(best_iou < bg_iou, 0, -1))
    if force_best_per_gt:
        per_gt_best = iou.max(axis=0)                       # (G,)
        force = (iou >= per_gt_best[None, :] - 1e-6) & \
            (gt_mask[None, :] > 0) & (per_gt_best[None, :] > 0)
        labels = jnp.where(force.any(axis=1), 1, labels)
    return labels, matched


# -------------------------------------------------------------- proposals
def select_proposals(cfg, anchors_per_level, logits, deltas, train: bool):
    """Per-image static-shape proposal generation.

    Args:
      logits: per-level (H, W, A); deltas: per-level (H, W, 4A).
    Returns (P, 4) boxes + (P,) scores, P = post_nms_top_n.
    """
    pre_n = cfg.pre_nms_top_n_train if train else cfg.pre_nms_top_n_test
    post_n = cfg.post_nms_top_n_train if train else cfg.post_nms_top_n_test
    cand_boxes, cand_scores, cand_levels = [], [], []
    for li, (anch, lg, dl) in enumerate(zip(anchors_per_level, logits,
                                            deltas)):
        s = lg.reshape(-1)
        d = dl.reshape(-1, 4)
        k = min(pre_n, s.shape[0])
        top_s, top_i = jax.lax.top_k(s, k)
        boxes = decode_boxes(d[top_i], anch[top_i])
        boxes = clip_boxes(boxes, (cfg.image_size, cfg.image_size))
        cand_boxes.append(boxes)
        cand_scores.append(top_s)
        cand_levels.append(jnp.full((k,), li, jnp.float32))
    boxes = jnp.concatenate(cand_boxes)
    scores = jnp.concatenate(cand_scores)
    levels = jnp.concatenate(cand_levels)

    # drop tiny boxes
    wh_ok = ((boxes[:, 2] - boxes[:, 0]) >= 1e-3) & \
        ((boxes[:, 3] - boxes[:, 1]) >= 1e-3)
    # per-level NMS: offset coordinates by level so levels never suppress
    # each other (torchvision's batched_nms trick)
    offset = levels[:, None] * (cfg.image_size * 2.0)
    keep = box_nms_jax(boxes + offset, jnp.where(wh_ok, scores, -jnp.inf),
                       cfg.rpn_nms_thresh, valid_mask=wh_ok,
                       max_keep=post_n)
    masked = jnp.where(keep, scores, -jnp.inf)
    top_s, top_i = jax.lax.top_k(masked, post_n)
    return boxes[top_i], top_s


# ------------------------------------------------------------------ losses
def _bce_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def rpn_loss(cfg, anchors, logits_flat, deltas_flat, gt_boxes, gt_mask,
             rng):
    """RPN objectness + box regression for one image."""
    labels, matched = match_to_gt(anchors, gt_boxes, gt_mask,
                                  cfg.rpn_fg_iou, cfg.rpn_bg_iou)
    no_gt = gt_mask.sum() == 0
    labels = jnp.where(no_gt, jnp.where(labels == -1, -1, 0), labels)
    pos_sel, neg_sel = sample_balanced(labels, rng, cfg.rpn_batch_per_image,
                                       cfg.rpn_positive_fraction)
    sampled = pos_sel | neg_sel
    n_sampled = jnp.maximum(sampled.sum(), 1)

    obj = _bce_logits(logits_flat, pos_sel.astype(jnp.float32))
    loss_obj = jnp.where(sampled, obj, 0.0).sum() / n_sampled

    target_deltas = encode_boxes(gt_boxes[matched], anchors)
    reg = smooth_l1(deltas_flat, target_deltas).sum(axis=-1)
    loss_reg = jnp.where(pos_sel, reg, 0.0).sum() / n_sampled
    return loss_obj, loss_reg


def roi_targets(cfg, proposals, gt_boxes, gt_labels, gt_mask, rng):
    """Match proposals to GT and sample the RoI minibatch (one image).

    Returns (boxes (R, 4), labels (R,), reg_targets (R, 4), pos_mask,
    sampled_mask) with R = roi_batch_per_image; GT boxes are appended to
    the proposal pool first (torchvision behavior)."""
    pool = jnp.concatenate([proposals, gt_boxes], axis=0)
    iou = box_iou(pool, gt_boxes)
    iou = jnp.where(gt_mask[None, :] > 0, iou, -1.0)
    best = iou.max(axis=1)
    matched = iou.argmax(axis=1)
    labels = jnp.where(best >= cfg.roi_fg_iou,
                       gt_labels[matched].astype(jnp.int32), 0)
    is_pos = best >= cfg.roi_fg_iou
    lab_for_sampling = jnp.where(is_pos, 1, 0)
    pos_sel, neg_sel = sample_balanced(
        lab_for_sampling, rng, cfg.roi_batch_per_image,
        cfg.roi_positive_fraction)
    sampled = pos_sel | neg_sel
    # compact the sampled rows to a fixed R via ranked top-k
    priority = (sampled.astype(jnp.float32) * 2 +
                pos_sel.astype(jnp.float32))
    _, idx = jax.lax.top_k(priority + best * 1e-3, cfg.roi_batch_per_image)
    boxes = pool[idx]
    out_labels = jnp.where(sampled[idx], labels[idx], 0)
    reg_targets = encode_boxes(gt_boxes[matched[idx]], boxes,
                               cfg.box_weights)
    return boxes, out_labels, reg_targets, pos_sel[idx], sampled[idx]


def roi_loss(cfg, cls_logits, box_deltas, labels, reg_targets, pos_mask,
             sampled_mask):
    n = jnp.maximum(sampled_mask.sum(), 1)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    loss_cls = jnp.where(sampled_mask, ce, 0.0).sum() / n

    deltas = box_deltas.reshape(-1, cfg.num_classes, 4)
    picked = jnp.take_along_axis(
        deltas, labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
    reg = smooth_l1(picked, reg_targets, beta=1.0).sum(axis=-1)
    n_pos = jnp.maximum(pos_mask.sum(), 1)
    loss_reg = jnp.where(pos_mask, reg, 0.0).sum() / n_pos
    return loss_cls, loss_reg


# --------------------------------------------------------------- assembly
class FasterRCNN:
    """Detector facade: init/train-loss/predict as pure jit programs."""

    def __init__(self, config: FasterRCNNConfig = FasterRCNNConfig(),
                 dtype=jnp.float32, pallas_roi: bool | None = None,
                 roi_patch_quant: bool | None = None,
                 roi_mode: str | None = None,
                 trunk_quant: str | None = None):
        import os
        from stlpose_tpu.ops.pallas_roi import use_pallas_roi
        self.config = config
        if pallas_roi is None:
            # resolved ONCE here, never under trace (env gate would
            # otherwise freeze at first jit trace — ADVICE r2 class)
            pallas_roi = use_pallas_roi()
        if roi_patch_quant is None:
            # int8 RoI patch pyramid (serving knob, default off; see
            # ops/pallas_roi.py patch_quant): resolved once, same class
            roi_patch_quant = (os.environ.get("STLPOSE_PALLAS_ROI_INT8")
                               or "0") != "0"
        if trunk_quant is None:
            # serving trunk flavor: "folded" (BN-folded f32/bf16 convs) or
            # "int8"/"int8u" (PTQ bottlenecks; variables must come from
            # quantize.quantize_frcnn_trunk). Same resolve-once rule.
            trunk_quant = (os.environ.get("STLPOSE_FRCNN_TRUNK_QUANT")
                           or "none")
        if trunk_quant not in ("none", "folded", "int8", "int8u"):
            raise ValueError(f"unknown trunk_quant {trunk_quant!r}")
        self.trunk_quant = trunk_quant
        self.module = FasterRCNNModule(
            config=config, dtype=dtype, pallas_roi=pallas_roi,
            roi_patch_quant=roi_patch_quant, roi_mode=roi_mode,
            trunk_folded=(trunk_quant != "none"),
            trunk_quant=("none" if trunk_quant == "folded"
                         else trunk_quant))
        s = config.image_size
        shapes = []
        for stride in config.strides:
            shapes.append(((s + stride - 1) // stride,
                           (s + stride - 1) // stride))
        self.level_shapes = shapes
        self.anchors = None     # filled lazily from traced shapes

    def init(self, rng, batch_size: int = 1):
        s = self.config.image_size
        return self.module.init(rng, jnp.zeros((batch_size, s, s, 3)),
                                method=FasterRCNNModule.full_init)

    def _get_anchors(self, logits):
        shapes = [(l.shape[1], l.shape[2]) for l in logits]
        return generate_anchors(self.config, shapes)

    # ------------------------------------------------------------- train
    def loss_fn(self, variables, batch, rng, train: bool = True):
        """Total loss + loss dict for a batch
        {image (N,S,S,3), boxes (N,K,4), labels (N,K), box_mask (N,K)}.
        Mirrors the torchvision loss dict the reference sums
        (02_train_faster_rcnn.py:212-213)."""
        if self.trunk_quant != "none":
            raise ValueError(
                "training requires the live-BN trunk; construct "
                "FasterRCNN(trunk_quant=None) for loss_fn "
                f"(got trunk_quant={self.trunk_quant!r})")
        cfg = self.config
        images = batch["image"]
        N = images.shape[0]
        out, updates = self.module.apply(
            variables, images, train=train, mutable=["batch_stats"],
            method=FasterRCNNModule.__call__)
        feats, logits, deltas = out
        anchors_l = self._get_anchors(logits)
        anchors = jnp.concatenate(anchors_l)

        rngs = jax.random.split(rng, N * 2).reshape(N, 2, -1)

        def per_image(lg, dl, feats_i, gt_boxes, gt_labels, gt_mask, rng2):
            # lg/dl/feats_i: tuples of per-level arrays for ONE image
            lg_flat = jnp.concatenate([l.reshape(-1) for l in lg])
            dl_flat = jnp.concatenate([d.reshape(-1, 4) for d in dl])
            l_obj, l_rpn_reg = rpn_loss(cfg, anchors, lg_flat, dl_flat,
                                        gt_boxes, gt_mask, rng2[0])
            props, _ = select_proposals(cfg, anchors_l, list(lg), list(dl),
                                        train)
            props = jax.lax.stop_gradient(props)
            boxes, labels, regs, pos, sampled = roi_targets(
                cfg, props, gt_boxes, gt_labels, gt_mask, rng2[1])
            cls_logits, box_deltas = self.module.apply(
                variables, list(feats_i), boxes,
                method=FasterRCNNModule.roi)
            l_cls, l_box = roi_loss(cfg, cls_logits, box_deltas, labels,
                                    regs, pos, sampled)
            return l_obj, l_rpn_reg, l_cls, l_box

        # vmap over the batch: ONE compiled copy of the per-image graph
        # instead of N unrolled copies (compile-size blow-up at batch 32)
        l_obj, l_rpn, l_cls, l_box = jax.vmap(per_image)(
            tuple(logits), tuple(deltas), tuple(feats[:4]),
            batch["boxes"], batch["labels"], batch["box_mask"], rngs)
        l_obj, l_rpn = l_obj.mean(), l_rpn.mean()
        l_cls, l_box = l_cls.mean(), l_box.mean()
        total = l_obj + l_rpn + l_cls + l_box
        loss_dict = {"loss_objectness": l_obj, "loss_rpn_box_reg": l_rpn,
                     "loss_classifier": l_cls, "loss_box_reg": l_box}
        return total, (loss_dict, updates["batch_stats"])

    # ----------------------------------------------------------- predict
    def predict(self, variables, images):
        """Detections for a batch: {boxes (N, D, 4), scores (N, D),
        labels (N, D), valid (N, D)} — torchvision-style output, padded to
        detections_per_img (reference consumes this via bbox_filtering,
        lib/bounding_box.py:127-168)."""
        cfg = self.config
        feats, logits, deltas = self.module.apply(variables, images,
                                                  train=False)
        anchors_l = self._get_anchors(logits)

        def select_one(lg, dl):
            props, _ = select_proposals(cfg, anchors_l, list(lg), list(dl),
                                        False)
            return props

        props_b = jax.vmap(select_one)(tuple(logits),
                                       tuple(deltas))       # (B, P, 4)
        # RoIAlign + box head over ALL images' proposals at once: the
        # fused Pallas kernel pipelines one per-box DMA chain across the
        # whole batch (ops/pallas_roi.py; XLA fallback inside)
        cls_b, deltas_b = self.module.apply(
            variables, [f for f in feats[:4]], props_b,
            method=FasterRCNNModule.roi_batched)

        def per_image(props, cls_logits, box_deltas):
            scores = jax.nn.softmax(cls_logits, axis=-1)
            out_boxes, out_scores, out_labels = [], [], []
            for c in range(1, cfg.num_classes):
                d = box_deltas.reshape(-1, cfg.num_classes, 4)[:, c]
                boxes = decode_boxes(d, props, cfg.box_weights)
                boxes = clip_boxes(boxes, (cfg.image_size, cfg.image_size))
                sc = scores[:, c]
                ok = sc > cfg.score_thresh
                keep = box_nms_jax(boxes, jnp.where(ok, sc, -jnp.inf),
                                   cfg.nms_thresh, valid_mask=ok,
                                   max_keep=cfg.detections_per_img)
                out_boxes.append(boxes)
                out_scores.append(jnp.where(keep & ok, sc, -jnp.inf))
                out_labels.append(jnp.full(sc.shape, c, jnp.int32))
            boxes = jnp.concatenate(out_boxes)
            sc = jnp.concatenate(out_scores)
            lb = jnp.concatenate(out_labels)
            top_s, top_i = jax.lax.top_k(sc, cfg.detections_per_img)
            return (boxes[top_i], jnp.maximum(top_s, 0.0), lb[top_i],
                    top_s > -jnp.inf)

        b, s, l, v = jax.vmap(per_image)(props_b, cls_b, deltas_b)
        return {"boxes": b, "scores": s, "labels": l, "valid": v}
