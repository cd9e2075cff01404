"""
Box geometry for detection: IoU matrices, delta encode/decode, clipping,
smooth-L1 — all batched, static-shape, jit-friendly.

These replace the torchvision/C++ box utilities the reference's detectors
lean on (reference: models/utils/bbox_tools.py:8-194, torchvision ops used
in lib/bounding_box.py:171-208 and models/efficientdet_utils/utils.py).
Boxes are xyxy float32 unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp

# torchvision BoxCoder convention
BBOX_XFORM_CLIP = 4.135166556742356    # log(1000/16)


def box_iou(a, b):
    """Pairwise IoU between (N, 4) and (M, 4) xyxy boxes -> (N, M)."""
    area_a = jnp.maximum(0.0, a[:, 2] - a[:, 0]) * \
        jnp.maximum(0.0, a[:, 3] - a[:, 1])
    area_b = jnp.maximum(0.0, b[:, 2] - b[:, 0]) * \
        jnp.maximum(0.0, b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(0.0, rb - lt)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def encode_boxes(reference, proposals, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode reference (GT) boxes as deltas w.r.t. proposals/anchors."""
    wx, wy, ww, wh = weights
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], 1e-6)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], 1e-6)
    gx = (reference[..., 0] + reference[..., 2]) * 0.5
    gy = (reference[..., 1] + reference[..., 3]) * 0.5
    gw = jnp.maximum(reference[..., 2] - reference[..., 0], 1e-6)
    gh = jnp.maximum(reference[..., 3] - reference[..., 1], 1e-6)
    return jnp.stack([
        wx * (gx - px) / pw, wy * (gy - py) / ph,
        ww * jnp.log(gw / pw), wh * jnp.log(gh / ph)], axis=-1)


def decode_boxes(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Apply predicted deltas to anchors/proposals -> xyxy boxes."""
    wx, wy, ww, wh = weights
    px = (boxes[..., 0] + boxes[..., 2]) * 0.5
    py = (boxes[..., 1] + boxes[..., 3]) * 0.5
    pw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    ph = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, max=BBOX_XFORM_CLIP)
    cx = dx * pw + px
    cy = dy * ph + py
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def clip_boxes(boxes, size_hw):
    """Clip xyxy boxes to [0, W] x [0, H]."""
    h, w = size_hw
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0.0, w), jnp.clip(boxes[..., 1], 0.0, h),
        jnp.clip(boxes[..., 2], 0.0, w), jnp.clip(boxes[..., 3], 0.0, h)],
        axis=-1)


def smooth_l1(pred, target, beta: float = 1.0 / 9.0):
    """Elementwise smooth-L1 (Huber) used by the detector regression
    losses."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


def box_area(boxes):
    return jnp.maximum(0.0, boxes[..., 2] - boxes[..., 0]) * \
        jnp.maximum(0.0, boxes[..., 3] - boxes[..., 1])
