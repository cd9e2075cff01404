"""
OKS and IoU non-maximum suppression.

The greedy keep-order semantics (score sort, sequential suppression) matter
for COCO AP parity, so the canonical implementations here are host-numpy with
the pairwise similarity matrices fully vectorized
(reference: lib/nms.py:10-123). A device-side masked-greedy variant built on
``lax.while_loop`` is provided for pipelines that want to stay on-chip.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stlpose_tpu import constants


def oks_iou(g, d, a_g, a_d, sigmas=None, in_vis_thre=None):
    """OKS between one pose ``g`` (51,) and poses ``d`` (M, 51).

    Vectorized over both candidates and keypoints; numerically identical to
    the reference loop (lib/nms.py:49-74) on the live path
    (``in_vis_thre=None``, which every in-repo caller uses).

    Deliberate deviation: with ``in_vis_thre`` set, the reference computes
    ``list(vg > t) and list(vd > t)`` — a Python ``and`` of two lists that
    evaluates to the *det-only* mask, ignoring GT visibility. This version
    applies the true elementwise gt&det AND and averages over the masked
    count, i.e. it implements what that branch plainly intended rather than
    replicating the defect (ADVICE r1; defect catalogued in SURVEY §2.10
    spirit).
    """
    if sigmas is None:
        sigmas = constants.OKS_SIGMAS
    var = (np.asarray(sigmas) * 2.0) ** 2
    g = np.asarray(g, np.float64)
    d = np.asarray(d, np.float64).reshape(len(d), len(g))
    if d.shape[0] == 0:
        return np.zeros((0,))
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    xd, yd, vd = d[:, 0::3], d[:, 1::3], d[:, 2::3]
    denom = ((a_g + np.asarray(a_d)) / 2.0 + np.spacing(1))[:, None]
    e = ((xd - xg) ** 2 + (yd - yg) ** 2) / var[None, :] / denom / 2.0
    if in_vis_thre is not None:
        mask = (vg[None, :] > in_vis_thre) & (vd > in_vis_thre)
        cnt = mask.sum(axis=1)
        s = np.where(mask, np.exp(-e), 0.0).sum(axis=1)
        return np.where(cnt > 0, s / np.maximum(cnt, 1), 0.0)
    return np.exp(-e).mean(axis=1)


def oks_nms(kpts_db, thresh, sigmas=None, in_vis_thre=None):
    """Greedy OKS-NMS over a list of {'score', 'keypoints', 'area'} dicts.

    Same contract and keep-order as the reference (lib/nms.py:10-46).
    """
    if len(kpts_db) == 0:
        return []
    scores = np.array([k["score"] for k in kpts_db], np.float64)
    kpts = np.array([np.asarray(k["keypoints"]).flatten() for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db], np.float64)

    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        ovr = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                      sigmas, in_vis_thre)
        order = order[1:][ovr <= thresh]
    return keep


def box_nms(dets, thresh):
    """Greedy IoU NMS over (M, 5) [x1, y1, x2, y2, score] boxes.

    Same +1 area convention and keep-order as the reference
    (lib/nms.py:77-123).
    """
    dets = np.asarray(dets, np.float64)
    if dets.shape[0] == 0:
        return []
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
        ovr = inter / (areas[i] + areas[rest] - inter)
        order = rest[ovr <= thresh]
    return keep


def soft_oks_nms(kpts_db, thresh, max_dets: int = 20, sigmas=None,
                 in_vis_thre=None):
    """Soft OKS-NMS: instead of suppressing overlapping poses, decay their
    scores by exp(-oks^2 / thresh) and re-rank.

    The reference *calls* ``soft_oks_nms`` when ``self.soft_nms`` is set but
    never defines either (HRNet_Coco.py:440-441 — dead path); this is the
    working implementation following the HRNet codebase's published
    algorithm. Returns kept indices ordered by final score.
    """
    if len(kpts_db) == 0:
        return []
    scores = np.array([k["score"] for k in kpts_db], np.float64).copy()
    kpts = np.array([np.asarray(k["keypoints"]).flatten() for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db], np.float64)

    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0 and len(keep) < max_dets:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        oks = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                      sigmas, in_vis_thre)
        decay = np.exp(-(oks ** 2) / thresh)
        scores[order[1:]] *= decay
        rest = order[1:]
        rest = rest[scores[rest].argsort()[::-1]]
        order = rest
    return keep


# --------------------------------------------------------------- device side

def box_nms_jax(boxes, scores, iou_threshold, valid_mask=None,
                max_keep=None):
    """Static-shape greedy IoU NMS on device.

    Returns a keep mask of shape (M,) — no dynamic pruning, so the op jits
    cleanly under ``pjit``/``vmap`` (the XLA-friendly form of the reference's
    dynamic keep-list). Suppression follows exact greedy order: candidates
    are visited by descending score inside a ``fori_loop``.

    ``max_keep``: if set, run the pick-argmax formulation instead — each
    iteration selects the best alive candidate and suppresses its
    neighborhood, terminating after ``max_keep`` picks. The kept set is
    exactly the first ``max_keep`` greedy survivors, which is the full
    answer for every caller that follows NMS with ``top_k(max_keep)``
    (proposal selection, per-class detection NMS). Sequential-loop length
    drops from M (all candidates, e.g. 2500 RPN proposals) to max_keep
    (e.g. 256) — the dominant cost of NMS on TPU is per-iteration loop
    overhead, so this is ~M/max_keep faster.

    Args:
      boxes: (M, 4) xyxy; scores: (M,); valid_mask: optional (M,) bool.
    Returns:
      keep: (M,) bool mask of survivors.
    """
    M = boxes.shape[0]
    if max_keep is not None:
        return _box_nms_topk(boxes, scores, iou_threshold, valid_mask,
                             min(max_keep, M))
    if valid_mask is None:
        valid_mask = jnp.ones((M,), bool)
    order = jnp.argsort(-scores)
    b = boxes[order]
    v = valid_mask[order]

    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    areas = jnp.maximum(0.0, x2 - x1) * jnp.maximum(0.0, y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(0.0, xx2 - xx1) * jnp.maximum(0.0, yy2 - yy1)
    iou = inter / jnp.maximum(areas[:, None] + areas[None, :] - inter, 1e-9)

    def body(i, keep):
        alive = keep[i] & v[i]
        suppress = (iou[i] > iou_threshold) & alive
        # only suppress later (lower-score) candidates
        later = jnp.arange(M) > i
        return keep & ~(suppress & later)

    keep_sorted = jax.lax.fori_loop(0, M, body, v)
    # scatter back to original order
    keep = jnp.zeros((M,), bool).at[order].set(keep_sorted)
    return keep


def _box_nms_topk(boxes, scores, iou_threshold, valid_mask, max_keep):
    """Pick-argmax greedy NMS: max_keep sequential picks, IoU row computed
    on the fly (no M x M matrix). Ties broken by lowest index, matching
    the stable-sort order of the full formulation."""
    M = boxes.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((M,), bool)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.maximum(0.0, x2 - x1) * jnp.maximum(0.0, y2 - y1)
    alive0 = valid_mask & (scores > -jnp.inf)
    idx = jnp.arange(M)

    def body(_, state):
        keep, alive = state
        s = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(s)
        ok = alive[i]
        bx1, by1, bx2, by2 = boxes[i, 0], boxes[i, 1], boxes[i, 2], \
            boxes[i, 3]
        inter = (jnp.maximum(0.0, jnp.minimum(x2, bx2) -
                             jnp.maximum(x1, bx1)) *
                 jnp.maximum(0.0, jnp.minimum(y2, by2) -
                             jnp.maximum(y1, by1)))
        iou = inter / jnp.maximum(areas + areas[i] - inter, 1e-9)
        keep = keep | ((idx == i) & ok)
        # Remove the pick explicitly: a zero-area box has self-IoU 0, so
        # relying on "own IoU is 1" would re-pick the same degenerate box
        # forever and silently drop all lower-scored candidates.
        alive = jnp.where(ok, alive & ~(iou > iou_threshold) & (idx != i),
                          alive)
        return keep, alive

    keep, _ = jax.lax.fori_loop(0, max_keep, body,
                                (jnp.zeros((M,), bool), alive0))
    return keep
