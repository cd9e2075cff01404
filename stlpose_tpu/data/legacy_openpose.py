"""Legacy OpenPose-era target generators: full-image keypoint heatmaps and
Part Affinity Fields (PAFs).

Working re-design of the reference's bottom-up data helpers
(reference: data/data_processing.py:213-263 ``generate_heatmaps`` /
``add_gaussian``, :294-397 ``generate_paf`` / ``set_paf``). In the
reference these feed no live training path (the top-down HRNet pipeline
uses per-crop targets, ops/heatmap.py here) and depend on module globals
(``BODY_PARTS_KPT_IDS`` is ``None`` until a caller sets it,
data_processing.py:29); they are kept for debugging/visualization parity.
This version is vectorized over the pixel grid and people (no per-pixel
loops), takes the limb table as an explicit argument, and returns zeros
instead of NaN for zero-person images (the reference's ``np.mean`` over an
empty axis emits NaN — a defect, not a behavior worth replicating).

Semantics preserved exactly for >=1 person (pinned by
tests/test_legacy_openpose.py against a literal windowed-loop oracle):

  heatmaps: per keypoint, a 15x15 window of exp(-(dx^2+dy^2)/sigma^2)
    (offsets -7..7, NOTE: /sigma^2, not /(2 sigma^2) — the reference's
    kernel, data_processing.py:203) stamped at the INTEGER keypoint
    location for every person with v>0, MAX-combined over people; a final
    background channel 1 - max over keypoints.
  pafs: per limb (a, b), two channels holding the unit vector (x, y)
    components on pixels within ``thickness`` of the infinite line through
    a and b, restricted to the limb's bbox dilated by ``thickness``
    ([min-t, max+t) — the reference's asymmetric window), MEAN-combined
    over ALL people (invisible limbs contribute zero maps to the mean).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

# COCO-keypoint limb pairs in the OpenPose ordering the reference's callers
# injected into BODY_PARTS_KPT_IDS (17-keypoint COCO skeleton)
COCO_LIMBS = (
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
)

_WIN = 7  # the reference's fixed 15x15 kernel half-window


def _keypoints_array(annotations: Sequence[dict], n_keypoints: int):
    """(P, J, 3) float array from COCO-style flat keypoint lists."""
    if not annotations:
        return np.zeros((0, n_keypoints, 3), np.float32)
    kpts = np.asarray([a["keypoints"] for a in annotations], np.float32)
    return kpts.reshape(len(annotations), -1, 3)


def generate_heatmaps(image_shape, annotations: Sequence[dict],
                      sigma: float = 10.0, n_keypoints: int = 17):
    """Full-image per-keypoint Gaussian heatmaps + background channel.

    Args:
      image_shape: (H, W) or (H, W, C) of the source image.
      annotations: COCO-style annotation dicts with 'keypoints'.
      sigma: kernel std (reference default 10, data_processing.py:213).

    Returns:
      (n_keypoints + 1, H, W) float32; last channel is the background map
      ``1 - max_k heatmap_k`` (data_processing.py:251).
    """
    H, W = int(image_shape[0]), int(image_shape[1])
    kpts = _keypoints_array(annotations, n_keypoints)
    if kpts.shape[1] < n_keypoints:
        n_keypoints = kpts.shape[1]
    maps = np.zeros((n_keypoints + 1, H, W), np.float32)

    gy = np.arange(H, dtype=np.float32)[:, None]
    gx = np.arange(W, dtype=np.float32)[None, :]
    for p in range(kpts.shape[0]):
        for k in range(n_keypoints):
            x, y, v = kpts[p, k]
            if v <= 0:
                continue
            # integer stamping position (the reference indexes the fixed
            # kernel with integer offsets)
            xi, yi = int(x), int(y)
            dx = gx - xi
            dy = gy - yi
            g = np.exp(-(dx ** 2 + dy ** 2) / (sigma ** 2))
            window = ((np.abs(dx) <= _WIN) & (np.abs(dy) <= _WIN))
            maps[k] = np.maximum(maps[k], np.where(window, g, 0.0))
    maps[-1] = 1.0 - maps[:-1].max(axis=0)
    return maps


def generate_pafs(image_shape, annotations: Sequence[dict],
                  limbs: Sequence[tuple] = COCO_LIMBS,
                  thickness: float = 5.0, n_keypoints: int = 17):
    """Part Affinity Fields for every limb.

    Returns:
      (2 * len(limbs), H, W) float32 — channels (2i, 2i+1) hold the limb's
      unit-vector (x, y) components (the reference's coordinate swap in
      set_paf, data_processing.py:372-373, nets out to (dx, dy)/norm in
      image x/y), averaged over people.
    """
    H, W = int(image_shape[0]), int(image_shape[1])
    kpts = _keypoints_array(annotations, n_keypoints)
    P = kpts.shape[0]
    out = np.zeros((2 * len(limbs), H, W), np.float32)
    if P == 0:
        return out

    gy = np.arange(H, dtype=np.float32)[:, None]
    gx = np.arange(W, dtype=np.float32)[None, :]
    for i, (ia, ib) in enumerate(limbs):
        acc_x = np.zeros((H, W), np.float32)
        acc_y = np.zeros((H, W), np.float32)
        for p in range(P):
            if ia >= kpts.shape[1] or ib >= kpts.shape[1]:
                continue
            ax, ay, av = kpts[p, ia]
            bx, by, bv = kpts[p, ib]
            if av <= 0 or bv <= 0:
                continue
            dx, dy = bx - ax, by - ay
            norm = float(np.hypot(dx, dy))
            if norm < 1e-7:
                continue
            ux, uy = dx / norm, dy / norm
            # bbox window dilated by thickness; the reference's upper edge
            # is exclusive WITHOUT +1 ([min-t, max+t)), reproduced here
            x_min = int(max(min(ax, bx) - thickness, 0))
            y_min = int(max(min(ay, by) - thickness, 0))
            x_max = int(min(max(ax, bx) + thickness, W))
            y_max = int(min(max(ay, by) + thickness, H))
            window = ((gx >= x_min) & (gx < x_max) &
                      (gy >= y_min) & (gy < y_max))
            # distance to the infinite line through a-b (cross product)
            d = np.abs((gx - ax) * uy - (gy - ay) * ux)
            hit = window & (d <= thickness)
            acc_x += np.where(hit, ux, 0.0)
            acc_y += np.where(hit, uy, 0.0)
        out[2 * i] = acc_x / P
        out[2 * i + 1] = acc_y / P
    return out
