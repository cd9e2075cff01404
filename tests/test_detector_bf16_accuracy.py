"""Accuracy bounds for the bf16 DETECTOR serving configurations — the
mirror of tests/test_bf16_accuracy.py for both detector families (the
README's 421 imgs/s Faster R-CNN and 1,202 imgs/s EfficientDet-D0 bf16
headlines).

The instrument: overfit each tiny detector on a synthetic scene batch
until its detections are meaningful, then run the SAME trained variables
through the f32 and bf16 predict programs and bound (a) GT-anchored
localization (for every GT box, the best detection's IoU must not degrade
under bf16), (b) matched-detection score drift, (c) confident-detection
counts, and (d) the bbox-AP delta through the full eval/cocoeval.py
pipeline. bf16 perturbations pass through sigmoid/softmax score
thresholding and greedy-NMS tie-breaking — discontinuous ops where drift
becomes a different detection set; the instrument shows that effect is
confined to duplicate suppression (pairwise partner IoU has a low tail)
while localization of every GT object and the AP statistic stay put.

Reference eval path being bounded: 03_evaluate_faster_rcnn.py:119-173
(predict -> CocoEvaluator bbox AP).

EfficientDet note: its BatchNorms run momentum-0.99 running averages
(efficientnet.py:62-63); after a short overfit the running stats lag the
final params badly enough to crush eval-mode scores, so the fixture
refreshes batch_stats with forward-only passes at fixed params before
snapshotting — the equivalent of the long tail of real training, not a
behavioral divergence.

Set STLPOSE_BF16_CALIBRATE=1 to print the measured statistics without
asserting (bound-calibration mode).
"""

import contextlib
import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.data.coco_api import coco_from_dataset
from stlpose_tpu.eval.submission import compute_detection_ap
from stlpose_tpu.ops.boxes import box_iou
from tests.detector_overfit import S, N, make_scenes, overfit_detector


def _gt_coco(batch):
    gt_boxes = np.asarray(batch["boxes"])
    gt_mask = np.asarray(batch["box_mask"])
    samples = []
    for i in range(N):
        m = gt_mask[i].astype(bool)
        samples.append({"image_id": i + 1, "height": S, "width": S,
                        "boxes": gt_boxes[i][m],
                        "labels": [1] * int(m.sum())})
    return coco_from_dataset(samples,
                             categories=[{"id": 1, "name": "person"}])


def _bbox_ap(dets, gt):
    res = []
    for i in range(N):
        for j in np.nonzero(dets["valid"][i])[0]:
            x1, y1, x2, y2 = dets["boxes"][i, j]
            res.append({"image_id": i + 1, "category_id": 1,
                        "bbox": [float(x1), float(y1), float(x2 - x1),
                                 float(y2 - y1)],
                        "score": float(dets["scores"][i, j])})
    if not res:
        return np.full(12, -1.0)
    with contextlib.redirect_stdout(io.StringIO()):
        return compute_detection_ap(res, gt)


def _stats(d32, d16, batch):
    """All measured comparison statistics between the two dtype paths."""
    gt = _gt_coco(batch)
    ap32, ap16 = _bbox_ap(d32, gt), _bbox_ap(d16, gt)

    # GT-anchored localization: best detection IoU per GT box, per dtype
    gtb = np.asarray(batch["boxes"])
    gtm = np.asarray(batch["box_mask"])
    g32, g16 = [], []
    for i in range(N):
        for g in gtb[i][gtm[i].astype(bool)]:
            for d, acc in ((d32, g32), (d16, g16)):
                v = d["valid"][i] & (d["scores"][i] > 0.3)
                if v.sum() == 0:
                    acc.append(0.0)
                    continue
                M = np.asarray(box_iou(jnp.asarray(g[None]),
                                       jnp.asarray(d["boxes"][i][v])))[0]
                acc.append(float(M.max()))
    g32, g16 = np.asarray(g32), np.asarray(g16)

    # pairwise: each confident f32 detection's best bf16 partner
    ious, sdrift = [], []
    for i in range(N):
        v32 = d32["valid"][i] & (d32["scores"][i] > 0.5)
        v16 = d16["valid"][i]
        if v32.sum() == 0 or v16.sum() == 0:
            continue
        M = np.asarray(box_iou(jnp.asarray(d32["boxes"][i][v32]),
                               jnp.asarray(d16["boxes"][i][v16])))
        best = M.argmax(axis=1)
        ious.extend(M.max(axis=1).tolist())
        sdrift.extend(np.abs(d32["scores"][i][v32] -
                             d16["scores"][i][v16][best]).tolist())
    n32 = int((d32["valid"] & (d32["scores"] > 0.5)).sum())
    n16 = int((d16["valid"] & (d16["scores"] > 0.5)).sum())
    return {"ap32": ap32, "ap16": ap16, "gt_iou32": g32, "gt_iou16": g16,
            "pair_iou": np.asarray(ious), "sdrift": np.asarray(sdrift),
            "n32": n32, "n16": n16}


def _compare(det_f32, det_bf16, trained, batch, tag, bounds):
    d32 = {k: np.asarray(v) for k, v in
           jax.jit(det_f32.predict)(trained, batch["image"]).items()}
    d16 = {k: np.asarray(jnp.asarray(v).astype(jnp.float32))
           if np.asarray(v).dtype != bool else np.asarray(v)
           for k, v in
           jax.jit(det_bf16.predict)(trained, batch["image"]).items()}

    st = _stats(d32, d16, batch)
    ap32, ap16 = st["ap32"], st["ap16"]
    dap = ap16[0] - ap32[0]
    print(f"{tag}: f32 AP {ap32[0]:.4f}/AP50 {ap32[1]:.4f} | bf16 AP "
          f"{ap16[0]:.4f}/AP50 {ap16[1]:.4f} | dAP {dap:+.4f} | GT-IoU "
          f"f32 min {st['gt_iou32'].min():.3f} mean "
          f"{st['gt_iou32'].mean():.3f} bf16 min {st['gt_iou16'].min():.3f}"
          f" |diff|max {np.abs(st['gt_iou32'] - st['gt_iou16']).max():.3f} "
          f"| pair IoU med {np.median(st['pair_iou']):.3f} min "
          f"{st['pair_iou'].min():.3f} | sdrift p95 "
          f"{np.quantile(st['sdrift'], 0.95):.3f} max "
          f"{st['sdrift'].max():.3f} | conf {st['n32']}/{st['n16']}")
    if os.environ.get("STLPOSE_BF16_CALIBRATE"):
        return st

    # (a) GT-anchored localization: every object found by f32 is found by
    #     bf16 at comparable IoU (no object lost, no box degraded beyond
    #     NMS duplicate-selection jitter)
    assert st["gt_iou32"].min() > bounds["gt_iou_min"]
    assert st["gt_iou16"].min() > bounds["gt_iou_min"]
    assert np.abs(st["gt_iou32"] - st["gt_iou16"]).max() < \
        bounds["gt_iou_diff"]
    # (b) the TYPICAL confident detection is box-stable; the low tail is
    #     duplicate-suppression jitter, which AP (d) prices correctly
    assert len(st["pair_iou"]) >= 8
    assert float(np.median(st["pair_iou"])) > 0.85
    assert float(np.quantile(st["sdrift"], 0.95)) < bounds["sdrift_p95"]
    # (c) confident-detection counts agree
    assert abs(st["n32"] - st["n16"]) <= max(2, int(0.1 * st["n32"]))
    # (d) bbox AP through eval/cocoeval.py: both meaningful, delta bounded
    assert ap32[1] > bounds["ap50_floor"] and ap16[1] > bounds["ap50_floor"]
    assert abs(dap) < bounds["dap"], f"bf16 detector dAP {dap:+.4f}"
    return st


class TestDetectorBf16Accuracy:
    def test_faster_rcnn(self, detector_scene_batch, trained_tiny_frcnn):
        from stlpose_tpu.models.faster_rcnn import (FasterRCNN,
                                                    FASTER_RCNN_TINY)
        det, trained = trained_tiny_frcnn
        det16 = FasterRCNN(FASTER_RCNN_TINY, dtype=jnp.bfloat16)
        _compare(det, det16, trained, detector_scene_batch,
                 "faster_rcnn bf16",
                 bounds={"gt_iou_min": 0.6, "gt_iou_diff": 0.2,
                         "sdrift_p95": 0.2, "ap50_floor": 0.9,
                         "dap": 0.06})

    def test_efficientdet(self):
        """EfficientDet uses the CLEAN single-large-object harness: with
        multi-object scenes its anchor-dense tiny head emits ~4x duplicate
        confident detections whose near-tie ordering makes strict AP an
        unstable statistic under ANY epsilon perturbation (calibrated at
        400 and 800 overfit steps: localization and score drift converge,
        set-level strict AP does not). One unambiguous object per scene
        gives a clean detection set where the AP delta is meaningful."""
        from stlpose_tpu.models.efficientdet import (EfficientDet,
                                                     EFFICIENTDET_TINY)
        batch = make_scenes(max_objects=1, size_range=(48, 80))
        det = EfficientDet(EFFICIENTDET_TINY)
        trained = overfit_detector(det, batch, steps=400,
                                   refresh_steps=300)
        det16 = EfficientDet(EFFICIENTDET_TINY, dtype=jnp.bfloat16)
        _compare(det, det16, trained, batch, "efficientdet bf16",
                 bounds={"gt_iou_min": 0.5, "gt_iou_diff": 0.25,
                         "sdrift_p95": 0.15, "ap50_floor": 0.6,
                         "dap": 0.08})
