"""COCOeval edge semantics: maxDets truncation, score-ordered matching,
AR maxDets tiers, duplicate suppression."""

import numpy as np
import pytest

from stlpose_tpu.data.coco_api import COCO
from stlpose_tpu.eval.cocoeval import COCOeval


def _gt_one_box():
    return COCO({"images": [{"id": 1, "height": 200, "width": 200}],
                 "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                                  "bbox": [50, 50, 60, 60], "area": 3600,
                                  "iscrowd": 0}],
                 "categories": [{"id": 1, "name": "person"}]})


class TestEdgeSemantics:
    def test_duplicates_counted_as_fp(self):
        gt = _gt_one_box()
        res = [{"image_id": 1, "category_id": 1, "bbox": [50, 50, 60, 60],
                "score": 0.9},
               {"image_id": 1, "category_id": 1, "bbox": [51, 51, 60, 60],
                "score": 0.8}]          # duplicate -> FP
        ev = COCOeval(gt, gt.loadRes(res), "bbox")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        # precision at full recall is 1.0 only up to the duplicate; AP@0.5
        # stays 1.0 because the TP ranks first
        assert stats[1] == pytest.approx(1.0)

    def test_higher_score_wins_match(self):
        gt = _gt_one_box()
        # lower-scored box is a BETTER fit, but the higher-scored one
        # matches first (greedy by score) and still passes 0.5 IoU
        res = [{"image_id": 1, "category_id": 1, "bbox": [55, 55, 60, 60],
                "score": 0.9},
               {"image_id": 1, "category_id": 1, "bbox": [50, 50, 60, 60],
                "score": 0.1}]
        ev = COCOeval(gt, gt.loadRes(res), "bbox")
        ev.evaluate(); ev.accumulate()
        ev.summarize()
        e = ev.evalImgs[(1, 1, 0)]      # area 'all'
        t0 = 0                          # IoU=0.5 row
        assert e["dtm"][t0, 0] == 1     # high-score det got the GT
        assert e["dtm"][t0, 1] == 0     # better-fitting low-score det: FP

    def test_maxdets_truncation_in_ar(self):
        # 3 GTs, detections ranked so only the top-1 hits under maxDets=1
        gt = COCO({"images": [{"id": 1, "height": 400, "width": 400}],
                   "annotations": [
                       {"id": k, "image_id": 1, "category_id": 1,
                        "bbox": [100 * k, 100, 50, 50], "area": 2500,
                        "iscrowd": 0} for k in (1, 2, 3)],
                   "categories": [{"id": 1, "name": "person"}]})
        res = [{"image_id": 1, "category_id": 1,
                "bbox": [100 * k, 100, 50, 50], "score": 1.0 - 0.1 * k}
               for k in (1, 2, 3)]
        ev = COCOeval(gt, gt.loadRes(res), "bbox")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert stats[6] == pytest.approx(1 / 3)   # AR@1
        assert stats[8] == pytest.approx(1.0)     # AR@100

    def test_restricting_img_ids(self):
        gt = COCO({"images": [{"id": 1, "height": 100, "width": 100},
                              {"id": 2, "height": 100, "width": 100}],
                   "annotations": [
                       {"id": 1, "image_id": 1, "category_id": 1,
                        "bbox": [10, 10, 40, 40], "area": 1600, "iscrowd": 0},
                       {"id": 2, "image_id": 2, "category_id": 1,
                        "bbox": [10, 10, 40, 40], "area": 1600,
                        "iscrowd": 0}],
                   "categories": [{"id": 1, "name": "person"}]})
        # predictions only for image 1
        res = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40],
                "score": 0.9}]
        ev = COCOeval(gt, gt.loadRes(res), "bbox")
        ev.params.imgIds = [1]          # restrict (compute_precision path)
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert stats[0] == pytest.approx(1.0)     # image 2's miss excluded
