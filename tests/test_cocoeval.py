"""Known-value tests for the from-scratch COCO AP implementation
(stlpose_tpu/eval/cocoeval.py) and the COCO container."""

import numpy as np
import pytest

from stlpose_tpu.data.coco_api import COCO, coco_from_dataset
from stlpose_tpu.eval.cocoeval import COCOeval
from stlpose_tpu.eval.submission import (rescore_and_nms, to_coco_results,
                                         compute_detection_ap)


def make_gt_bbox(n_imgs=4, boxes_per_img=3, seed=0, size=64):
    rng = np.random.RandomState(seed)
    images, anns = [], []
    aid = 1
    for i in range(1, n_imgs + 1):
        images.append({"id": i, "height": 480, "width": 640})
        for _ in range(boxes_per_img):
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(size * 0.8, size * 1.2, 2)
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "area": float(w * h), "iscrowd": 0})
            aid += 1
    return COCO({"images": images, "annotations": anns,
                 "categories": [{"id": 1, "name": "person"}]})


def perfect_results(gt, score=0.9):
    return [{"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": list(a["bbox"]), "score": score}
            for a in gt.anns.values()]


class TestCOCOContainer:
    def test_index_and_queries(self):
        gt = make_gt_bbox()
        assert gt.getImgIds() == [1, 2, 3, 4]
        assert gt.getCatIds() == [1]
        assert len(gt.getAnnIds(imgIds=[1])) == 3
        assert len(gt.loadAnns(gt.getAnnIds())) == 12

    def test_loadres_area_and_keypoint_bbox(self):
        gt = make_gt_bbox()
        dt = gt.loadRes([{"image_id": 1, "category_id": 1,
                          "bbox": [10, 10, 20, 40], "score": 0.5}])
        ann = list(dt.anns.values())[0]
        assert ann["area"] == 800
        kp = [0.0] * 51
        kp[0:3] = [100, 50, 1]
        kp[3:6] = [140, 90, 1]
        dt2 = gt.loadRes([{"image_id": 1, "category_id": 1,
                           "keypoints": kp, "score": 0.5}])
        ann2 = list(dt2.anns.values())[0]
        assert ann2["bbox"] == [0.0, 0.0, 140.0, 90.0]


class TestBboxAP:
    def test_perfect_predictions_ap1(self):
        gt = make_gt_bbox()
        ev = COCOeval(gt, gt.loadRes(perfect_results(gt)), "bbox")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert stats[0] == pytest.approx(1.0)   # AP
        assert stats[8] == pytest.approx(1.0)   # AR@100

    def test_half_detected_ap_half(self):
        gt = make_gt_bbox(n_imgs=2, boxes_per_img=4)
        anns = list(gt.anns.values())
        res = [{"image_id": a["image_id"], "category_id": 1,
                "bbox": list(a["bbox"]), "score": 0.9}
               for a in anns[::2]]                 # every other GT
        ev = COCOeval(gt, gt.loadRes(res), "bbox")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        # 101-pt interpolation: precision 1 up to recall .5 -> AP = 51/101
        assert stats[0] == pytest.approx(51 / 101, abs=1e-6)

    def test_false_positive_lowers_ap(self):
        gt = make_gt_bbox(n_imgs=1, boxes_per_img=2)
        res = perfect_results(gt, score=0.8)
        res.append({"image_id": 1, "category_id": 1,
                    "bbox": [500, 400, 30, 30], "score": 0.95})  # FP on top
        ev = COCOeval(gt, gt.loadRes(res), "bbox")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert 0.5 < stats[0] < 1.0

    def test_crowd_gt_not_fp(self):
        # a detection overlapping only a crowd GT must not count as FP
        gt = make_gt_bbox(n_imgs=1, boxes_per_img=1)
        gt.dataset["annotations"].append(
            {"id": 99, "image_id": 1, "category_id": 1,
             "bbox": [500, 100, 60, 60], "area": 3600, "iscrowd": 1})
        gt.create_index()
        res = perfect_results(COCO({  # only the non-crowd GT
            "images": gt.dataset["images"],
            "annotations": [a for a in gt.dataset["annotations"]
                            if not a["iscrowd"]],
            "categories": gt.dataset["categories"]}))
        res.append({"image_id": 1, "category_id": 1,
                    "bbox": [505, 105, 50, 50], "score": 0.7})  # inside crowd
        ev = COCOeval(gt, gt.loadRes(res), "bbox")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert stats[0] == pytest.approx(1.0)

    def test_area_ranges_partition(self):
        # one small (16x16) one large (128x128) GT, both detected
        gt = COCO({"images": [{"id": 1, "height": 480, "width": 640}],
                   "annotations": [
                       {"id": 1, "image_id": 1, "category_id": 1,
                        "bbox": [10, 10, 16, 16], "area": 256, "iscrowd": 0},
                       {"id": 2, "image_id": 1, "category_id": 1,
                        "bbox": [200, 100, 128, 128], "area": 16384,
                        "iscrowd": 0}],
                   "categories": [{"id": 1, "name": "person"}]})
        ev = COCOeval(gt, gt.loadRes(perfect_results(gt)), "bbox")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert stats[3] == pytest.approx(1.0)   # AP small
        assert stats[5] == pytest.approx(1.0)   # AP large
        assert stats[4] == -1.0                 # AP medium: no GT


def make_gt_kpts(n_imgs=3, people=2, seed=1):
    rng = np.random.RandomState(seed)
    images, anns = [], []
    aid = 1
    for i in range(1, n_imgs + 1):
        images.append({"id": i, "height": 480, "width": 640})
        for _ in range(people):
            cx, cy = rng.uniform(150, 450), rng.uniform(150, 330)
            kp = []
            for k in range(17):
                kp += [float(cx + rng.uniform(-60, 60)),
                       float(cy + rng.uniform(-100, 100)), 2]
            xs, ys = np.array(kp[0::3]), np.array(kp[1::3])
            w, h = xs.max() - xs.min(), ys.max() - ys.min()
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "keypoints": kp, "num_keypoints": 17,
                         "bbox": [float(xs.min()), float(ys.min()),
                                  float(w), float(h)],
                         "area": float(w * h), "iscrowd": 0})
            aid += 1
    return COCO({"images": images, "annotations": anns,
                 "categories": [{"id": 1, "name": "person"}]})


class TestKeypointAP:
    def test_perfect_keypoints_ap1(self):
        gt = make_gt_kpts()
        res = [{"image_id": a["image_id"], "category_id": 1,
                "keypoints": list(a["keypoints"]), "score": 0.9}
               for a in gt.anns.values()]
        ev = COCOeval(gt, gt.loadRes(res), "keypoints")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert stats[0] == pytest.approx(1.0)
        assert stats[5] == pytest.approx(1.0)   # AR

    def test_jitter_degrades_high_thresholds(self):
        gt = make_gt_kpts(n_imgs=4, people=3)
        rng = np.random.RandomState(3)
        res = []
        for a in gt.anns.values():
            kp = np.array(a["keypoints"], np.float64).reshape(17, 3)
            sigma_px = np.sqrt(a["area"]) * 0.1
            kp[:, :2] += rng.randn(17, 2) * sigma_px
            res.append({"image_id": a["image_id"], "category_id": 1,
                        "keypoints": kp.reshape(-1).tolist(), "score": 0.9})
        ev = COCOeval(gt, gt.loadRes(res), "keypoints")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert stats[1] > stats[2] or stats[0] < 1.0  # jitter visible
        assert 0.0 <= stats[0] < 1.0

    def test_unlabeled_gt_ignored(self):
        gt = make_gt_kpts(n_imgs=1, people=1)
        gt.dataset["annotations"].append(
            {"id": 50, "image_id": 1, "category_id": 1,
             "keypoints": [0] * 51, "num_keypoints": 0,
             "bbox": [0, 0, 50, 50], "area": 2500, "iscrowd": 0})
        gt.create_index()
        res = [{"image_id": a["image_id"], "category_id": 1,
                "keypoints": list(a["keypoints"]), "score": 0.9}
               for a in gt.anns.values() if a["num_keypoints"] > 0]
        ev = COCOeval(gt, gt.loadRes(res), "keypoints")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert stats[0] == pytest.approx(1.0)


class TestSubmission:
    def test_rescoring_formula(self):
        preds = np.zeros((1, 17, 3))
        preds[0, :, 2] = 0.6                       # all joints above thr
        boxes = np.array([[100, 100, 1, 1, 200 * 200, 0.5]])
        out = rescore_and_nms(preds, boxes, [7])
        assert out[0][0]["score"] == pytest.approx(0.6 * 0.5)

    def test_below_thr_joints_excluded(self):
        preds = np.zeros((1, 17, 3))
        preds[0, :5, 2] = 0.8
        preds[0, 5:, 2] = 0.1                      # below in_vis_thr=0.2
        boxes = np.array([[100, 100, 1, 1, 200 * 200, 1.0]])
        out = rescore_and_nms(preds, boxes, [7])
        assert out[0][0]["score"] == pytest.approx(0.8)

    def test_to_coco_results_format(self):
        preds = np.random.RandomState(0).rand(2, 17, 3)
        boxes = np.array([[10, 10, 1, 1, 100, 0.9], [20, 20, 1, 1, 100, 0.8]])
        out = rescore_and_nms(preds, boxes, [1, 2])
        recs = to_coco_results(out)
        assert {r["image_id"] for r in recs} == {1, 2}
        assert all(len(r["keypoints"]) == 51 for r in recs)

    def test_end_to_end_detection_ap(self, tmp_path):
        gt = make_gt_bbox(n_imgs=2, boxes_per_img=2)
        stats = compute_detection_ap(perfect_results(gt), gt)
        assert stats[0] == pytest.approx(1.0)


class TestCocoFromDataset:
    def test_builds_valid_gt(self):
        samples = [{"image_id": 1, "height": 100, "width": 100,
                    "boxes": np.array([[10, 10, 50, 60]]), "labels": [1]}]
        gt = coco_from_dataset(samples)
        assert gt.getImgIds() == [1]
        a = gt.loadAnns(gt.getAnnIds())[0]
        assert a["bbox"] == [10.0, 10.0, 40.0, 50.0]
        assert a["area"] == pytest.approx(2000.0)
