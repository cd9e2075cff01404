"""Differential validation of eval/cocoeval.py (VERDICT r1 item 4).

The vectorized COCOeval is fuzzed on randomized detection/GT scenes —
crowds, ignores, empty images, score ties, all area ranges, both iouTypes —
against TWO independent partners:

  * tests/oracle_cocoeval.py, a literal loop-form reimplementation of the
    published protocol sharing no code or vectorization structure, which
    runs everywhere (pycocotools is not installed in this image);
  * pycocotools itself, when available (skipped otherwise), via the same
    case generator.

All 10/12 summary stats must agree to 1e-9 on every case.
"""

import numpy as np
import pytest

from stlpose_tpu.data.coco_api import COCO
from stlpose_tpu.eval.cocoeval import COCOeval
from tests.oracle_cocoeval import evaluate_oracle


def _rand_box(rng, size=640.0):
    # log-uniform areas so small/medium/large ranges all populate
    area = float(np.exp(rng.uniform(np.log(8.0 ** 2), np.log(300.0 ** 2))))
    ar = float(rng.uniform(0.4, 2.5))
    w = np.sqrt(area * ar)
    h = area / w
    x = float(rng.uniform(0, max(1.0, size - w)))
    y = float(rng.uniform(0, max(1.0, size - h)))
    return [x, y, float(w), float(h)]


def _score(rng):
    s = float(rng.uniform(0.05, 1.0))
    if rng.rand() < 0.4:
        s = round(s, 1)        # quantized scores exercise stable-sort ties
    return s


def _rand_kpts(rng, box, n_vis=None):
    x, y, w, h = box
    kx = rng.uniform(x, x + w, 17)
    ky = rng.uniform(y, y + h, 17)
    if n_vis is None:
        v = rng.choice([0, 1, 2], size=17, p=[0.3, 0.3, 0.4])
    else:
        v = np.zeros(17)
        v[rng.permutation(17)[:n_vis]] = 2
    return np.stack([kx, ky, v], axis=1).reshape(-1).tolist()


def make_case(rng, iou_type):
    """One random scene: GT dataset dict + detection result list."""
    img_ids = list(range(1, rng.randint(2, 7)))
    cat_ids = [1] if iou_type == "keypoints" else [1, 2]
    gt_anns, dt_anns = [], []
    aid = 0
    for im in img_ids:
        for c in cat_ids:
            for _ in range(rng.poisson(2.0)):
                aid += 1
                box = _rand_box(rng)
                g = {"id": aid, "image_id": im, "category_id": c,
                     "bbox": box, "area": box[2] * box[3],
                     "iscrowd": int(rng.rand() < 0.15)}
                if rng.rand() < 0.1:
                    g["ignore"] = 1
                if iou_type == "keypoints":
                    kp = _rand_kpts(
                        rng, box,
                        n_vis=0 if rng.rand() < 0.15 else None)
                    g["keypoints"] = kp
                    g["num_keypoints"] = int(
                        (np.asarray(kp).reshape(-1, 3)[:, 2] > 0).sum())
                gt_anns.append(g)
                # detections: perturbed copies of this GT
                for _ in range(rng.poisson(1.2)):
                    d = {"image_id": im, "category_id": c,
                         "score": _score(rng)}
                    if iou_type == "keypoints":
                        kp = np.asarray(g["keypoints"], np.float64).copy()
                        kp[0::3] += rng.randn(17) * rng.uniform(1, 25)
                        kp[1::3] += rng.randn(17) * rng.uniform(1, 25)
                        kp[2::3] = 1.0
                        d["keypoints"] = kp.tolist()
                        x, y = kp[0::3], kp[1::3]
                        d["bbox"] = [float(x.min()), float(y.min()),
                                     float(x.max() - x.min()),
                                     float(y.max() - y.min())]
                        d["area"] = d["bbox"][2] * d["bbox"][3]
                    else:
                        b = np.asarray(box) + rng.randn(4) * \
                            rng.uniform(0.0, 0.25) * max(box[2], box[3])
                        b[2:] = np.maximum(b[2:], 1.0)
                        d["bbox"] = [float(v) for v in b]
                        d["area"] = d["bbox"][2] * d["bbox"][3]
                    dt_anns.append(d)
            # spurious detections matching nothing
            for _ in range(rng.poisson(0.8)):
                d = {"image_id": im, "category_id": c, "score": _score(rng)}
                box = _rand_box(rng)
                d["bbox"] = box
                d["area"] = box[2] * box[3]
                if iou_type == "keypoints":
                    d["keypoints"] = _rand_kpts(rng, box, n_vis=17)
                dt_anns.append(d)
    gt = COCO({"images": [{"id": i} for i in img_ids],
               "annotations": gt_anns,
               "categories": [{"id": c, "name": str(c)} for c in cat_ids]})
    return gt, gt_anns, dt_anns, sorted(img_ids), sorted(cat_ids)


def _repo_stats(gt, dt_anns, iou_type):
    ev = COCOeval(gt, gt.loadRes(list(map(dict, dt_anns))), iou_type)
    ev.evaluate()
    ev.accumulate()
    return ev.summarize()


@pytest.mark.parametrize("iou_type", ["bbox", "keypoints"])
def test_fuzz_vs_loopform_oracle(iou_type, capsys):
    rng = np.random.RandomState(7 if iou_type == "bbox" else 8)
    n_cases = 60
    for case in range(n_cases):
        gt, gt_anns, dt_anns, img_ids, cat_ids = make_case(rng, iou_type)
        got = _repo_stats(gt, dt_anns, iou_type)
        capsys.readouterr()            # drop the summary table printout
        # oracle consumes dt anns with ids the way loadRes assigns them
        dt_oracle = [dict(d, id=i + 1, iscrowd=0)
                     for i, d in enumerate(dt_anns)]
        want = evaluate_oracle(gt_anns, dt_oracle, img_ids, cat_ids,
                               iou_type)
        np.testing.assert_allclose(
            got, want, atol=1e-9,
            err_msg=f"{iou_type} case {case}: {got} vs {want}")


@pytest.mark.parametrize("iou_type", ["bbox", "keypoints"])
def test_fuzz_vs_pycocotools(iou_type, capsys):
    pycoco = pytest.importorskip("pycocotools.cocoeval")
    pycoco_api = pytest.importorskip("pycocotools.coco")

    rng = np.random.RandomState(17 if iou_type == "bbox" else 18)
    for case in range(25):
        gt, gt_anns, dt_anns, img_ids, cat_ids = make_case(rng, iou_type)
        got = _repo_stats(gt, dt_anns, iou_type)

        ref_gt = pycoco_api.COCO()
        ref_gt.dataset = {
            "images": [{"id": i} for i in img_ids],
            "annotations": [dict(a) for a in gt_anns],
            "categories": [{"id": c, "name": str(c)} for c in cat_ids]}
        ref_gt.createIndex()
        ref_dt = ref_gt.loadRes([dict(d) for d in dt_anns])
        ev = pycoco.COCOeval(ref_gt, ref_dt, iou_type)
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        capsys.readouterr()
        np.testing.assert_allclose(got, ev.stats, atol=1e-9,
                                   err_msg=f"{iou_type} case {case}")
