"""Oracle-AP integration test: when the network output is replaced by the
ground-truth heatmap targets, the complete BASELINE config-#1 path —
decode -> inverse-affine unwarp -> rescoring + OKS-NMS -> submission ->
COCO OKS AP — must recover AP ~= 1.0. This proves the evaluation pipeline
itself is lossless up to heatmap quantization (stride-4 argmax)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from stlpose_tpu.data.coco_api import COCO
from stlpose_tpu.data.loaders import load_dataset
from stlpose_tpu.config import default_experiment_args
from stlpose_tpu.eval.submission import generate_submission, compute_precision
from stlpose_tpu.ops.decode import decode_heatmaps
from tests.fixtures import make_coco_dataset


def test_gt_heatmaps_reach_ap_one(tmp_path, rng):
    data = tmp_path / "data"
    # larger people so stride-4 quantization stays well inside OKS ~ 1
    make_coco_dataset(str(data), n_train=1, n_val=6, people_per_img=2,
                      img_hw=(480, 640))
    exp = default_experiment_args()
    exp["training"]["batch_size"] = 4
    _, pipe = load_dataset(exp, train=False, data_path=str(data),
                           num_workers=2)

    preds_file = str(tmp_path / "submission.json")
    all_preds, all_boxes, image_ids = [], [], []
    for batch in pipe:
        n = batch["n_valid"]
        # oracle: use the GT heatmap targets as "network output"
        hm = jnp.asarray(batch["target"][:n])
        preds, maxvals, _ = decode_heatmaps(
            hm, batch["center"][:n], batch["scale"][:n])
        kpts = np.concatenate([np.asarray(preds),
                               np.asarray(maxvals)[..., None]], axis=-1)
        area = np.prod(batch["scale"][:n] * 200.0, axis=1)
        boxes = np.concatenate(
            [batch["center"][:n], batch["scale"][:n], area[:, None],
             batch["score"][:n, None]], axis=1)
        all_preds.append(kpts)
        all_boxes.append(boxes)
        image_ids.extend(batch["image_id"][:n].tolist())

    generate_submission(np.concatenate(all_preds),
                        np.concatenate(all_boxes), image_ids, preds_file)
    labels_file = os.path.join(str(data), "annotations",
                               "person_keypoints_val.json")
    stats = compute_precision(preds_file, labels_file)
    # decode of GT targets recovers keypoints to within heatmap
    # quantization; OKS stays ~1 for the large synthetic people
    assert stats[0] > 0.95, stats
    assert stats[5] > 0.95          # AR
