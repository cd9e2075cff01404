"""Data layer: record construction rules, augmentation distributions, and
the host->device pipelines on synthetic COCO/ClassArch fixtures."""

import json
import os

import numpy as np
import pytest

from stlpose_tpu.config import default_experiment_args
from stlpose_tpu.data import pose_dataset as pd
from stlpose_tpu.data import detection_dataset as dd
from stlpose_tpu.data.pipeline import PoseDataPipeline
from stlpose_tpu.data.loaders import load_dataset, get_detection_dataset
from tests.fixtures import make_coco_dataset, make_archdata_dataset


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    make_coco_dataset(str(root))
    return str(root)


@pytest.fixture(scope="module")
def arch_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("arch")
    make_archdata_dataset(str(root))
    return str(root)


class TestPoseRecords:
    def test_gt_records_built(self, coco_root):
        recs = pd.load_coco_pose_records(
            os.path.join(coco_root, "annotations", "person_keypoints_train.json"),
            os.path.join(coco_root, "original_images", "train2017"),
            is_train=True)
        assert len(recs) == 12      # 6 imgs x 2 people
        r = recs[0]
        assert r.joints.shape == (17, 2)
        assert os.path.exists(r.image)
        # 1.25x padded pixel-std scale
        assert (r.scale > 0).all()

    def test_instances_without_keypoints_skipped(self, coco_root, tmp_path):
        path = os.path.join(coco_root, "annotations",
                            "person_keypoints_train.json")
        with open(path) as f:
            data = json.load(f)
        data["annotations"][0]["keypoints"] = [0] * 51
        mod = tmp_path / "mod.json"
        mod.write_text(json.dumps(data))
        recs = pd.load_coco_pose_records(
            str(mod), os.path.join(coco_root, "original_images", "train2017"),
            is_train=True)
        assert len(recs) == 11

    def test_detection_result_records(self, coco_root, tmp_path):
        dets = [{"image_id": 1001, "category_id": 1,
                 "bbox": [10, 10, 80, 120], "score": 0.9},
                {"image_id": 1001, "category_id": 1,
                 "bbox": [10, 10, 80, 120], "score": 0.05},   # below thr
                {"image_id": 1001, "category_id": 2,
                 "bbox": [10, 10, 80, 120], "score": 0.9}]    # not person
        f = tmp_path / "dets.json"
        f.write_text(json.dumps(dets))
        recs = pd.load_detection_result_records(
            str(f), os.path.join(coco_root, "original_images", "val2017"),
            image_thre=0.1)
        assert len(recs) == 1
        assert recs[0].score == pytest.approx(0.9)

    def test_archdata_records(self, arch_root):
        recs = pd.load_archdata_pose_records(
            os.path.join(arch_root, "annotations_arch_data",
                         "arch_data_keypoints.json"),
            os.path.join(arch_root, "class_arch_poses", "characters"))
        assert len(recs) == 5
        assert recs[0].archdata_joints.shape == (18, 3)
        assert recs[0].character_name in ("Heracles", "satyr", "maenad")
        # ClassArch scale convention: normalized by crop size, no padding
        assert (recs[0].scale < 3).all()


class TestAugmentation:
    def test_distributions(self):
        aug = pd.AugmentationParams(scale_factor=0.25, rotation_factor=30,
                                    flip=True, prob_half_body=0, seed=0)
        joints = np.random.RandomState(0).uniform(0, 200, (17, 2))
        vis = np.ones(17)
        c0 = np.array([100.0, 100.0], np.float32)
        s0 = np.array([1.0, 1.333], np.float32)
        scales, rots, flips = [], [], []
        for _ in range(400):
            c, s, r, f = aug.sample(c0, s0, joints, vis)
            scales.append(s[0] / s0[0])
            rots.append(r)
            flips.append(f)
        assert 0.75 <= min(scales) and max(scales) <= 1.25
        assert max(abs(r) for r in rots) <= 60
        assert 0.4 * len(rots) <= sum(r == 0 for r in rots)  # ~40% zero
        assert 0.35 < np.mean(flips) < 0.65

    def test_half_body_requires_enough_joints(self):
        aug = pd.AugmentationParams(prob_half_body=1.0, seed=1)
        joints = np.zeros((17, 2))
        vis = np.zeros(17)
        vis[:2] = 1                 # too few visible
        c, s = aug.half_body(joints, vis)
        assert c is None


class TestPosePipeline:
    def test_train_batches(self, coco_root):
        exp = default_experiment_args()
        exp["training"]["batch_size"] = 4
        exp["dataset"].update({"flip": True, "scale_factor": 0.25,
                               "rot_factor": 30})
        train, valid = load_dataset(exp, data_path=coco_root, num_workers=2,
                                    pad_multiple=4)
        batch = next(iter(train))
        assert batch["image"].shape == (4, 256, 192, 3)
        assert batch["target"].shape == (4, 17, 64, 48)
        assert batch["target_weight"].shape == (4, 17)
        assert np.isfinite(np.asarray(batch["image"])).all()
        # normalized images should be roughly centered
        assert abs(float(np.asarray(batch["image"]).mean())) < 3.0

    def test_valid_padding_to_mesh_multiple(self, coco_root):
        exp = default_experiment_args()
        exp["training"]["batch_size"] = 3
        _, valid = load_dataset(exp, train=False, data_path=coco_root,
                                num_workers=2, pad_multiple=8)
        batches = list(valid)
        for b in batches:
            assert b["image"].shape[0] % 8 == 0
            assert b["n_valid"] <= b["image"].shape[0]
        total_valid = sum(b["n_valid"] for b in batches)
        assert total_valid == 8     # 4 val imgs x 2 people

    def test_eval_mode_is_deterministic(self, coco_root):
        exp = default_experiment_args()
        exp["training"]["batch_size"] = 8
        _, v1 = load_dataset(exp, train=False, data_path=coco_root,
                             num_workers=2)
        _, v2 = load_dataset(exp, train=False, data_path=coco_root,
                             num_workers=2)
        b1, b2 = next(iter(v1)), next(iter(v2))
        np.testing.assert_allclose(np.asarray(b1["image"]),
                                   np.asarray(b2["image"]))
        np.testing.assert_array_equal(b1["image_id"], b2["image_id"])


class TestDetectionPipeline:
    def test_coco_detection_batches(self, coco_root):
        exp = default_experiment_args()
        exp["training"]["batch_size"] = 3
        pipe = get_detection_dataset(exp, split="valid", data_path=coco_root,
                                     num_workers=2)
        batch = next(iter(pipe))
        n, s = batch["image"].shape[0], batch["image"].shape[1]
        assert s == 400 and batch["image"].shape == (n, 400, 400, 3)
        assert batch["boxes"].shape == (n, 32, 4)
        assert batch["box_mask"].sum() > 0
        assert float(batch["image"].max()) <= 1.0
        # boxes stay inside the canvas
        m = batch["box_mask"].astype(bool)
        assert (batch["boxes"][m] >= 0).all()
        assert (batch["boxes"][m] <= 400).all()

    def test_archdata_detection_person_filter(self, arch_root):
        recs = dd.load_archdata_detection_records(
            os.path.join(arch_root, "annotations_arch_data", "all_data.json"),
            os.path.join(arch_root, "class_arch_data"))
        # category 3 ("column") filtered out
        assert all(r.labels.max() == 1 for r in recs)
        ids = {r.image_id for r in recs}
        assert 3 not in {i for i in ids if i % 3 == 0 and (i % 3) + 1 == 3}

    def test_directory_dataset(self, arch_root):
        recs = dd.list_directory_records(
            os.path.join(arch_root, "class_arch_data"))
        assert len(recs) == 5
        assert all(len(r.boxes) == 0 for r in recs)
