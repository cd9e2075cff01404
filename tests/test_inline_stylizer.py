"""Inline AdaIN stylization as an input-pipeline stage (BASELINE config #4:
'style-transfer-augmented training with the VGG stylizer inline')."""

import numpy as np
import pytest

from stlpose_tpu.config import default_experiment_args
from stlpose_tpu.data.loaders import build_pose_records
from stlpose_tpu.data.pipeline import PoseDataPipeline
from stlpose_tpu.models.adain import AdaINStylizer
from tests.fixtures import make_coco_dataset


def test_stylized_pipeline_batches(tmp_path, rng):
    make_coco_dataset(str(tmp_path), n_train=2, n_val=2, img_hw=(200, 260))
    exp = default_experiment_args()
    records = build_pose_records(exp, "train", data_path=str(tmp_path))

    stylizer = AdaINStylizer()
    style_bank = rng.rand(3, 256, 192, 3).astype(np.float32)

    plain = PoseDataPipeline(records, 4, is_train=True, exp_data=exp,
                             num_workers=2)
    styled = PoseDataPipeline(records, 4, is_train=True, exp_data=exp,
                              num_workers=2, stylizer=stylizer,
                              style_bank=style_bank, style_alpha=0.8)
    b0 = next(iter(plain))
    b1 = next(iter(styled))
    assert b1["image"].shape == b0["image"].shape
    assert np.isfinite(np.asarray(b1["image"])).all()
    # stylization must actually change the pixels...
    assert np.abs(np.asarray(b1["image"]) - np.asarray(b0["image"])).mean() \
        > 1e-3
    # ...but not the geometry: targets/weights identical
    np.testing.assert_allclose(np.asarray(b1["target"]),
                               np.asarray(b0["target"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1["target_weight"]),
                               np.asarray(b0["target_weight"]), atol=1e-6)
