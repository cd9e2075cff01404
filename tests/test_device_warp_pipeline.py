"""device_warp pipeline mode: batched on-device crop warps must agree with
the host cv2 path (BASELINE config #2)."""

import os

import numpy as np
import pytest

from stlpose_tpu.config import default_experiment_args
from stlpose_tpu.data.loaders import build_pose_records
from stlpose_tpu.data.pipeline import PoseDataPipeline
from tests.fixtures import make_coco_dataset


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    root = tmp_path_factory.mktemp("dw")
    make_coco_dataset(str(root), n_train=1, n_val=4, img_hw=(300, 400))
    exp = default_experiment_args()
    return build_pose_records(exp, "valid", data_path=str(root))


class TestDeviceWarpPipeline:
    def test_matches_host_pipeline(self, records):
        host = PoseDataPipeline(records, 8, is_train=False, num_workers=2)
        dev = PoseDataPipeline(records, 8, is_train=False, num_workers=2,
                               device_warp=True, canvas_size=512)
        bh = next(iter(host))
        bd = next(iter(dev))
        np.testing.assert_array_equal(bh["image_id"], bd["image_id"])
        np.testing.assert_allclose(bd["center"], bh["center"], atol=1e-5)
        # crops agree up to letterbox resampling (canvas downscales source)
        ih, id_ = np.asarray(bh["image"]), np.asarray(bd["image"])
        assert ih.shape == id_.shape
        # normalized-image difference should be small on average
        assert np.abs(ih - id_).mean() < 0.25, np.abs(ih - id_).mean()
        # target weights identical; heatmap targets nearly identical
        np.testing.assert_allclose(np.asarray(bd["target_weight"]),
                                   np.asarray(bh["target_weight"]),
                                   atol=1e-5)
        th, td = np.asarray(bh["target"]), np.asarray(bd["target"])
        # joint quantization can shift one heatmap cell at letterbox scale;
        # demand high overlap of the Gaussian mass
        overlap = (np.minimum(th, td).sum() /
                   max(np.maximum(th, td).sum(), 1e-6))
        assert overlap > 0.85, overlap

    def test_train_mode_runs_with_aug(self, records):
        exp = default_experiment_args()
        exp["dataset"].update({"flip": True, "scale_factor": 0.25,
                               "rot_factor": 30})
        pipe = PoseDataPipeline(records, 4, is_train=True, exp_data=exp,
                                num_workers=2, device_warp=True,
                                canvas_size=512)
        batch = next(iter(pipe))
        assert batch["image"].shape == (4, 256, 192, 3)
        assert np.isfinite(np.asarray(batch["image"])).all()
        assert np.asarray(batch["target"]).max() <= 1.0 + 1e-6
