"""03_evaluate on arch_data: evaluation against in-memory GT built from the
records (no COCO annotation file exists for ClassArch)."""

import numpy as np
import pytest

from stlpose_tpu.config import default_experiment_args
from stlpose_tpu.engines import PoseEvaluator
from stlpose_tpu.utils.experiment import create_experiment
from tests.fixtures import make_archdata_dataset, make_coco_dataset


def test_evaluator_on_archdata(tmp_path):
    data = tmp_path / "data"
    make_archdata_dataset(str(data), n_imgs=4, img_hw=(300, 380))
    exp_path = create_experiment("arch_eval", {"batch_size": 4},
                                 root=str(tmp_path / "exp"))
    ev = PoseEvaluator(exp_path, dataset_name="arch_data",
                       data_path=str(data), num_workers=2, flip=True)
    ev.setup_model_dataset(config_name="tiny", pretrained=None)
    stats = ev.evaluate_model()
    assert stats.shape == (10,)
    assert -1 <= stats[0] <= 1
