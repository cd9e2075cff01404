"""
Global configuration: filesystem layout, experiment default arguments, and
model architecture configs.

Mirrors the three config tiers of the reference (SURVEY.md §5-config):
  (a) static path/config table  (reference: CONFIG.py:7-20)
  (b) per-experiment defaults   (reference: CONFIG.py:22-71)
  (c) model architecture config (reference: models/utils/hrnet_config.py) —
      here a plain frozen dataclass instead of a yacs tree.

The experiment directory remains the unit of reproducibility: parameters JSON
+ checkpoints + logs + plots, exactly as in the reference contract.
"""

from __future__ import annotations

import copy
import dataclasses
import os
from typing import Tuple

# --------------------------------------------------------------- (a) paths
CONFIG = {
    "paths": {
        "data_path": os.environ.get("STLPOSE_DATA_PATH", "../../data"),
        "database_path": os.environ.get("STLPOSE_DATABASE_PATH",
                                        "../databases"),
        "experiments_path": os.environ.get("STLPOSE_EXPERIMENTS_PATH", "../experiments"),
        "comparisons_path": "../experiments/model_comparison",
        "knn_path": os.environ.get("STLPOSE_KNN_PATH", "../knn"),
        "pretrained_path": os.environ.get("STLPOSE_PRETRAINED_PATH", "../resources"),
        "dict_path": "../../data/mapping_dicts",
        "submission": "submission_dict.json",
    },
    "num_workers": int(os.environ.get("STLPOSE_NUM_WORKERS", "8")),
    "random_seed": 13,
}

# ------------------------------------------------- (b) experiment defaults
DEFAULT_ARGS = {
    "dataset": {
        "dataset_name": "coco",
        "image_size": 400,
        "alpha": "0.5",
        "styles": "redblack",
        "flip": False,
        "num_joints_half_body": 8,
        "prob_half_body": 0,
        "rot_factor": 0,
        "scale_factor": 0.0,
        "test_set": "val2017",
        "train_set": "train2017",
        "shuffle_train": False,
        "shuffle_test": False,
        # inline AdaIN stylization (BASELINE config #4 upgrade of the
        # reference's OFFLINE styled-COCO directories,
        # data/data_loaders.py:84-100): dict {style_dir, decoder_ckpt?,
        # vgg_weights?, alpha?, apply_to_valid?} or None (off). Built
        # into the train pipeline by data/loaders.py::load_dataset.
        "inline_style": None,
    },
    "model": {
        "model_name": "HRNet",
        "detector_name": "faster_rcnn",
        "detector_type": "",
    },
    "training": {
        "num_epochs": 100,
        "learning_rate": 0.001,
        "learning_rate_factor": 0.333,
        "patience": 10,
        "scheduler": "plateau",
        "batch_size": 32,
        "save_frequency": 5,
        "log_frequency": 100,
        "optimizer": "adam",
        "momentum": 0.9,
        "nesterov": False,
        "gamma1": 0.9,
        "gamma2": 0.99,
        "lambda_D": None,
        "lambda_P": None,
        "perceptual_loss": False,
        "perceptual_weight": "add",
    },
    "evaluation": {
        "bbox_thr": 0.5,
        "det_nms_thr": 0.5,
        "img_thr": 0.0,
        "in_vis_thr": 0.2,
        "nms_thr": 1.0,
        "oks_thr": 0.9,
        "use_gt_bbox": True,
    },
}


def default_experiment_args() -> dict:
    """Deep copy of the experiment defaults (callers mutate their copy)."""
    return copy.deepcopy(DEFAULT_ARGS)


# --------------------------------------------- (c) model architecture config
@dataclasses.dataclass(frozen=True)
class HRNetStageConfig:
    num_modules: int
    num_branches: int
    block: str                  # "BASIC" | "BOTTLENECK"
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    """HRNet-W32 256x192 pose config.

    Matches the reference yacs tree merged from
    ``resources/HRnet/cfg_hrnet_w32_256x192.yaml``
    (reference: models/utils/hrnet_config.py:17-123, models/HRnet.py:280-337).
    """
    num_joints: int = 17
    # (width, height) conventions follow the reference: image 192x256,
    # heatmap 48x64 (stride 4).
    image_size: Tuple[int, int] = (192, 256)
    heatmap_size: Tuple[int, int] = (48, 64)
    sigma: float = 2.0
    final_conv_kernel: int = 1
    stem_channels: int = 64
    stage1_num_blocks: int = 4
    stage2: HRNetStageConfig = HRNetStageConfig(1, 2, "BASIC", (4, 4), (32, 64))
    stage3: HRNetStageConfig = HRNetStageConfig(4, 3, "BASIC", (4, 4, 4), (32, 64, 128))
    stage4: HRNetStageConfig = HRNetStageConfig(
        3, 4, "BASIC", (4, 4, 4, 4), (32, 64, 128, 256))
    bn_momentum: float = 0.1    # torch convention; JAX EMA rate = 1 - this
    bn_epsilon: float = 1e-5


HRNET_W32_256x192 = HRNetConfig()

# Smaller config for fast tests (same topology, thin channels).
HRNET_TINY = HRNetConfig(
    stem_channels=16,
    stage1_num_blocks=1,
    stage2=HRNetStageConfig(1, 2, "BASIC", (1, 1), (8, 16)),
    stage3=HRNetStageConfig(1, 3, "BASIC", (1, 1, 1), (8, 16, 32)),
    stage4=HRNetStageConfig(1, 4, "BASIC", (1, 1, 1, 1), (8, 16, 32, 64)),
)


def get_hrnet_config(name: str = "w32_256x192") -> HRNetConfig:
    table = {"w32_256x192": HRNET_W32_256x192, "tiny": HRNET_TINY}
    if name not in table:
        raise KeyError(f"Unknown HRNet config '{name}'; available: {list(table)}")
    return table[name]
