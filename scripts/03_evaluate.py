#!/usr/bin/env python
"""
HRNet COCO evaluation CLI.

CLI parity with the reference's 03_evaluate.py: flip-TTA evaluation over the
validation set, submission file with rescoring + OKS-NMS, COCO keypoint AP,
per-checkpoint stats JSON (reference: 03_evaluate.py:221-246).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.engines import PoseEvaluator
from stlpose_tpu.utils.arguments import get_directory_argument
from stlpose_tpu.utils.logger import Logger, print_


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    exp_path, args = get_directory_argument(get_checkpoint=True,
                                            get_dataset=True)
    Logger(exp_path)
    print_("Starting HRNet evaluation", type="new_exp")
    evaluator = PoseEvaluator(exp_path, checkpoint=args.checkpoint,
                              dataset_name=args.dataset_name,
                              data_path=args.data_path, flip=args.flip,
                              save_visualizations=args.save)
    evaluator.setup_model_dataset(
        config_name=os.environ.get("STLPOSE_MODEL_CONFIG", "w32_256x192"),
        pretrained=os.environ.get("STLPOSE_PRETRAINED", "default"))
    stats = evaluator.evaluate_model()
    print_(f"AP: {stats[0]:.4f}")


if __name__ == "__main__":
    main()
