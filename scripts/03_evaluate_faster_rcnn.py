#!/usr/bin/env python
"""
Person-detector COCO evaluation CLI.

CLI parity with the reference's 03_evaluate_faster_rcnn.py: bbox AP over
the validation loader + per-checkpoint detector stats JSON
(reference: 03_evaluate_faster_rcnn.py:186-208).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.engines.detector_trainer import DetectorEvaluator
from stlpose_tpu.utils.arguments import get_directory_argument
from stlpose_tpu.utils.logger import Logger, print_


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    exp_path, args = get_directory_argument(get_checkpoint=True,
                                            get_dataset=True)
    Logger(exp_path)
    print_("Starting detector evaluation", type="new_exp")
    ev = DetectorEvaluator(
        exp_path, checkpoint=args.checkpoint,
        dataset_name=args.dataset_name, data_path=args.data_path,
        detector_config=os.environ.get("STLPOSE_DETECTOR_CONFIG"))
    ev.setup()
    stats = ev.evaluate()
    print_(f"Detector AP: {stats[0]:.4f}")


if __name__ == "__main__":
    main()
