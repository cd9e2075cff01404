#!/usr/bin/env python
"""
Person-detector fine-tuning CLI.

CLI parity with the reference's 02_train_faster_rcnn.py: summed detector
loss (optionally perceptually weighted), COCO bbox AP validation with
plateau-on-AP scheduling, detector_logs.json and detector checkpoints
(reference: 02_train_faster_rcnn.py:283-314).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.engines.detector_trainer import DetectorTrainer
from stlpose_tpu.utils.arguments import get_directory_argument
from stlpose_tpu.utils.logger import Logger, print_


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    exp_path, args = get_directory_argument(get_checkpoint=True,
                                            get_dataset=True)
    Logger(exp_path)
    print_("Starting detector training", type="new_exp")
    trainer = DetectorTrainer(
        exp_path, checkpoint=args.checkpoint,
        resume_training=args.resume_training,
        dataset_name=args.dataset_name, data_path=args.data_path,
        use_perceptual_loss=args.use_perceptual_loss,
        detector_config=os.environ.get("STLPOSE_DETECTOR_CONFIG"))
    trainer.load_dataset()
    trainer.setup_model(
        pretrained=os.environ.get("STLPOSE_DETECTOR_PRETRAINED") or None)
    trainer.training_loop()


if __name__ == "__main__":
    main()
