#!/usr/bin/env python
"""
HRNet fine-tuning CLI.

CLI parity with the reference's 02_train.py: loads the experiment, optionally
resumes from a checkpoint, trains with validate-before-train epochs, JSON
logs + TensorBoard + periodic checkpoints (reference: 02_train.py:296-316).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.engines import PoseTrainer
from stlpose_tpu.utils.arguments import get_directory_argument
from stlpose_tpu.utils.logger import Logger, print_


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    exp_path, args = get_directory_argument(get_checkpoint=True,
                                            get_dataset=True)
    Logger(exp_path)
    print_("Starting HRNet training", type="new_exp")
    trainer = PoseTrainer(exp_path, checkpoint=args.checkpoint,
                          resume_training=args.resume_training,
                          dataset_name=args.dataset_name,
                          data_path=args.data_path,
                          use_perceptual_loss=args.use_perceptual_loss)
    trainer.load_dataset()
    trainer.setup_model(
        config_name=os.environ.get("STLPOSE_MODEL_CONFIG", "w32_256x192"),
        pretrained=os.environ.get("STLPOSE_PRETRAINED", "default"))
    trainer.training_loop()


if __name__ == "__main__":
    main()
