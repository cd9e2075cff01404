#!/usr/bin/env python
"""
Two-stage detect->pose qualitative evaluation on unannotated vase images.

CLI parity with the reference's 04_evaluate_vases_qualitatively.py:
detector -> bbox filtering -> per-detection crops -> HRNet -> rendered
detections and poses under plots/ (reference: 04_...py:266-284).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.engines.vase_evaluator import VaseEvaluator
from stlpose_tpu.utils.arguments import resolve_exp_path
from stlpose_tpu.utils.logger import Logger, print_


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--exp_directory", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--detector_checkpoint", default=None)
    p.add_argument("--dataset_name", default="ccoimages_final",
                   help="image directory under the data root "
                        "(ccoimages_final / red_black / open_subset)")
    p.add_argument("--bbox_thr", type=float, default=0.5)
    p.add_argument("--kpt_thr", type=float, default=0.1)
    p.add_argument("--data_path", default=None)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    exp_path = resolve_exp_path(args.exp_directory)
    Logger(exp_path)
    print_("Two-stage qualitative vase evaluation", type="new_exp")
    ev = VaseEvaluator(
        exp_path, checkpoint=args.checkpoint,
        detector_checkpoint=args.detector_checkpoint,
        dataset_name=args.dataset_name, data_path=args.data_path,
        bbox_thr=args.bbox_thr, kpt_thr=args.kpt_thr,
        detector_config=os.environ.get("STLPOSE_DETECTOR_CONFIG"))
    ev.load_vase_subset()
    ev.setup_models(
        config_name=os.environ.get("STLPOSE_MODEL_CONFIG", "w32_256x192"),
        pretrained=os.environ.get("STLPOSE_PRETRAINED") or None)
    n = ev.qualitative_comparison(limit=args.limit)
    print_(f"Rendered {n} images to {ev.plots_path}")


if __name__ == "__main__":
    main()
