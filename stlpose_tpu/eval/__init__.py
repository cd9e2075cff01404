"""Evaluation subsystem: COCO AP (bbox + OKS keypoints), submission files,
and the detector evaluator accumulator."""

from stlpose_tpu.eval.cocoeval import COCOeval
from stlpose_tpu.eval.submission import (generate_submission, compute_precision)
