"""Data layer: COCO-format annotation handling, pose/detection datasets, and
the host->device input pipeline."""

from stlpose_tpu.data.coco_api import COCO
