"""Flax model zoo: HRNet pose network, person detectors, VGG/AdaIN stylizer.

TPU-first redesigns of the reference model families (SURVEY.md §2.4):
NHWC layouts, bf16-friendly compute, static shapes, and no data-dependent
Python control flow under jit.
"""

from stlpose_tpu.models.hrnet import (PoseHighResolutionNet, create_hrnet,
                                      fold_batchnorms,
                                      fold_input_normalization)
from stlpose_tpu.models.quantize import (calibrate_hrnet, fold_frcnn_trunk,
                                         quantize_frcnn_trunk,
                                         quantize_hrnet,
                                         quantize_hrnet_from_batches)
