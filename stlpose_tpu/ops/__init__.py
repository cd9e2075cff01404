"""Device-side geometry, target-generation, decoding, and metric ops.

These are the TPU-native replacements for the reference's per-sample host
cv2/numpy stages (reference: lib/transforms.py, data/JointsDataset.py,
lib/pose_parsing.py, lib/nms.py, lib/metrics.py). Everything here is batched,
static-shape, and jit/vmap-friendly; host-only helpers (greedy OKS-NMS order
semantics) live alongside as numpy functions.
"""

from stlpose_tpu.ops.affine import (
    get_affine_params,
    get_affine_matrix,
    apply_affine,
    transform_preds,
    coords_to_center_scale,
)
from stlpose_tpu.ops.warp import affine_warp, crop_from_center_scale
from stlpose_tpu.ops.heatmap import generate_targets
from stlpose_tpu.ops.decode import (
    heatmap_argmax,
    refine_subpixel,
    decode_heatmaps,
)
from stlpose_tpu.ops.flip import flip_back, fliplr_joints
from stlpose_tpu.ops.pck import pck_accuracy, pck_accuracy_np
from stlpose_tpu.ops.nms import oks_iou, oks_nms, box_nms
