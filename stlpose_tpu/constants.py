"""
Keypoint vocabularies, skeleton limb tables, and COCO OKS constants.

Capability parity with the reference tables in ``src/CONSTANTS.py``
(reference: CONSTANTS.py:14-67) — the 17-keypoint COCO ordering, the
18-keypoint ClassArch ordering, skeleton edge lists for rendering, the
left/right flip pairs used by mirror augmentation and flip-TTA, and the
per-keypoint OKS sigmas used by OKS-NMS and COCO evaluation.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- COCO-17
COCO_KPT_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
)
NUM_COCO_KPTS = len(COCO_KPT_NAMES)

IDX_TO_KPT_NAME = dict(enumerate(COCO_KPT_NAMES))
KPT_NAME_TO_IDX = {name: i for i, name in enumerate(COCO_KPT_NAMES)}

# Left/right keypoint index pairs swapped under horizontal mirroring
# (reference: CONSTANTS.py:65).
FLIP_PAIRS = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16))

UPPER_BODY_IDS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
LOWER_BODY_IDS = (11, 12, 13, 14, 15, 16)

# Skeleton edge lists for visualization (reference: CONSTANTS.py:44-53).
SKELETON_HRNET = (
    (15, 13), (13, 11), (11, 5), (12, 14), (14, 16), (12, 6), (3, 1), (1, 2),
    (1, 0), (0, 2), (2, 4), (9, 7), (7, 5), (5, 6), (6, 8), (8, 10), (3, 5), (4, 6),
)
SKELETON_SIMPLE = (
    (15, 13), (13, 11), (11, 5), (12, 14), (14, 16), (12, 6), (-3, -1),
    (-1, -2), (-1, 0), (0, -2), (-2, -4), (9, 7), (7, 5), (5, 6), (6, 8),
    (8, 10), (0, 5), (0, 6),
)

# Per-keypoint OKS falloff constants (COCO convention; reference: nms.py:54-57).
OKS_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72,
     .62, .62, 1.07, 1.07, .87, .87, .89, .89],
    dtype=np.float64,
) / 10.0

# Per-joint loss weights: harder extremities get upweighted
# (reference: HRNet_Coco.py:101-104 — 1.2 elbows/knees, 1.5 wrists/ankles).
JOINT_LOSS_WEIGHTS = np.array(
    [1.0, 1.0, 1.0, 1.0, 1.0,
     1.0, 1.0, 1.2, 1.2,
     1.5, 1.5, 1.0, 1.0,
     1.2, 1.2, 1.5, 1.5],
    dtype=np.float32,
)

# ------------------------------------------------------------- ClassArch-18
ARCHDATA_KPT_NAMES = (
    "Head", "Neck", "Thorax", "Pelvis", "Right Shoulder", "Right Elbow",
    "Right Wrist", "Right Hip", "Right Knee", "Right Ankle", "Right Toe",
    "Left Shoulder", "Left Elbow", "Left Wrist", "Left Hip", "Left Knee",
    "Left Ankle", "Left Toe",
)
NUM_ARCHDATA_KPTS = len(ARCHDATA_KPT_NAMES)
IDX_TO_KPT_NAME_ARCH_DATA = dict(enumerate(ARCHDATA_KPT_NAMES))
KPT_NAME_TO_IDX_ARCH_DATA = {n: i for i, n in enumerate(ARCHDATA_KPT_NAMES)}

# Raw ClassArch annotation labels -> canonical 18-kpt names
# (reference: CONSTANTS.py:34-41).
ARCHDATA_LBLS_TO_COCO = {
    "Head Top / Forehead": "Head", "Upper Neck": "Neck", "Pelvis": "Pelvis",
    "Thorax": "Thorax", "Right Shoulder": "Right Shoulder",
    "Right Elbow": "Right Elbow", "Right Wrist": "Right Wrist",
    "Right Hip": "Right Hip", "Right Knee": "Right Knee",
    "Right Ankle": "Right Ankle", "Right Toe": "Right Toe",
    "Left Shoulder": "Left Shoulder", "Left Elbow": "Left Elbow",
    "Left Wrist": "Left Wrist", "Left Hip": "Left Hip",
    "Left Knee": "Left Knee", "Left Ankle": "Left Ankle",
    "Left Toe": "Left Toe",
}

SKELETON_ARCH_DATA = (
    (0, 1), (1, 2), (2, 3), (1, 4), (4, 5), (5, 6), (1, 11), (11, 12),
    (12, 13), (3, 7), (7, 8), (8, 9), (9, 10), (3, 14), (14, 15), (15, 16),
    (16, 17),
)

# identity reorder map for HRNet submissions (reference: CONSTANTS.py:62)
COCO_MAP_HRNET = np.arange(NUM_COCO_KPTS)

ACCEPTED_MODELS = ("HRNet",)


def setup_skeleton_map(model_name: str):
    """Skeleton edge table for a model family (reference: CONSTANTS.py:73-84)."""
    if model_name not in ACCEPTED_MODELS:
        raise NotImplementedError(
            f"Model '{model_name}' not available; expected one of {ACCEPTED_MODELS}")
    return SKELETON_HRNET


def setup_submission_maps(model_name: str):
    """Keypoint reorder map for submission files (reference: CONSTANTS.py:87-98)."""
    if model_name not in ACCEPTED_MODELS:
        raise NotImplementedError(
            f"Model '{model_name}' not available; expected one of {ACCEPTED_MODELS}")
    return COCO_MAP_HRNET, False
