"""
Pose-entry containers and COCO-format converters.

Equivalents of the reference's pose-entry bookkeeping
(reference: lib/pose_parsing.py:107-151, data/data_processing.py:85-135):
``create_pose_entries`` turns per-crop keypoint arrays into the flat
indexed (pose_entries, all_keypoints) representation the qualitative
scripts consume, and ``convert_to_coco_format`` flattens entries into COCO
result keypoint lists.
"""

from __future__ import annotations

import numpy as np

POSE_ENTRY_SIZE = 19      # 17 keypoint slots + score + count


def create_pose_entries(keypoints, max_vals=None, thr: float = 0.1):
    """Keypoint arrays -> (pose_entries, all_keypoints).

    Args:
      keypoints: (P, 17, 2) per-person keypoint coords.
      max_vals: optional (P, 17) confidences; keypoints below ``thr`` get
        their validity flag zeroed (reference: lib/pose_parsing.py:119-121).
    Returns:
      pose_entries: list of (19,) arrays — 17 indices into all_keypoints
        (or -1), then score, then visible count.
      all_keypoints: (P*17, 4) rows (x, y, 1, flag).
    """
    keypoints = np.asarray(keypoints, np.float64)
    P = len(keypoints)
    if P == 0:
        return [], np.zeros((0, 4))
    flat = keypoints.reshape(-1, 2)
    all_keypoints = np.concatenate(
        [flat, np.ones((len(flat), 2))], axis=1)
    missing = (flat == -1).any(axis=1)
    all_keypoints[missing] = -1
    if max_vals is not None:
        mv = np.asarray(max_vals).reshape(-1)
        all_keypoints[mv < thr, -1] = 0

    pose_entries = []
    for p in range(P):
        entry = np.full(POSE_ENTRY_SIZE, -1.0)
        for j in range(17):
            if keypoints[p, j, 0] != -1:
                entry[j] = 17 * p + j
        # layout: [-2] = pose score, [-1] = visible-keypoint count. The
        # reference assigns the count to [-2] twice and leaves [-1] at -1
        # (lib/pose_parsing.py:131-132), which zeroes every score in its
        # converter — an evident defect we do not replicate.
        entry[-2] = 1.0
        entry[-1] = float((entry[:-2] != -1).sum())
        pose_entries.append(entry)
    return pose_entries, all_keypoints


def convert_to_coco_format(pose_entries, all_keypoints):
    """Pose entries -> COCO keypoint lists + scores
    (reference: data/data_processing.py:85-135, with TO_COCO_MAP the
    identity for HRNet and no neck skip)."""
    coco_keypoints, scores = [], []
    for entry in pose_entries:
        if len(entry) == 0:
            continue
        kps = [0.0] * (17 * 3)
        person_score = float(entry[-2])
        for pos, kid in enumerate(entry[:-2]):
            if pos >= 17:
                break
            if kid != -1:
                x, y, s = all_keypoints[int(kid), 0:3]
                kps[pos * 3 + 0] = float(x)
                kps[pos * 3 + 1] = float(y)
                kps[pos * 3 + 2] = 1.0
        coco_keypoints.append(kps)
        scores.append(person_score * max(0.0, float(entry[-1]) - 1))
    if len(pose_entries) == 0:
        coco_keypoints.append([0.0] * 51)
        scores.append(0.0)
    return coco_keypoints, scores


def unnormalize(img, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """Undo ImageNet normalization -> [0, 1] image
    (reference: lib/transforms.py:135-144)."""
    img = np.asarray(img, np.float32)
    if img.max() > 50:          # already a 0-255 image
        return img / 255.0
    return np.clip(img * np.asarray(std, np.float32) +
                   np.asarray(mean, np.float32), 0.0, 1.0)
