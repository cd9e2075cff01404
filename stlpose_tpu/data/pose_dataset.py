"""
Top-down pose datasets: record construction and per-sample host processing.

Capability parity with the reference's dataset classes
(reference: data/JointsDataset.py, data/HRNet_Coco.py, data/ArchDataset.py):
GT-bbox and detector-bbox record construction with identical sanitization,
styled-COCO name mapping, the ClassArch single-instance pose records (with
its divergent center/scale convention), and the half-body / scale / rotation
/ flip augmentation distributions.

TPU-first split of responsibilities: the dataset owns *records* (paths +
geometry + annotations) and the *per-sample host step* (image decode, random
augmentation parameter sampling, optional host warp). Heatmap target
rendering and normalization run batched on device (data/pipeline.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

from stlpose_tpu import constants
from stlpose_tpu.data.coco_api import COCO
from stlpose_tpu.ops.affine import get_affine_matrix_np

# ClassArch character classes that count as person instances
# (reference: ArchDataset.py:69-72)
PERSON_CHARACTER_FILTER = (
    "Heracles", "persecutor", "wrestler", "abductor", "abductee", "Triton",
    "bride", "groom", "Theseus", "Antaios", "Peleus", "Atalante", "Skiron",
    "Eros", "Thetis", "Nereus", "maenad", "satyr", "Anteros", "Procrustes",
    "fleeing", "Kerkyon",
)

IMAGE_SIZE = (192, 256)        # (w, h), reference convention
HEATMAP_SIZE = (48, 64)
ASPECT_RATIO = IMAGE_SIZE[0] / IMAGE_SIZE[1]
PIXEL_STD = 200.0


@dataclasses.dataclass
class PoseRecord:
    """One person instance (the reference's db entry,
    HRNet_Coco.py:218-226)."""
    image: str                  # path to the (possibly styled) image
    original_image: str         # path to the original COCO image
    image_id: int
    center: np.ndarray          # (2,)
    scale: np.ndarray           # (2,) pixel-std units
    joints: np.ndarray          # (J, 2)
    joints_vis: np.ndarray      # (J,) 0/1 visibility
    score: float = 1.0
    alpha: float = 0.0
    perceptual_loss: float = 0.0
    character_name: str = ""
    archdata_joints: Optional[np.ndarray] = None   # (18, 3) ClassArch extras


def _xywh_to_cs(x, y, w, h, aspect_ratio=ASPECT_RATIO, pixel_std=PIXEL_STD,
                padding=1.25):
    """Reference ``_xywh2cs`` (HRNet_Coco.py:233-248)."""
    cx, cy = x + w * 0.5, y + h * 0.5
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w / pixel_std, h / pixel_std], np.float32) * padding
    return np.array([cx, cy], np.float32), scale


def _xywh_to_cs_archdata(x, y, w, h):
    """ClassArch variant: scale normalized by crop size, no padding
    (reference: ArchDataset.py:524-543)."""
    cx, cy = x + w * 0.5, y + h * 0.5
    if w > ASPECT_RATIO * h:
        h = w / ASPECT_RATIO
    elif w < ASPECT_RATIO * h:
        w = h * ASPECT_RATIO
    scale = np.array([w / IMAGE_SIZE[0], h / IMAGE_SIZE[1]], np.float32)
    return np.array([cx, cy], np.float32), scale


# ----------------------------------------------------------------- builders
def load_coco_pose_records(labels_file, img_root, *, is_train: bool,
                           styled_mapping: dict | None = None,
                           styled_img_root: str | None = None,
                           alpha="0.5",
                           perceptual_loss_dict: dict | None = None
                           ) -> List[PoseRecord]:
    """Build GT-bbox pose records from a COCO keypoint annotation file.

    Same rules as the reference (HRNet_Coco.py:129-226): bbox sanitization to
    image bounds, positive area, person class only, instances without any
    labeled keypoint skipped, visibility clipped to {0, 1}.
    """
    coco = COCO(labels_file)
    person_ids = coco.getCatIds(catNms=["person"]) or [1]
    records = []
    for img_id in coco.getImgIds():
        im = coco.loadImgs(img_id)[0]
        width, height = im["width"], im["height"]
        for ann in coco.loadAnns(coco.getAnnIds(imgIds=img_id, iscrowd=0)):
            if ann["category_id"] not in person_ids:
                continue
            x, y, w, h = ann["bbox"]
            x1, y1 = max(0, x), max(0, y)
            x2 = min(width - 1, x1 + max(0, w - 1))
            y2 = min(height - 1, y1 + max(0, h - 1))
            if ann["area"] <= 0 or x2 < x1 or y2 < y1:
                continue
            kp = ann.get("keypoints")
            if not kp or max(kp) == 0:
                continue
            kp = np.asarray(kp, np.float32).reshape(-1, 3)
            joints = kp[:, :2].copy()
            vis = np.clip(kp[:, 2], 0, 1)
            center, scale = _xywh_to_cs(x1, y1, x2 - x1, y2 - y1)

            original = os.path.join(img_root, "%012d.jpg" % img_id)
            image_path = original
            rec_alpha = float(alpha) if not isinstance(alpha, str) or \
                alpha.replace(".", "").isdigit() else 0.0
            if styled_mapping is not None:
                name = styled_mapping.get("%012d" % img_id)
                if name is None:
                    continue
                image_path = os.path.join(styled_img_root or img_root, name)
                if alpha == "random" and "alpha" in name:
                    rec_alpha = float(name.split("alpha_")[-1].split(".jpg")[0])
            ploss = 0.0
            if perceptual_loss_dict:
                ploss = float(perceptual_loss_dict.get(
                    os.path.basename(image_path), 0.0))
            records.append(PoseRecord(
                image=image_path, original_image=original, image_id=img_id,
                center=center, scale=scale, joints=joints, joints_vis=vis,
                alpha=rec_alpha, perceptual_loss=ploss))
    return records


def load_detection_result_records(bbox_file, img_root, *,
                                  image_thre: float = 0.0,
                                  styled_mapping: dict | None = None,
                                  styled_img_root: str | None = None
                                  ) -> List[PoseRecord]:
    """Pose records from a person-detector results JSON (the reference's
    detector-bbox eval path, HRNet_Coco.py:308-351)."""
    with open(bbox_file) as f:
        all_boxes = json.load(f)
    records = []
    for det in all_boxes:
        if det.get("category_id") != 1 or det["score"] < image_thre:
            continue
        img_id = det["image_id"]
        center, scale = _xywh_to_cs(*det["bbox"][:4])
        original = os.path.join(img_root, "%012d.jpg" % img_id)
        image_path = original
        if styled_mapping is not None:
            name = styled_mapping.get("%012d" % img_id)
            if name is None:
                continue
            image_path = os.path.join(styled_img_root or img_root, name)
        records.append(PoseRecord(
            image=image_path, original_image=original, image_id=img_id,
            center=center, scale=scale,
            joints=np.zeros((17, 2), np.float32),
            joints_vis=np.ones((17,), np.float32),
            score=float(det["score"])))
    return records


def load_archdata_pose_records(labels_file, img_root) -> List[PoseRecord]:
    """ClassArch pose records: single annotated instance per image, COCO-17
    keypoints plus the original 18-kpt set (reference:
    ArchDataset.py:412-451)."""
    coco = COCO(labels_file)
    records = []
    for img_id in coco.getImgIds():
        im = coco.loadImgs(img_id)[0]
        anns = coco.loadAnns(coco.getAnnIds(imgIds=img_id, iscrowd=0))
        if not anns:
            continue
        ann = anns[0]
        kp = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
        arch_kp = np.asarray(ann.get("archdata_kpts",
                                     np.zeros(18 * 3)), np.float32).reshape(-1, 3)
        center, scale = _xywh_to_cs_archdata(*ann["bbox"][:4])
        records.append(PoseRecord(
            image=os.path.join(img_root, im["file_name"]),
            original_image=im.get("full_name", im["file_name"]),
            image_id=img_id, center=center, scale=scale,
            joints=kp[:, :2].copy(), joints_vis=np.clip(kp[:, 2], 0, 1),
            score=float(ann.get("num_keypoints", 17)),
            character_name=ann.get("character_name", ""),
            archdata_joints=arch_kp))
    return records


def canonical_archdata_split(records, split_file, split_set: str):
    """Apply the canonical ClassArch split: 'test' ids from the split JSON,
    'train' = complement (reference: ArchDataset.py:255-269)."""
    with open(split_file) as f:
        split = json.load(f)
    eval_idx = set(split["test"])
    if split_set == "train":
        keep = [i for i in range(len(records)) if i not in eval_idx]
    else:
        keep = sorted(eval_idx)
    return [records[i] for i in keep]


def percentage_subset(records, percentage: float):
    """First-N% subsampling (reference: ArchDataset.py:277-294)."""
    assert 1 <= percentage <= 100, percentage
    n = int(np.round(len(records) * percentage / 100))
    return records[:n]


# --------------------------------------------------- per-sample host stage
class AugmentationParams:
    """Sampler for the reference's train-time augmentation distributions
    (JointsDataset.py:164-186)."""

    def __init__(self, scale_factor=0.0, rotation_factor=0.0, flip=False,
                 num_joints_half_body=8, prob_half_body=0.0,
                 upper_body_ids=constants.UPPER_BODY_IDS, seed=13):
        self.sf = float(scale_factor)
        self.rf = float(rotation_factor)
        self.flip = bool(flip)
        self.nhb = num_joints_half_body
        self.phb = float(prob_half_body)
        self.upper = set(upper_body_ids)
        self.rng = np.random.RandomState(seed)

    def half_body(self, joints, vis):
        """Half-body zoom (JointsDataset.py:75-128)."""
        upper = [joints[j] for j in range(len(joints))
                 if vis[j] > 0 and j in self.upper]
        lower = [joints[j] for j in range(len(joints))
                 if vis[j] > 0 and j not in self.upper]
        sel = upper if (self.rng.randn() < 0.5 and len(upper) > 2) else lower
        if len(sel) < 2:
            return None, None
        sel = np.asarray(sel, np.float32)
        center = sel.mean(axis=0)
        lt, rb = sel.min(axis=0), sel.max(axis=0)
        w, h = rb[0] - lt[0], rb[1] - lt[1]
        if w > ASPECT_RATIO * h:
            h = w / ASPECT_RATIO
        elif w < ASPECT_RATIO * h:
            w = h * ASPECT_RATIO
        scale = np.array([w / PIXEL_STD, h / PIXEL_STD], np.float32) * 1.5
        return center, scale

    def sample(self, center, scale, joints, vis):
        """Returns (center, scale, rot, do_flip) for one training sample."""
        c, s, r = center.copy(), scale.copy(), 0.0
        if (vis.sum() > self.nhb and self.rng.rand() < self.phb):
            c_h, s_h = self.half_body(joints, vis)
            if c_h is not None:
                c, s = c_h, s_h
        s = s * np.clip(self.rng.randn() * self.sf + 1,
                        1 - self.sf, 1 + self.sf)
        if self.rng.rand() <= 0.6 and self.rf > 0:
            r = float(np.clip(self.rng.randn() * self.rf,
                              -self.rf * 2, self.rf * 2))
        do_flip = bool(self.flip and self.rng.rand() <= 0.5)
        return c, s, r, do_flip


_FLIP_PERM = None


def _flip_perm(num_joints):
    global _FLIP_PERM
    if _FLIP_PERM is None or len(_FLIP_PERM) != num_joints:
        perm = np.arange(num_joints)
        for a, b in constants.FLIP_PAIRS:
            perm[a], perm[b] = b, a
        _FLIP_PERM = perm
    return _FLIP_PERM


def process_sample(record: PoseRecord, image: np.ndarray,
                   aug: AugmentationParams | None = None):
    """Host stage for one sample: augmentation params + cv2 warp + joint
    transform. Returns (crop_f32 (256,192,3), joints (J,2), vis (J,), meta).

    Matches the reference's __getitem__ geometry exactly
    (JointsDataset.py:134-228); Gaussian targets are NOT rendered here —
    they are generated batched on device.
    """
    import cv2

    joints = record.joints.copy()
    vis = record.joints_vis.copy()
    c, s, r = record.center.copy(), record.scale.copy(), 0.0

    if aug is not None:
        c, s, r, do_flip = aug.sample(c, s, joints, vis)
        if do_flip:
            image = image[:, ::-1, :]
            perm = _flip_perm(len(joints))
            joints[:, 0] = image.shape[1] - joints[:, 0] - 1
            joints = joints[perm]
            vis = vis[perm]
            joints = joints * vis[:, None]
            c[0] = image.shape[1] - c[0] - 1

    trans = get_affine_matrix_np(c, s, r, IMAGE_SIZE)
    crop = cv2.warpAffine(image, trans.astype(np.float64),
                          (IMAGE_SIZE[0], IMAGE_SIZE[1]),
                          flags=cv2.INTER_LINEAR)
    ones = np.ones((len(joints), 1))
    pts = np.concatenate([joints, ones], axis=1) @ trans.T
    joints_out = np.where(vis[:, None] > 0, pts[:, :2], joints)

    meta = {"center": c.astype(np.float32), "scale": s.astype(np.float32),
            "rotation": np.float32(r), "score": np.float32(record.score),
            "image_id": np.int64(record.image_id),
            "perceptual_loss": np.float32(record.perceptual_loss)}
    return crop.astype(np.float32), joints_out.astype(np.float32), \
        vis.astype(np.float32), meta


def read_image(path: str) -> np.ndarray:
    """RGB uint8 image read (reference: JointsDataset.py:151-154)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    if img is None:
        raise ValueError(f"Failed to read image '{path}'")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
