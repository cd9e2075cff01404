"""
Dataset factory: wires experiment parameters to pose/detection pipelines.

Same dataset vocabulary and path layout as the reference's loader factory
(reference: data/data_loaders.py:21-448): pose datasets
coco / styled_coco / arch_data / combined; detection datasets additionally
red_black / open_subset (directory datasets); styled variants resolve
name-mapping dicts under ``<data>/mapping_dicts``.
"""

from __future__ import annotations

import json
import os

from stlpose_tpu.config import CONFIG
from stlpose_tpu.data import pose_dataset as pd
from stlpose_tpu.data import detection_dataset as dd
from stlpose_tpu.data.pipeline import PoseDataPipeline

POSE_DATASETS = ("coco", "styled_coco", "arch_data", "combined")
DETECTION_DATASETS = POSE_DATASETS + ("red_black", "open_subset")


def _styled_mapping(data_path, styles, alpha, train: bool):
    name = (f"train_dict_style_{styles}_alpha_{alpha}.json" if train
            else f"valid_dict_style_{styles}_alpha_{alpha}.json")
    path = os.path.join(data_path, "mapping_dicts", name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Styled-COCO mapping dict '{path}' missing; generate it with "
            "scripts/aux_styled_coco_preload.py")
    with open(path) as f:
        return json.load(f)


def build_pose_records(exp_data: dict, split: str,
                       perceptual_loss_dict=None, percentage=None,
                       data_path: str | None = None):
    """Pose records for one split of the experiment's dataset."""
    data_path = data_path or CONFIG["paths"]["data_path"]
    name = exp_data["dataset"]["dataset_name"]
    alpha = exp_data["dataset"].get("alpha", "0.5")
    styles = exp_data["dataset"].get("styles", "redblack")
    labels_dir = os.path.join(data_path, "annotations")
    train = split == "train"
    set_dir = "train2017" if train else "val2017"
    labels_file = os.path.join(
        labels_dir, "person_keypoints_train.json" if train
        else "person_keypoints_val.json")
    img_root = os.path.join(data_path, "original_images", set_dir)

    if name == "coco":
        use_gt = exp_data["evaluation"].get("use_gt_bbox", True)
        if train or use_gt:
            return pd.load_coco_pose_records(labels_file, img_root,
                                             is_train=train)
        bbox_file = os.path.join(
            data_path, "annotations",
            "COCO_val2017_detections_AP_H_56_person.json")
        return pd.load_detection_result_records(
            bbox_file, img_root,
            image_thre=exp_data["evaluation"].get("img_thr", 0.0))
    if name == "styled_coco":
        mapping = _styled_mapping(data_path, styles, alpha, train)
        styled_root = os.path.join(
            data_path, f"images_style_{styles}_alpha_{alpha}",
            "train" if train else "valid")
        return pd.load_coco_pose_records(
            labels_file, img_root, is_train=train, styled_mapping=mapping,
            styled_img_root=styled_root, alpha=alpha,
            perceptual_loss_dict=perceptual_loss_dict)
    if name == "arch_data":
        records = pd.load_archdata_pose_records(
            os.path.join(data_path, "annotations_arch_data",
                         "arch_data_keypoints.json"),
            os.path.join(data_path, "class_arch_poses", "characters"))
        split_file = os.path.join(CONFIG["paths"]["dict_path"],
                                  "arch_data_det_splits.json")
        if os.path.exists(split_file):
            records = pd.canonical_archdata_split(
                records, split_file, "train" if train else "test")
        if percentage is not None and train:
            records = pd.percentage_subset(records, percentage)
        return records
    if name == "combined":
        a = build_pose_records({**exp_data, "dataset": {
            **exp_data["dataset"], "dataset_name": "styled_coco"}}, split,
            perceptual_loss_dict, percentage, data_path)
        b = build_pose_records({**exp_data, "dataset": {
            **exp_data["dataset"], "dataset_name": "arch_data"}}, split,
            perceptual_loss_dict, percentage, data_path)
        return list(a) + list(b)
    raise ValueError(
        f"Dataset '{name}' not supported; use one of {POSE_DATASETS}")


def load_dataset(exp_data: dict, train: bool = True, validation: bool = True,
                 shuffle_train: bool = False, shuffle_valid: bool = False,
                 perceptual_loss_dict=None, percentage=None,
                 num_workers: int | None = None, pad_multiple: int = 1,
                 data_path: str | None = None):
    """Pose pipelines for the experiment (reference API:
    data/data_loaders.py:21-226). Returns (train_pipeline, valid_pipeline);
    either may be None."""
    bs = exp_data["training"]["batch_size"]
    nw = num_workers if num_workers is not None else CONFIG["num_workers"]
    # device_warp: host only letterboxes; crop warps + targets run batched
    # on device (BASELINE config #2). Toggle via the dataset group.
    dw = bool(exp_data["dataset"].get("device_warp", False))
    # inline AdaIN stylization (BASELINE config #4): built here so the
    # whole CLI surface (02_train and friends) reaches it through the
    # dataset.inline_style experiment parameter alone
    stylizer = style_bank = None
    style_alpha = 1.0
    ics = exp_data["dataset"].get("inline_style")
    if ics:
        from stlpose_tpu.models.adain import build_inline_stylizer
        stylizer, style_bank, style_alpha = build_inline_stylizer(ics)
    styled_valid = bool(ics.get("apply_to_valid")) if ics else False
    train_pipe = valid_pipe = None
    if train:
        recs = build_pose_records(exp_data, "train", perceptual_loss_dict,
                                  percentage, data_path)
        train_pipe = PoseDataPipeline(
            recs, bs, is_train=True, exp_data=exp_data,
            shuffle=shuffle_train, num_workers=nw,
            pad_multiple=pad_multiple, drop_last=True, device_warp=dw,
            stylizer=stylizer, style_bank=style_bank,
            style_alpha=style_alpha)
    if validation:
        recs = build_pose_records(exp_data, "valid", perceptual_loss_dict,
                                  None, data_path)
        valid_pipe = PoseDataPipeline(
            recs, bs, is_train=False, shuffle=shuffle_valid,
            num_workers=nw, pad_multiple=pad_multiple, device_warp=dw,
            stylizer=stylizer if styled_valid else None,
            style_bank=style_bank if styled_valid else None,
            style_alpha=style_alpha)
    return train_pipe, valid_pipe


def get_detection_dataset(exp_data: dict, split: str = "train",
                          shuffle: bool = False, num_workers: int | None = None,
                          pad_multiple: int = 1, data_path: str | None = None,
                          perceptual_loss_dict=None):
    """Detection pipelines (reference API: data/data_loaders.py:229-379)."""
    data_path = data_path or CONFIG["paths"]["data_path"]
    name = exp_data["dataset"]["dataset_name"]
    alpha = exp_data["dataset"].get("alpha", "0.5")
    styles = exp_data["dataset"].get("styles", "redblack")
    img_size = exp_data["dataset"].get("image_size", 400)
    bs = exp_data["training"]["batch_size"]
    nw = num_workers if num_workers is not None else CONFIG["num_workers"]
    train = split == "train"
    set_dir = "train2017" if train else "val2017"
    labels_file = os.path.join(
        data_path, "annotations",
        "person_keypoints_train.json" if train else "person_keypoints_val.json")
    img_root = os.path.join(data_path, "original_images", set_dir)

    if name == "coco":
        recs = dd.load_coco_detection_records(labels_file, img_root)
    elif name == "styled_coco":
        mapping = _styled_mapping(data_path, styles, alpha, train)
        styled_root = os.path.join(
            data_path, f"images_style_{styles}_alpha_{alpha}",
            "train" if train else "valid")
        recs = dd.load_coco_detection_records(
            labels_file, img_root, styled_mapping=mapping,
            styled_img_root=styled_root,
            perceptual_loss_dict=perceptual_loss_dict)
    elif name == "arch_data":
        recs = dd.load_archdata_detection_records(
            os.path.join(data_path, "annotations_arch_data", "all_data.json"),
            os.path.join(data_path, "class_arch_data"))
    elif name in ("red_black", "open_subset"):
        recs = dd.list_directory_records(
            os.path.join(data_path, "class_arch_data", name))
    else:
        raise ValueError(f"Detection dataset '{name}' not supported; "
                         f"use one of {DETECTION_DATASETS}")
    stylizer = style_bank = None
    style_alpha = 1.0
    ics = exp_data["dataset"].get("inline_style")
    if ics and (train or ics.get("apply_to_valid")):
        from stlpose_tpu.models.adain import build_inline_stylizer
        stylizer, style_bank, style_alpha = build_inline_stylizer(
            ics, crop_hw=(img_size, img_size))
    pipe = dd.DetectionDataPipeline(
        recs, bs, img_size=img_size, shuffle=shuffle, num_workers=nw,
        pad_multiple=pad_multiple, drop_last=train,
        stylizer=stylizer, style_bank=style_bank, style_alpha=style_alpha)
    return pipe


def get_vase_subset(img_size: int = 400, dataset_name: str | None = None,
                    data_path: str | None = None, batch_size: int = 1,
                    num_workers: int | None = None):
    """Loose vase-image pipeline for qualitative two-stage evaluation
    (reference: data/data_loaders.py:419-448 — images live under
    ``<data>/ccoimages_final``; pass ``dataset_name`` to read another
    directory, e.g. red_black / open_subset)."""
    data_path = data_path or CONFIG["paths"]["data_path"]
    sub = dataset_name or "ccoimages_final"
    d = os.path.join(data_path, sub)
    if not os.path.isdir(d) and dataset_name:
        d = os.path.join(data_path, "class_arch_data", dataset_name)
    recs = dd.list_directory_records(d)
    nw = num_workers if num_workers is not None else CONFIG["num_workers"]
    return dd.DetectionDataPipeline(recs, batch_size, img_size=img_size,
                                    num_workers=nw)
