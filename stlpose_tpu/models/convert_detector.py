"""
torchvision ``fasterrcnn_resnet50_fpn`` checkpoint -> Flax conversion.

The reference fine-tunes torchvision's COCO-pretrained detector
(reference: lib/model_setup.py:70-73) and stores its checkpoints as torch
state_dicts (models/detector/checkpoint_*.pth). This maps those names onto
:class:`stlpose_tpu.models.faster_rcnn.FasterRCNNModule` so published
weights can seed the TPU detector.

Layout notes:
  * conv OIHW -> HWIO; linear (out, in) -> (in, out);
  * torchvision's FrozenBatchNorm2d carries weight/bias/running_mean/var —
    mapped onto our BatchNorm params/stats unchanged;
  * fc6 consumes flattened RoI features — torch flattens NCHW (C, 7, 7),
    we flatten NHWC (7, 7, C), so fc6's input dimension is permuted;
  * both old (``rpn.head.conv.weight``) and new
    (``rpn.head.conv.0.0.weight``, ``fpn.inner_blocks.{i}.0.weight``)
    torchvision namings are accepted.

torchvision itself is not installed in this environment, so the mapping is
validated by a bijective round-trip test against our module tree
(tests/test_detector_convert.py).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(arr):
    return np.asarray(arr, np.float32).transpose(2, 3, 1, 0)


def _fc(arr):
    return np.asarray(arr, np.float32).T


def torch_fasterrcnn_to_flax(state: Dict[str, np.ndarray],
                             roi_channels: int = 256,
                             roi_size: int = 7) -> dict:
    """Convert a torchvision fasterrcnn_resnet50_fpn state_dict (numpy) to
    {"params", "batch_stats"} for FasterRCNNModule."""
    variables = {"params": {}, "batch_stats": {}}

    def put_convbn(prefix, kind, leaf, val):
        if kind == "conv":
            _set(variables["params"], prefix + ("conv", "kernel"),
                 _conv(val))
        elif leaf in _BN_PARAM:
            _set(variables["params"], prefix + ("bn", _BN_PARAM[leaf]),
                 np.asarray(val, np.float32))
        else:
            _set(variables["batch_stats"], prefix + ("bn", _BN_STAT[leaf]),
                 np.asarray(val, np.float32))

    for key, val in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        # ---- backbone stem
        m = re.fullmatch(r"backbone\.body\.(conv1|bn1)\.(\w+)", key)
        if m:
            kind = "conv" if m.group(1) == "conv1" else "bn"
            name = "stem_conv" if kind == "conv" else "stem_bn"
            if kind == "conv":
                _set(variables["params"], ("backbone", name, "kernel"),
                     _conv(val))
            elif m.group(2) in _BN_PARAM:
                _set(variables["params"], ("backbone", name,
                                           _BN_PARAM[m.group(2)]),
                     np.asarray(val, np.float32))
            else:
                _set(variables["batch_stats"], ("backbone", name,
                                                _BN_STAT[m.group(2)]),
                     np.asarray(val, np.float32))
            continue
        # ---- backbone residual layers
        m = re.fullmatch(r"backbone\.body\.layer(\d)\.(\d+)\."
                         r"(conv|bn)(\d)\.(\w+)", key)
        if m:
            s, b, kind, q, leaf = m.groups()
            put_convbn(("backbone", f"layer{s}_{b}", f"cb{q}"), kind, leaf,
                       val)
            continue
        m = re.fullmatch(r"backbone\.body\.layer(\d)\.(\d+)\."
                         r"downsample\.([01])\.(\w+)", key)
        if m:
            s, b, idx, leaf = m.groups()
            put_convbn(("backbone", f"layer{s}_{b}", "down"),
                       "conv" if idx == "0" else "bn", leaf, val)
            continue
        # ---- FPN (old and new torchvision namings)
        m = re.fullmatch(r"backbone\.fpn\.inner_blocks\.(\d+)(?:\.0)?\."
                         r"(weight|bias)", key)
        if m:
            i, leaf = m.groups()
            _set(variables["params"],
                 ("fpn", f"lateral{i}", "kernel" if leaf == "weight"
                  else "bias"),
                 _conv(val) if leaf == "weight" else np.asarray(val,
                                                               np.float32))
            continue
        m = re.fullmatch(r"backbone\.fpn\.layer_blocks\.(\d+)(?:\.0)?\."
                         r"(weight|bias)", key)
        if m:
            i, leaf = m.groups()
            _set(variables["params"],
                 ("fpn", f"out{i}", "kernel" if leaf == "weight" else "bias"),
                 _conv(val) if leaf == "weight" else np.asarray(val,
                                                               np.float32))
            continue
        # ---- RPN head
        m = re.fullmatch(r"rpn\.head\.conv(?:\.0\.0)?\.(weight|bias)", key)
        if m:
            leaf = m.group(1)
            _set(variables["params"],
                 ("rpn_head", "conv", "kernel" if leaf == "weight"
                  else "bias"),
                 _conv(val) if leaf == "weight" else np.asarray(val,
                                                               np.float32))
            continue
        m = re.fullmatch(r"rpn\.head\.(cls_logits|bbox_pred)\."
                         r"(weight|bias)", key)
        if m:
            which = "cls" if m.group(1) == "cls_logits" else "reg"
            leaf = m.group(2)
            _set(variables["params"],
                 ("rpn_head", which, "kernel" if leaf == "weight"
                  else "bias"),
                 _conv(val) if leaf == "weight" else np.asarray(val,
                                                               np.float32))
            continue
        # ---- box head / predictor
        m = re.fullmatch(r"roi_heads\.box_head\.(fc6|fc7)\.(weight|bias)",
                         key)
        if m:
            fc, leaf = m.groups()
            arr = np.asarray(val, np.float32)
            if leaf == "weight" and fc == "fc6":
                # permute the flattened-RoI input dim: (out, C*H*W) NCHW
                # order -> (H*W*C, out) NHWC order
                out = arr.shape[0]
                arr = arr.reshape(out, roi_channels, roi_size, roi_size)
                arr = arr.transpose(0, 2, 3, 1).reshape(out, -1).T
            elif leaf == "weight":
                arr = arr.T
            _set(variables["params"],
                 ("box_head", fc, "kernel" if leaf == "weight" else "bias"),
                 arr)
            continue
        m = re.fullmatch(r"roi_heads\.box_predictor\.(cls_score|bbox_pred)\."
                         r"(weight|bias)", key)
        if m:
            name, leaf = m.groups()
            arr = np.asarray(val, np.float32)
            _set(variables["params"],
                 ("box_head", name, "kernel" if leaf == "weight"
                  else "bias"),
                 arr.T if leaf == "weight" else arr)
            continue
        raise KeyError(f"Unrecognized detector state_dict key: {key}")

    return variables
