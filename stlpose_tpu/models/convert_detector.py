"""
Detector checkpoint -> Flax conversion (both reference families).

``torch_fasterrcnn_to_flax``: torchvision ``fasterrcnn_resnet50_fpn``
state_dicts. ``torch_efficientdet_to_flax``: zylo117-layout EfficientDet
state_dicts (``efficientdet-d{0,3}.pth``), the format the reference loads
via ``EfficientDetBackbone.init_backbone`` (reference:
models/EfficientDet.py:127-133, lib/model_setup.py:75-89).

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


def torch_efficientdet_to_flax(state: Dict[str, np.ndarray],
                               num_classes: int = 1,
                               person_class: int = 0) -> dict:
    """Convert a zylo117-layout EfficientDet state_dict (numpy arrays) to
    {"params", "batch_stats"} for EfficientDetModule.

    Layout notes (reference: models/efficientdet_utils/model.py):
      * backbone keys sit under ``backbone_net.model.`` in lukemelas
        naming (``_blocks.{i}._depthwise_conv`` ...); expand==1 blocks
        carry no ``_expand_conv``/``_bn0``, matching our MBConv;
      * BiFPN cell l -> ``bifpn_{l}``; ``conv{p}_up``/``conv{p}_down``
        separable blocks -> ``conv_td_{p-3}``/``conv_bu_{p-3}`` with their
        inner BN -> ``bn_td``/``bn_bu``; fast-attention weights
        ``p{p}_w1``/``p{p}_w2`` -> ``w_td``/``w_bu``; the first cell's
        down-channel conv+BN stacks (incl. the second C4/C5 set and
        ``p5_to_p6``) -> ``dc{3..6}``/``dc4b``/``dc5b``;
      * head ``bn_list.{level}.{layer}`` -> ``bn{layer}_{level}``;
      * if the checkpoint classifier has more classes than
        ``num_classes`` (official d0/d3 ship 90 COCO classes), the header
        is SLICED to the ``num_classes`` consecutive checkpoint classes
        starting at ``person_class``, per anchor — channel order is
        anchor-major (model.py:369-372), the same convention our HeadNet
        reshape assumes. Pass ``person_class=None`` to instead drop the
        classifier header (the reference's strict=False behavior,
        models/EfficientDet.py:127-133) and keep the model's init.
    """
    variables = {"params": {}, "batch_stats": {}}
    header_cls_w = header_cls_b = None

    def put_bn(prefix, leaf, val):
        if leaf in _BN_PARAM:
            _set(variables["params"], prefix + (_BN_PARAM[leaf],),
                 np.asarray(val, np.float32))
        else:
            _set(variables["batch_stats"], prefix + (_BN_STAT[leaf],),
                 np.asarray(val, np.float32))

    def put_sep(prefix, part, leaf, val):
        """SeparableConvBlock: depthwise/pointwise wrapped convs."""
        sub = "dw" if part == "depthwise_conv" else "pw"
        _set(variables["params"],
             prefix + (sub, "kernel" if leaf == "weight" else "bias"),
             _conv(val) if leaf == "weight" else np.asarray(val, np.float32))

    for key, val in state.items():
        if key.endswith("num_batches_tracked") or \
                key.startswith("anchors."):
            continue
        # ---- EfficientNet backbone (lukemelas names)
        m = re.fullmatch(r"backbone_net\.model\._conv_stem\.weight", key)
        if m:
            _set(variables["params"], ("backbone", "stem_conv", "kernel"),
                 _conv(val))
            continue
        m = re.fullmatch(r"backbone_net\.model\._bn0\.(\w+)", key)
        if m:
            put_bn(("backbone", "stem_bn"), m.group(1), val)
            continue
        m = re.fullmatch(r"backbone_net\.model\._blocks\.(\d+)\."
                         r"_(expand_conv|depthwise_conv|project_conv)\."
                         r"weight", key)
        if m:
            i, which = m.groups()
            name = {"expand_conv": "expand_conv",
                    "depthwise_conv": "dw_conv",
                    "project_conv": "project_conv"}[which]
            _set(variables["params"],
                 ("backbone", f"block{i}", name, "kernel"), _conv(val))
            continue
        m = re.fullmatch(r"backbone_net\.model\._blocks\.(\d+)\."
                         r"_(bn[012])\.(\w+)", key)
        if m:
            i, bn, leaf = m.groups()
            put_bn(("backbone", f"block{i}", bn), leaf, val)
            continue
        m = re.fullmatch(r"backbone_net\.model\._blocks\.(\d+)\."
                         r"_(se_reduce|se_expand)\.(weight|bias)", key)
        if m:
            i, which, leaf = m.groups()
            _set(variables["params"],
                 ("backbone", f"block{i}", which,
                  "kernel" if leaf == "weight" else "bias"),
                 _conv(val) if leaf == "weight" else np.asarray(val,
                                                               np.float32))
            continue
        # ---- BiFPN cells
        m = re.fullmatch(r"bifpn\.(\d+)\.conv(\d)_(up|down)\."
                         r"(depthwise_conv|pointwise_conv)\.conv\."
                         r"(weight|bias)", key)
        if m:
            l, p, ud, part, leaf = m.groups()
            tag = "td" if ud == "up" else "bu"
            put_sep((f"bifpn_{l}", f"conv_{tag}_{int(p) - 3}"), part, leaf,
                    val)
            continue
        m = re.fullmatch(r"bifpn\.(\d+)\.conv(\d)_(up|down)\.bn\.(\w+)",
                         key)
        if m:
            l, p, ud, leaf = m.groups()
            tag = "td" if ud == "up" else "bu"
            put_bn((f"bifpn_{l}", f"bn_{tag}_{int(p) - 3}"), leaf, val)
            continue
        m = re.fullmatch(r"bifpn\.(\d+)\.p(\d)_w([12])", key)
        if m:
            l, p, w = m.groups()
            tag = "td" if w == "1" else "bu"
            _set(variables["params"],
                 (f"bifpn_{l}", f"w_{tag}_{int(p) - 3}"),
                 np.asarray(val, np.float32))
            continue
        m = re.fullmatch(r"bifpn\.(\d+)\."
                         r"(p3_down_channel|p4_down_channel|"
                         r"p5_down_channel|p5_to_p6|p4_down_channel_2|"
                         r"p5_down_channel_2)\.([01])\.(?:conv\.)?(\w+)",
                         key)
        if m:
            l, which, idx, leaf = m.groups()
            dc = {"p3_down_channel": "dc3", "p4_down_channel": "dc4",
                  "p5_down_channel": "dc5", "p5_to_p6": "dc6",
                  "p4_down_channel_2": "dc4b",
                  "p5_down_channel_2": "dc5b"}[which]
            if idx == "0":      # wrapped conv
                _set(variables["params"],
                     (f"bifpn_{l}", f"{dc}_conv",
                      "kernel" if leaf == "weight" else "bias"),
                     _conv(val) if leaf == "weight"
                     else np.asarray(val, np.float32))
            else:               # BN
                put_bn((f"bifpn_{l}", f"{dc}_bn"), leaf, val)
            continue
        # ---- heads
        m = re.fullmatch(r"(regressor|classifier)\.conv_list\.(\d+)\."
                         r"(depthwise_conv|pointwise_conv)\.conv\."
                         r"(weight|bias)", key)
        if m:
            head, i, part, leaf = m.groups()
            put_sep((head, f"conv{i}"), part, leaf, val)
            continue
        m = re.fullmatch(r"(regressor|classifier)\.bn_list\.(\d+)\.(\d+)\."
                         r"(\w+)", key)
        if m:
            head, level, layer, leaf = m.groups()
            put_bn((head, f"bn{layer}_{level}"), leaf, val)
            continue
        m = re.fullmatch(r"(regressor|classifier)\.header\."
                         r"(depthwise_conv|pointwise_conv)\.conv\."
                         r"(weight|bias)", key)
        if m:
            head, part, leaf = m.groups()
            if head == "classifier" and part == "pointwise_conv":
                # defer: may need per-anchor class slicing
                if leaf == "weight":
                    header_cls_w = val
                else:
                    header_cls_b = val
                continue
            put_sep((head, "head"), part, leaf, val)
            continue
        raise KeyError(f"Unrecognized EfficientDet state_dict key: {key}")

    if header_cls_b is not None:
        total = int(np.asarray(header_cls_b).shape[0])
        # classifier dw operates on fpn channels — count anchors from the
        # regressor header (4 per anchor)
        reg_b = state["regressor.header.pointwise_conv.conv.bias"]
        num_anchors = int(np.asarray(reg_b).shape[0]) // 4
        ckpt_classes = total // num_anchors
        if ckpt_classes == num_classes:
            sel = np.arange(total)
        elif person_class is None:
            sel = None      # drop the classifier header entirely
        elif person_class + num_classes <= ckpt_classes:
            # keep num_classes CONSECUTIVE checkpoint classes starting at
            # person_class, per anchor (anchor-major channel order)
            sel = (np.arange(num_anchors)[:, None] * ckpt_classes
                   + person_class + np.arange(num_classes)[None, :]
                   ).reshape(-1)
        else:
            raise ValueError(
                f"cannot slice {num_classes} classes starting at class "
                f"{person_class} out of a {ckpt_classes}-class checkpoint "
                f"header; pass person_class=None to drop the header")
        if sel is not None:
            w = _conv(header_cls_w)[:, :, :, sel]
            b = np.asarray(header_cls_b, np.float32)[sel]
            _set(variables["params"], ("classifier", "head", "pw",
                                       "kernel"), w)
            _set(variables["params"], ("classifier", "head", "pw",
                                       "bias"), b)
            # the paired depthwise kernel was already mapped above
        else:
            # remove the classifier header dw too so the caller keeps its
            # own initialized head pair
            variables["params"].get("classifier", {}).pop("head", None)

    return variables
