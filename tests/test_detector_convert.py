"""Detector weight converter: a synthetic torchvision-named state_dict must
map bijectively onto the FasterRCNNModule parameter tree."""

import numpy as np
import pytest

import jax

from stlpose_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from stlpose_tpu.models.convert_detector import torch_fasterrcnn_to_flax


def _leaves(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            out.update(_leaves(v, p))
        else:
            out["/".join(p)] = np.asarray(v)
    return out


def _flax_to_torch_names(variables, cfg):
    """Inverse mapping used only to synthesize a torchvision-shaped dict."""
    state = {}
    p = _leaves(variables["params"])
    s = _leaves(variables["batch_stats"])
    bn_p = {"scale": "weight", "bias": "bias"}
    bn_s = {"mean": "running_mean", "var": "running_var"}

    def conv(arr):
        return arr.transpose(3, 2, 0, 1)

    for path, arr in {**p, **s}.items():
        parts = path.split("/")
        if parts[0] == "backbone":
            if parts[1] == "stem_conv":
                state["backbone.body.conv1.weight"] = conv(arr)
            elif parts[1] == "stem_bn":
                leaf = bn_p.get(parts[2], bn_s.get(parts[2]))
                state[f"backbone.body.bn1.{leaf}"] = arr
            else:
                m = parts[1]          # layer{s}_{b}
                s_i, b_i = m[5:].split("_")
                sub = parts[2]
                if sub == "down":
                    idx = "0" if parts[3] == "conv" else "1"
                    leaf = ("weight" if parts[-1] == "kernel" else
                            bn_p.get(parts[-1], bn_s.get(parts[-1])))
                    key = (f"backbone.body.layer{s_i}.{b_i}."
                           f"downsample.{idx}.{leaf}")
                    state[key] = conv(arr) if parts[-1] == "kernel" else arr
                else:
                    q = sub[-1]
                    if parts[3] == "conv":
                        state[f"backbone.body.layer{s_i}.{b_i}."
                              f"conv{q}.weight"] = conv(arr)
                    else:
                        leaf = bn_p.get(parts[-1], bn_s.get(parts[-1]))
                        state[f"backbone.body.layer{s_i}.{b_i}."
                              f"bn{q}.{leaf}"] = arr
        elif parts[0] == "fpn":
            i = parts[1][-1]
            base = ("inner_blocks" if parts[1].startswith("lateral")
                    else "layer_blocks")
            if parts[-1] == "kernel":
                state[f"backbone.fpn.{base}.{i}.0.weight"] = conv(arr)
            else:
                state[f"backbone.fpn.{base}.{i}.0.bias"] = arr
        elif parts[0] == "rpn_head":
            name = {"conv": "conv", "cls": "cls_logits",
                    "reg": "bbox_pred"}[parts[1]]
            if parts[-1] == "kernel":
                state[f"rpn.head.{name}.weight"] = conv(arr)
            else:
                state[f"rpn.head.{name}.bias"] = arr
        elif parts[0] == "box_head":
            name = parts[1]
            root = ("roi_heads.box_head" if name in ("fc6", "fc7")
                    else "roi_heads.box_predictor")
            if parts[-1] == "kernel":
                w = arr.T
                if name == "fc6":
                    # NHWC-flattened input -> NCHW-flattened input
                    out = w.shape[0]
                    w = w.reshape(out, 7, 7, cfg.fpn_channels)
                    w = w.transpose(0, 3, 1, 2).reshape(out, -1)
                state[f"{root}.{name}.weight"] = w
            else:
                state[f"{root}.{name}.bias"] = arr
        else:
            raise KeyError(path)
    return state


class TestDetectorConverter:
    def test_roundtrip_covers_full_tree(self):
        cfg = FasterRCNNConfig(stage_sizes=(1, 1, 1, 1), width=8,
                               fpn_channels=16, image_size=64)
        det = FasterRCNN(cfg)
        variables = det.init(jax.random.PRNGKey(0))
        variables = jax.tree_util.tree_map(np.asarray, variables)

        torch_state = _flax_to_torch_names(variables, cfg)
        back = torch_fasterrcnn_to_flax(torch_state,
                                        roi_channels=cfg.fpn_channels)

        want_p = _leaves(variables["params"])
        got_p = _leaves(back["params"])
        assert set(got_p) == set(want_p), (
            sorted(set(want_p) - set(got_p))[:5],
            sorted(set(got_p) - set(want_p))[:5])
        for k in want_p:
            np.testing.assert_allclose(got_p[k], want_p[k], atol=1e-6,
                                       err_msg=k)
        want_s = _leaves(variables["batch_stats"])
        got_s = _leaves(back["batch_stats"])
        assert set(got_s) == set(want_s)
        for k in want_s:
            np.testing.assert_allclose(got_s[k], want_s[k], atol=1e-6)

    def test_old_style_names_accepted(self):
        cfg = FasterRCNNConfig(stage_sizes=(1, 1, 1, 1), width=8,
                               fpn_channels=16, image_size=64)
        det = FasterRCNN(cfg)
        variables = jax.tree_util.tree_map(
            np.asarray, det.init(jax.random.PRNGKey(0)))
        state = _flax_to_torch_names(variables, cfg)
        renamed = {}
        for k, v in state.items():
            k = k.replace("inner_blocks.0.0.", "inner_blocks.0.")
            k = k.replace("layer_blocks.0.0.", "layer_blocks.0.")
            renamed[k] = v
        back = torch_fasterrcnn_to_flax(renamed,
                                        roi_channels=cfg.fpn_channels)
        assert "lateral0" in back["params"]["fpn"]
