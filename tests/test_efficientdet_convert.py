"""EfficientDet weight converter: a synthetic zylo117-named state_dict
(the ``efficientdet-d{0,3}.pth`` layout the reference loads via
``EfficientDetBackbone.init_backbone``, models/EfficientDet.py:127-133)
must map bijectively onto the EfficientDetModule parameter tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.models.efficientdet import (EfficientDet,
                                             EfficientDetConfig)
from stlpose_tpu.models.convert_detector import torch_efficientdet_to_flax

TINY2 = EfficientDetConfig(
    image_size=128, fpn_channels=16, fpn_repeats=2, head_repeats=1,
    width_mult=0.35, depth_mult=0.35, pre_nms_top_n=64,
    detections_per_img=8)


def _leaves(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            out.update(_leaves(v, p))
        else:
            out["/".join(p)] = np.asarray(v)
    return out


def _flax_to_torch_names(variables):
    """Inverse mapping used only to synthesize a zylo117-shaped dict."""
    state = {}
    bn_p = {"scale": "weight", "bias": "bias"}
    bn_s = {"mean": "running_mean", "var": "running_var"}
    leaves = {**_leaves(variables["params"]),
              **_leaves(variables["batch_stats"])}

    def conv(arr):
        return arr.transpose(3, 2, 0, 1)

    def bn_leaf(x):
        return bn_p.get(x, bn_s.get(x))

    dc_inv = {"dc3": "p3_down_channel", "dc4": "p4_down_channel",
              "dc5": "p5_down_channel", "dc6": "p5_to_p6",
              "dc4b": "p4_down_channel_2", "dc5b": "p5_down_channel_2"}
    sep_inv = {"dw": "depthwise_conv", "pw": "pointwise_conv"}

    for path, arr in leaves.items():
        parts = path.split("/")
        if parts[0] == "backbone":
            if parts[1] == "stem_conv":
                state["backbone_net.model._conv_stem.weight"] = conv(arr)
            elif parts[1] == "stem_bn":
                state[f"backbone_net.model._bn0.{bn_leaf(parts[2])}"] = arr
            else:
                i = parts[1][len("block"):]
                sub = parts[2]
                pre = f"backbone_net.model._blocks.{i}"
                if sub in ("bn0", "bn1", "bn2"):
                    state[f"{pre}._{sub}.{bn_leaf(parts[3])}"] = arr
                elif sub in ("se_reduce", "se_expand"):
                    leaf = "weight" if parts[3] == "kernel" else "bias"
                    state[f"{pre}._{sub}.{leaf}"] = \
                        conv(arr) if leaf == "weight" else arr
                else:
                    name = {"expand_conv": "_expand_conv",
                            "dw_conv": "_depthwise_conv",
                            "project_conv": "_project_conv"}[sub]
                    state[f"{pre}.{name}.weight"] = conv(arr)
        elif parts[0].startswith("bifpn_"):
            li = parts[0][len("bifpn_"):]
            sub = parts[1]
            if sub.startswith("w_"):
                tag, lvl = sub[2:].split("_")
                w = "w1" if tag == "td" else "w2"
                state[f"bifpn.{li}.p{int(lvl) + 3}_{w}"] = arr
            elif sub.startswith("conv_"):
                tag, lvl = sub[len("conv_"):].split("_")
                ud = "up" if tag == "td" else "down"
                part = sep_inv[parts[2]]
                leaf = "weight" if parts[3] == "kernel" else "bias"
                state[f"bifpn.{li}.conv{int(lvl) + 3}_{ud}.{part}.conv."
                      f"{leaf}"] = conv(arr) if leaf == "weight" else arr
            elif sub.startswith("bn_"):
                tag, lvl = sub[3:].split("_")
                ud = "up" if tag == "td" else "down"
                state[f"bifpn.{li}.conv{int(lvl) + 3}_{ud}.bn."
                      f"{bn_leaf(parts[2])}"] = arr
            elif sub.endswith("_conv"):
                dc = dc_inv[sub[:-len("_conv")]]
                leaf = "weight" if parts[2] == "kernel" else "bias"
                state[f"bifpn.{li}.{dc}.0.conv.{leaf}"] = \
                    conv(arr) if leaf == "weight" else arr
            elif sub.endswith("_bn"):
                dc = dc_inv[sub[:-len("_bn")]]
                state[f"bifpn.{li}.{dc}.1.{bn_leaf(parts[2])}"] = arr
            else:
                raise KeyError(path)
        elif parts[0] in ("classifier", "regressor"):
            head = parts[0]
            sub = parts[1]
            if sub == "head":
                part = sep_inv[parts[2]]
                leaf = "weight" if parts[3] == "kernel" else "bias"
                state[f"{head}.header.{part}.conv.{leaf}"] = \
                    conv(arr) if leaf == "weight" else arr
            elif sub.startswith("conv"):
                i = sub[len("conv"):]
                part = sep_inv[parts[2]]
                leaf = "weight" if parts[3] == "kernel" else "bias"
                state[f"{head}.conv_list.{i}.{part}.conv.{leaf}"] = \
                    conv(arr) if leaf == "weight" else arr
            elif sub.startswith("bn"):
                r, lvl = sub[2:].split("_")
                state[f"{head}.bn_list.{lvl}.{r}.{bn_leaf(parts[2])}"] = arr
            else:
                raise KeyError(path)
        else:
            raise KeyError(path)
    return state


def _assert_trees_equal(got, want):
    got_p, want_p = _leaves(got["params"]), _leaves(want["params"])
    assert set(got_p) == set(want_p), (
        sorted(set(want_p) - set(got_p))[:5],
        sorted(set(got_p) - set(want_p))[:5])
    for k in want_p:
        np.testing.assert_allclose(got_p[k], want_p[k], atol=1e-6,
                                   err_msg=k)
    got_s, want_s = _leaves(got["batch_stats"]), _leaves(
        want["batch_stats"])
    assert set(got_s) == set(want_s)
    for k in want_s:
        np.testing.assert_allclose(got_s[k], want_s[k], atol=1e-6)


class TestEfficientDetConverter:
    def test_roundtrip_covers_full_tree(self):
        det = EfficientDet(TINY2)
        variables = jax.tree_util.tree_map(np.asarray,
                                           det.init(jax.random.PRNGKey(0)))
        torch_state = _flax_to_torch_names(variables)
        # num_batches_tracked buffers ride along in real checkpoints
        torch_state["backbone_net.model._bn0.num_batches_tracked"] = \
            np.asarray(0)
        back = torch_efficientdet_to_flax(torch_state, num_classes=1)
        _assert_trees_equal(back, variables)

    def test_converted_weights_run_forward(self):
        det = EfficientDet(TINY2)
        variables = jax.tree_util.tree_map(np.asarray,
                                           det.init(jax.random.PRNGKey(0)))
        back = torch_efficientdet_to_flax(_flax_to_torch_names(variables),
                                          num_classes=1)
        back = jax.tree_util.tree_map(jnp.asarray, back)
        x = jnp.zeros((1, TINY2.image_size, TINY2.image_size, 3))
        cls, reg, shapes = det.module.apply(back, x, train=False)
        cls2, reg2, _ = det.module.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(cls), np.asarray(cls2),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(reg), np.asarray(reg2),
                                   atol=1e-6)

    def test_multiclass_header_sliced_to_person(self):
        """Official d0/d3 checkpoints ship 90 COCO classes; the converter
        must slice the person class per anchor (channel order is
        anchor-major, efficientdet_utils/model.py:369-372)."""
        det = EfficientDet(TINY2)
        variables = jax.tree_util.tree_map(np.asarray,
                                           det.init(jax.random.PRNGKey(0)))
        state = _flax_to_torch_names(variables)
        n_anchors = 9
        ckpt_classes = 90
        rng = np.random.RandomState(1)
        w1 = state["classifier.header.pointwise_conv.conv.weight"]
        b1 = state["classifier.header.pointwise_conv.conv.bias"]
        cin = w1.shape[1]
        w90 = rng.randn(n_anchors * ckpt_classes, cin, 1, 1).astype(
            np.float32)
        b90 = rng.randn(n_anchors * ckpt_classes).astype(np.float32)
        for a in range(n_anchors):
            w90[a * ckpt_classes] = w1[a]
            b90[a * ckpt_classes] = b1[a]
        state["classifier.header.pointwise_conv.conv.weight"] = w90
        state["classifier.header.pointwise_conv.conv.bias"] = b90
        back = torch_efficientdet_to_flax(state, num_classes=1,
                                          person_class=0)
        _assert_trees_equal(back, variables)

    def test_disk_pth_load_matches_in_memory_converter(self, tmp_path):
        """The engines' load_detector_pretrained path (torch.save'd
        efficientdet .pth on disk -> load_torch_statedict ->
        torch_efficientdet_to_flax) is bit-identical to converting the
        in-memory dict (the runbook pattern,
        tests/test_real_weights_runbook.py)."""
        torch = pytest.importorskip("torch")
        from stlpose_tpu.engines.detector_trainer import (
            load_detector_pretrained)

        det = EfficientDet(TINY2)
        variables = jax.tree_util.tree_map(np.asarray,
                                           det.init(jax.random.PRNGKey(0)))
        state = _flax_to_torch_names(variables)
        path = tmp_path / "efficientdet-tiny.pth"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in state.items()}, str(path))
        from_disk = load_detector_pretrained(det, str(path))
        _assert_trees_equal(from_disk, variables)

    def test_multiclass_header_sliced_to_class_range(self):
        """num_classes > 1 keeps that many CONSECUTIVE checkpoint classes
        per anchor starting at person_class (regression: the slice used
        to pick exactly one channel per anchor regardless of
        num_classes, emitting a structurally invalid classifier head)."""
        import dataclasses
        cfg2 = dataclasses.replace(TINY2, num_classes=2)
        det = EfficientDet(cfg2)
        variables = jax.tree_util.tree_map(np.asarray,
                                           det.init(jax.random.PRNGKey(0)))
        state = _flax_to_torch_names(variables)
        n_anchors, ckpt_classes, start = 9, 90, 5
        rng = np.random.RandomState(2)
        w2 = state["classifier.header.pointwise_conv.conv.weight"]
        b2 = state["classifier.header.pointwise_conv.conv.bias"]
        cin = w2.shape[1]
        w90 = rng.randn(n_anchors * ckpt_classes, cin, 1, 1).astype(
            np.float32)
        b90 = rng.randn(n_anchors * ckpt_classes).astype(np.float32)
        for a in range(n_anchors):
            for c in range(2):
                w90[a * ckpt_classes + start + c] = w2[a * 2 + c]
                b90[a * ckpt_classes + start + c] = b2[a * 2 + c]
        state["classifier.header.pointwise_conv.conv.weight"] = w90
        state["classifier.header.pointwise_conv.conv.bias"] = b90
        back = torch_efficientdet_to_flax(state, num_classes=2,
                                          person_class=start)
        _assert_trees_equal(back, variables)

        with pytest.raises(ValueError, match="cannot slice"):
            torch_efficientdet_to_flax(state, num_classes=2,
                                       person_class=ckpt_classes - 1)

    def test_multiclass_header_dropped_when_person_class_none(self):
        """person_class=None mirrors the reference's strict=False load:
        backbone/BiFPN/regressor import, classifier header stays at its
        initialization (models/EfficientDet.py:127-133)."""
        det = EfficientDet(TINY2)
        variables = jax.tree_util.tree_map(np.asarray,
                                           det.init(jax.random.PRNGKey(0)))
        state = _flax_to_torch_names(variables)
        n_anchors, ckpt_classes = 9, 90
        cin = state["classifier.header.pointwise_conv.conv.weight"].shape[1]
        state["classifier.header.pointwise_conv.conv.weight"] = \
            np.zeros((n_anchors * ckpt_classes, cin, 1, 1), np.float32)
        state["classifier.header.pointwise_conv.conv.bias"] = \
            np.zeros((n_anchors * ckpt_classes,), np.float32)
        back = torch_efficientdet_to_flax(state, num_classes=1,
                                          person_class=None)
        assert "head" not in back["params"]["classifier"]
        assert "head" in back["params"]["regressor"]
