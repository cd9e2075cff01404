"""
PyTorch-checkpoint -> Flax parameter conversion for HRNet.

The reference fine-tunes from ``pose_hrnet_w32_256x192.pth`` and stores
experiment checkpoints as torch ``state_dict``s
(reference: lib/model_setup.py:19-47, 162-252). This module maps those names
onto the Flax module tree of :class:`stlpose_tpu.models.hrnet.
PoseHighResolutionNet` so published weights can be loaded for AP-parity
evaluation. Operates on plain ``{name: np.ndarray}`` dicts — torch itself is
only needed to deserialize ``.pth`` files (see :func:`load_torch_statedict`).

Layout transforms: conv OIHW -> HWIO; BatchNorm weight/bias ->
scale/bias (params) and running_mean/var -> mean/var (batch_stats).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


def _torch_key_to_path(key: str):
    """Translate one torch state_dict key into (collection, flax_path).

    collection is "params" or "batch_stats"; returns None for keys to skip
    (num_batches_tracked).
    """
    parts = key.split(".")
    leaf = parts[-1]
    if leaf == "num_batches_tracked":
        return None

    def convbn(prefix: Tuple[str, ...], kind: str):
        # kind: "conv" or "bn"
        if kind == "conv":
            return ("params", prefix + ("conv", "kernel"))
        if leaf in _BN_PARAM:
            return ("params", prefix + ("bn", _BN_PARAM[leaf]))
        return ("batch_stats", prefix + ("bn", _BN_STAT[leaf]))

    # stem: conv1/bn1/conv2/bn2
    m = re.fullmatch(r"(conv|bn)([12])\.(\w+)", key)
    if m:
        return convbn((f"stem{m.group(2)}",), m.group(1))

    # layer1.{k}.{conv|bn}{q}.* and layer1.{k}.downsample.{0|1}.*
    m = re.fullmatch(r"layer1\.(\d+)\.(conv|bn)(\d)\.(\w+)", key)
    if m:
        return convbn((f"layer1_{m.group(1)}", f"cb{m.group(3)}"), m.group(2))
    m = re.fullmatch(r"layer1\.(\d+)\.downsample\.([01])\.(\w+)", key)
    if m:
        return convbn((f"layer1_{m.group(1)}", "down"),
                      "conv" if m.group(2) == "0" else "bn")

    # transition{t}.{i}.{0|1}.*   (aligned-branch conv+bn)
    m = re.fullmatch(r"transition(\d)\.(\d+)\.([01])\.(\w+)", key)
    if m:
        return convbn((f"transition{m.group(1)}_{m.group(2)}",),
                      "conv" if m.group(3) == "0" else "bn")
    # transition{t}.{i}.{j}.{0|1}.*  (new-branch downsample chain)
    m = re.fullmatch(r"transition(\d)\.(\d+)\.(\d+)\.([01])\.(\w+)", key)
    if m:
        return convbn(
            (f"transition{m.group(1)}_{m.group(2)}_{m.group(3)}",),
            "conv" if m.group(4) == "0" else "bn")

    # stage{s}.{m}.branches.{b}.{k}.{conv|bn}{q}.*
    m = re.fullmatch(r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\."
                     r"(conv|bn)(\d)\.(\w+)", key)
    if m:
        s, mod, b, k, kind, q, _ = m.groups()
        return convbn((f"stage{s}_m{mod}", f"branch{b}_block{k}", f"cb{q}"),
                      kind)
    m = re.fullmatch(r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\."
                     r"downsample\.([01])\.(\w+)", key)
    if m:
        s, mod, b, k, idx, _ = m.groups()
        return convbn((f"stage{s}_m{mod}", f"branch{b}_block{k}", "down"),
                      "conv" if idx == "0" else "bn")

    # stage{s}.{m}.fuse_layers.{i}.{j}.{0|1}.*  (up-fusion conv+bn)
    m = re.fullmatch(r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\."
                     r"([01])\.(\w+)", key)
    if m:
        s, mod, i, j, idx, _ = m.groups()
        return convbn((f"stage{s}_m{mod}", f"fuse{i}_{j}"),
                      "conv" if idx == "0" else "bn")
    # stage{s}.{m}.fuse_layers.{i}.{j}.{k}.{0|1}.*  (down-fusion chain)
    m = re.fullmatch(r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\."
                     r"([01])\.(\w+)", key)
    if m:
        s, mod, i, j, k, idx, _ = m.groups()
        return convbn((f"stage{s}_m{mod}", f"fuse{i}_{j}_{k}"),
                      "conv" if idx == "0" else "bn")

    # head
    if key == "final_layer.weight":
        return ("params", ("final_layer", "kernel"))
    if key == "final_layer.bias":
        return ("params", ("final_layer", "bias"))

    raise KeyError(f"Unrecognized torch state_dict key: {key}")


def _set_path(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_statedict_to_flax(state: Dict[str, np.ndarray]) -> dict:
    """Convert a torch HRNet state_dict (as numpy) to Flax variables.

    Returns {"params": ..., "batch_stats": ...} matching
    ``PoseHighResolutionNet``.
    """
    variables = {"params": {}, "batch_stats": {}}
    for key, val in state.items():
        mapped = _torch_key_to_path(key)
        if mapped is None:
            continue
        coll, path = mapped
        arr = np.asarray(val)
        if path[-1] == "kernel":
            arr = arr.transpose(2, 3, 1, 0)    # OIHW -> HWIO
        _set_path(variables[coll], path, arr.astype(np.float32))
    return variables


def load_torch_statedict(path: str) -> Dict[str, np.ndarray]:
    """Deserialize a ``.pth`` checkpoint to numpy (CPU torch required).

    Accepts either a bare state_dict or the reference's checkpoint bundle
    {"model_state_dict": ...} (reference: lib/model_setup.py:176-183).
    """
    import torch  # local import: torch is test/convert-time only

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    out = {}
    for k, v in blob.items():
        k = k[len("module."):] if k.startswith("module.") else k
        out[k] = v.detach().cpu().numpy()
    return out


def flax_params_to_torch_names(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (Flax -> torch names), used for checkpoint export and
    round-trip tests. Conv kernels go back HWIO -> OIHW."""
    inverse: Dict[str, np.ndarray] = {}

    def walk(node, path, coll):
        for k, v in node.items():
            p = path + (k,)
            if isinstance(v, dict):
                walk(v, p, coll)
            else:
                inverse[_flax_path_to_torch_key(p, coll)] = (
                    np.asarray(v).transpose(3, 2, 0, 1)
                    if p[-1] == "kernel" and np.asarray(v).ndim == 4
                    else np.asarray(v))

    walk(variables.get("params", {}), (), "params")
    walk(variables.get("batch_stats", {}), (), "batch_stats")
    return inverse


def _flax_path_to_torch_key(path, coll) -> str:
    """Best-effort inverse of :func:`_torch_key_to_path` (covers the module
    names emitted by our HRNet)."""
    inv_bn_param = {v: k for k, v in _BN_PARAM.items()}
    inv_bn_stat = {v: k for k, v in _BN_STAT.items()}

    def leafname(leaf):
        if leaf == "kernel":
            return "weight"
        if coll == "params":
            return inv_bn_param.get(leaf, leaf)
        return inv_bn_stat[leaf]

    mod = path[0]
    rest = path[1:]
    if mod in ("stem1", "stem2"):
        idx = mod[-1]
        base = "conv" + idx if rest[0] == "conv" else "bn" + idx
        return f"{base}.{leafname(rest[-1])}"
    if mod == "final_layer":
        return f"final_layer.{leafname(rest[-1])}"

    def cb_suffix(sub, rest):
        # sub in {cb1, cb2, cb3, down}
        if sub == "down":
            idx = "0" if rest[0] == "conv" else "1"
            return f"downsample.{idx}.{leafname(rest[-1])}"
        q = sub[-1]
        base = f"conv{q}" if rest[0] == "conv" else f"bn{q}"
        return f"{base}.{leafname(rest[-1])}"

    m = re.fullmatch(r"layer1_(\d+)", mod)
    if m:
        return f"layer1.{m.group(1)}.{cb_suffix(rest[0], rest[1:])}"
    m = re.fullmatch(r"transition(\d)_(\d+)_(\d+)", mod)
    if m:
        idx = "0" if rest[0] == "conv" else "1"
        return (f"transition{m.group(1)}.{m.group(2)}.{m.group(3)}."
                f"{idx}.{leafname(rest[-1])}")
    m = re.fullmatch(r"transition(\d)_(\d+)", mod)
    if m:
        idx = "0" if rest[0] == "conv" else "1"
        return f"transition{m.group(1)}.{m.group(2)}.{idx}.{leafname(rest[-1])}"
    m = re.fullmatch(r"stage(\d)_m(\d+)", mod)
    if m:
        s, mm = m.groups()
        sub = path[1]
        rest = path[2:]
        b = re.fullmatch(r"branch(\d+)_block(\d+)", sub)
        if b:
            return (f"stage{s}.{mm}.branches.{b.group(1)}.{b.group(2)}."
                    f"{cb_suffix(rest[0], rest[1:])}")
        f3 = re.fullmatch(r"fuse(\d+)_(\d+)_(\d+)", sub)
        if f3:
            idx = "0" if rest[0] == "conv" else "1"
            return (f"stage{s}.{mm}.fuse_layers.{f3.group(1)}.{f3.group(2)}."
                    f"{f3.group(3)}.{idx}.{leafname(rest[-1])}")
        f2 = re.fullmatch(r"fuse(\d+)_(\d+)", sub)
        if f2:
            idx = "0" if rest[0] == "conv" else "1"
            return (f"stage{s}.{mm}.fuse_layers.{f2.group(1)}.{f2.group(2)}."
                    f"{idx}.{leafname(rest[-1])}")
    raise KeyError(f"Cannot invert flax path {path}")
