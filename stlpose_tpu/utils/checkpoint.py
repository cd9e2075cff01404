"""
Checkpointing: Orbax-backed save/load of the full train bundle.

TPU-native equivalent of the reference's torch checkpoint files
(reference: lib/model_setup.py:162-252): the bundle holds the train-state
PyTree (params + BN stats + optimizer state + step), the epoch, scheduler
state, and the LR — saved under ``models/checkpoint_epoch_{N|final}`` inside
the experiment dir, with the same resume / weights-only / drop-head loading
modes. Orbax writes asynchronously-safe, atomically-renamed directories and
restores shard-by-shard onto the active mesh.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

from stlpose_tpu.train.state import PoseTrainState
from stlpose_tpu.train.optim import get_current_lr, set_current_lr


def checkpoint_dir(exp_path: str, detector: bool = False) -> str:
    d = os.path.join(exp_path, "models")
    if detector:
        d = os.path.join(d, "detector")
    os.makedirs(d, exist_ok=True)
    return d


def checkpoint_path(exp_path: str, epoch, detector: bool = False) -> str:
    name = (f"checkpoint_epoch_{epoch}" if epoch != "final"
            else "checkpoint_epoch_final")
    return os.path.join(checkpoint_dir(exp_path, detector), name)


def save_checkpoint(state: PoseTrainState, exp_path: str, epoch,
                    scheduler=None, detector: bool = False,
                    finished: bool = False):
    """Save the bundle; `epoch='final'` or finished=True writes the final
    checkpoint name (reference: lib/model_setup.py:162-207).

    Multi-process: Orbax's save is a COLLECTIVE — under multi-host JAX
    every process must call this (tests/test_distributed.py proves the
    2-process round trip). The state is device_get to host first, so the
    written bundle is topology-free: a checkpoint saved from an N-device
    mesh restores onto any other topology (the live replacement for the
    reference's dead cross-process merge(),
    lib/detection_coco_eval.py:165-196). Only process 0 writes the meta
    sidecar."""
    label = "final" if (finished or epoch == "final") else epoch
    path = checkpoint_path(exp_path, label, detector)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path) + ".orbax",
                   jax.device_get(state), force=True)
    if jax.process_index() == 0:
        meta = {
            "epoch": int(epoch) if not isinstance(epoch, str) else epoch,
            "lr": _maybe_lr(state),
            "scheduler": (scheduler.state_dict()
                          if scheduler is not None else None),
        }
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    return path


def _maybe_lr(state):
    try:
        return get_current_lr(state.opt_state)
    except Exception:
        return None


def load_checkpoint(template_state: PoseTrainState, exp_path: str, epoch,
                    scheduler=None, detector: bool = False,
                    only_model: bool = False, drop_head: bool = False,
                    head_paths: tuple = ("final_layer",)):
    """Restore a bundle.

    Modes mirror the reference (lib/model_setup.py:210-252):
      only_model: restore params/batch_stats only (fine-tune),
      drop_head: re-initialize head params from the template (transfer
        learning onto a different keypoint/class count),
      full resume: also restores optimizer state, step, epoch, scheduler.

    Returns (state, epoch).
    """
    path = checkpoint_path(exp_path, epoch, detector)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path) + ".orbax",
                                 jax.device_get(template_state))

    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    params = restored.params
    if drop_head:
        params = dict(params)
        for hp in head_paths:
            if hp in template_state.params:
                params[hp] = template_state.params[hp]

    if only_model:
        state = template_state.replace(params=params,
                                       batch_stats=restored.batch_stats)
        return state, 0

    state = template_state.replace(
        params=params, batch_stats=restored.batch_stats,
        opt_state=restored.opt_state, step=restored.step)
    if meta.get("lr") is not None:
        state = state.replace(
            opt_state=set_current_lr(state.opt_state, meta["lr"]))
    if scheduler is not None and meta.get("scheduler"):
        scheduler.load_state_dict(meta["scheduler"])
    ep = meta.get("epoch", 0)
    return state, (0 if ep == "final" else int(ep))


def list_checkpoints(exp_path: str, detector: bool = False):
    d = checkpoint_dir(exp_path, detector)
    out = []
    for name in sorted(os.listdir(d)):
        m = re.fullmatch(r"checkpoint_epoch_(\w+)\.orbax", name)
        if m:
            out.append(m.group(1))
    return out


def load_pretrained_variables(model, pth_path: str, input_shape=(1, 256, 192, 3)):
    """Load a torch ``.pth`` (reference pretrained/checkpoint file) into Flax
    variables via the converter; falls back to random init when absent
    (reference default pretrained path: lib/model_setup.py:39-42)."""
    from stlpose_tpu.models.convert import (load_torch_statedict,
                                            torch_statedict_to_flax)
    if pth_path and os.path.isfile(pth_path):
        return torch_statedict_to_flax(load_torch_statedict(pth_path))
    return None
