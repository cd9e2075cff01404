"""
PCK accuracy from heatmaps (train-time metric).

Equivalent of the reference's ``accuracy``/``calc_dists``/``dist_acc``
(reference: lib/metrics.py:268-364, including the reference's quirks: the
normalization vector is [h, w]/10 applied to (x, y) coordinates, and joints
whose *target* argmax coordinates are <= 1 are excluded). The reference's
``accuracy`` contains a corrupted line (metrics.py:355-356); this is the
intended behavior, implemented both on device (jit, used in the hot training
loop without a D2H sync) and on host (numpy oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stlpose_tpu.ops.decode import heatmap_argmax


@jax.jit
def pck_accuracy(output, target, thr: float = 0.5):
    """Mean PCK@thr over joints with valid targets.

    Args:
      output, target: (N, J, H, W) predicted and ground-truth heatmaps.
    Returns:
      avg_acc: scalar mean accuracy over valid joints (0 if none valid).
      per_joint: (J,) accuracy per joint, -1 where no valid samples.
      cnt: number of joints with at least one valid sample.
    """
    H, W = output.shape[2], output.shape[3]
    pred, _ = heatmap_argmax(output)
    gt, _ = heatmap_argmax(target)

    # reference quirk: norm = [h, w] / 10 elementwise on (x, y)
    norm = jnp.array([H, W], jnp.float32) / 10.0
    valid = (gt[..., 0] > 1) & (gt[..., 1] > 1)           # (N, J)
    dist = jnp.linalg.norm((pred - gt) / norm, axis=-1)   # (N, J)

    hit = (dist < thr) & valid
    n_valid = valid.sum(axis=0)                            # (J,)
    per_joint = jnp.where(n_valid > 0,
                          hit.sum(axis=0) / jnp.maximum(n_valid, 1), -1.0)
    joint_ok = per_joint >= 0
    cnt = joint_ok.sum()
    avg = jnp.where(cnt > 0, jnp.where(joint_ok, per_joint, 0.0).sum()
                    / jnp.maximum(cnt, 1), 0.0)
    return avg, per_joint, cnt


def pck_accuracy_np(output, target, thr: float = 0.5):
    """Host-numpy oracle with identical semantics."""
    output = np.asarray(output)
    target = np.asarray(target)
    H, W = output.shape[2], output.shape[3]

    def argmax_np(hm):
        N, J = hm.shape[0], hm.shape[1]
        flat = hm.reshape(N, J, -1)
        idx = flat.argmax(-1)
        mx = flat.max(-1)
        x = (idx % W).astype(np.float32)
        y = np.floor(idx / W).astype(np.float32)
        coords = np.stack([x, y], -1)
        coords *= (mx > 0)[..., None]
        return coords

    pred, gt = argmax_np(output), argmax_np(target)
    norm = np.array([H, W], np.float32) / 10.0
    valid = (gt[..., 0] > 1) & (gt[..., 1] > 1)
    dist = np.linalg.norm((pred - gt) / norm, axis=-1)
    hit = (dist < thr) & valid
    n_valid = valid.sum(0)
    per_joint = np.where(n_valid > 0, hit.sum(0) / np.maximum(n_valid, 1), -1.0)
    ok = per_joint >= 0
    cnt = int(ok.sum())
    avg = float(per_joint[ok].sum() / cnt) if cnt else 0.0
    return avg, per_joint, cnt
