"""
Batched Gaussian heatmap target generation on device.

TPU-native replacement for the reference's per-joint windowed host loop
(reference: data/JointsDataset.py:230-286). The reference renders a
(2*3sigma+1)^2 Gaussian patch into the heatmap with integer-quantized center
and drops joints whose window misses the map entirely. We reproduce those
exact semantics analytically over the full (Hh, Hw) grid — a handful of fused
VPU elementwise ops per joint, no loops, no dynamic shapes:

    mu = trunc(joint / stride + 0.5)                  (integer center)
    g[y, x] = exp(-((x-mu_x)^2 + (y-mu_y)^2) / (2 sigma^2))
    masked to the reference's [mu-3s, mu+3s] window and in-bounds check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stlpose_tpu import constants


@functools.partial(jax.jit,
                   static_argnames=("heatmap_size", "image_size", "sigma",
                                    "use_joint_weights"))
def generate_targets(joints, joints_vis, *, heatmap_size=(48, 64),
                     image_size=(192, 256), sigma=2.0,
                     use_joint_weights=True):
    """Render Gaussian heatmap targets for a batch of poses.

    Args:
      joints: (N, J, 2) joint coordinates in crop-image pixels.
      joints_vis: (N, J) visibility weights (the reference's joints_vis[:, 0]).
      heatmap_size: static (Hw, Hh) — width, height (reference order).
      image_size: static (Iw, Ih).
      sigma: Gaussian std in heatmap pixels.
      use_joint_weights: multiply weights by the per-joint loss weight table
        (reference: JointsDataset.py:283-284 with HRNet_Coco.py:101-104).

    Returns:
      target: (N, J, Hh, Hw) float32 heatmaps.
      target_weight: (N, J) float32 per-joint weights (0 for dropped joints).
    """
    Hw, Hh = heatmap_size
    Iw, Ih = image_size
    stride_x = Iw / Hw
    stride_y = Ih / Hh
    tmp_size = sigma * 3.0

    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)

    # integer-quantized centers; trunc matches python int() for the
    # reference's int(x/stride + 0.5)
    mu_x = jnp.trunc(joints[..., 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints[..., 1] / stride_y + 0.5)

    # window corners (reference: JointsDataset.py:255-256)
    ul_x, ul_y = mu_x - tmp_size, mu_y - tmp_size
    br_x, br_y = mu_x + tmp_size + 1.0, mu_y + tmp_size + 1.0

    # joints whose window misses the heatmap entirely are dropped
    inside = ~((ul_x >= Hw) | (ul_y >= Hh) | (br_x < 0) | (br_y < 0))
    weight = vis * inside.astype(jnp.float32)

    gx = jnp.arange(Hw, dtype=jnp.float32)
    gy = jnp.arange(Hh, dtype=jnp.float32)
    dx2 = (gx[None, None, :] - mu_x[..., None]) ** 2        # (N, J, Hw)
    dy2 = (gy[None, None, :] - mu_y[..., None]) ** 2        # (N, J, Hh)
    g = jnp.exp(-(dy2[..., :, None] + dx2[..., None, :]) / (2.0 * sigma ** 2))

    # restrict to the reference's patch window [ul, br)
    in_x = (gx[None, None, :] >= ul_x[..., None]) & (gx[None, None, :] < br_x[..., None])
    in_y = (gy[None, None, :] >= ul_y[..., None]) & (gy[None, None, :] < br_y[..., None])
    window = in_y[..., :, None] & in_x[..., None, :]        # (N, J, Hh, Hw)

    visible = (weight > 0.5)[..., None, None]
    target = jnp.where(window & visible, g, 0.0)

    if use_joint_weights:
        jw = jnp.asarray(constants.JOINT_LOSS_WEIGHTS, jnp.float32)
        weight = weight * jw[None, :]
    return target, weight


def generate_targets_np(joints, joints_vis, heatmap_size=(48, 64),
                        image_size=(192, 256), sigma=2.0,
                        use_joint_weights=True):
    """Host-numpy mirror of :func:`generate_targets` (golden-test oracle and
    small-scale host paths). Follows the reference's windowed loop shape."""
    N, J = joints.shape[0], joints.shape[1]
    Hw, Hh = heatmap_size
    Iw, Ih = image_size
    tmp = int(sigma * 3)
    target = np.zeros((N, J, Hh, Hw), np.float32)
    weight = np.asarray(joints_vis, np.float32).copy()
    for n in range(N):
        for j in range(J):
            mu_x = int(joints[n, j, 0] / (Iw / Hw) + 0.5)
            mu_y = int(joints[n, j, 1] / (Ih / Hh) + 0.5)
            ul = (mu_x - tmp, mu_y - tmp)
            br = (mu_x + tmp + 1, mu_y + tmp + 1)
            if ul[0] >= Hw or ul[1] >= Hh or br[0] < 0 or br[1] < 0:
                weight[n, j] = 0.0
                continue
            if weight[n, j] <= 0.5:
                continue
            ys, xs = np.mgrid[0:Hh, 0:Hw]
            g = np.exp(-((xs - mu_x) ** 2 + (ys - mu_y) ** 2) / (2 * sigma ** 2))
            mask = (xs >= ul[0]) & (xs < br[0]) & (ys >= ul[1]) & (ys < br[1])
            target[n, j] = np.where(mask, g, 0.0).astype(np.float32)
    if use_joint_weights:
        weight = weight * constants.JOINT_LOSS_WEIGHTS[None, :]
    return target, weight
