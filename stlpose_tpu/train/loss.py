"""
Pose losses and perceptual-loss weighting.

Equivalents of the reference's loss stack (reference: lib/loss.py):
``person_mse_loss`` reproduces ``PersonMSELoss`` (lib/loss.py:61-94) — the
masked, per-joint-averaged heatmap MSE — as one fused jnp expression;
``apply_perceptual_loss`` reproduces the styled-coco loss weighting
(lib/loss.py:97-150); ``load_perceptual_loss_dict`` the precomputed-JSON path
(lib/loss.py:154-198). The online VGG perceptual loss lives in
``models/vgg.py``.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp


def person_mse_loss(pred, target, target_weight=None):
    """Masked per-joint heatmap MSE.

    Matches the reference exactly: for each joint j,
    ``0.5 * mean_{b,hw}((w_bj * pred - w_bj * gt)^2)`` — note the weight
    multiplies *both* maps, so it enters squared — then the mean over joints
    (lib/loss.py:71-94).

    Args:
      pred, target: (N, J, H, W) or (N, H, W, J) heatmaps — axis layout is
        irrelevant as long as both match and `target_weight` aligns with J.
      target_weight: (N, J) per-joint weights, or None for unweighted.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if target_weight is None:
        diff = pred - target
        return 0.5 * jnp.mean(diff * diff)
    # reshape to (N, J, HW)
    n, j = target_weight.shape
    diff = (pred.reshape(n, j, -1) - target.reshape(n, j, -1))
    diff = diff * target_weight[..., None]
    return 0.5 * jnp.mean(diff * diff)


def apply_perceptual_loss(exp_data: dict, loss, perceptual_loss,
                          use_perceptual_loss: bool | None = None):
    """Fold the per-sample perceptual-quality weights into the task loss.

    Semantics of the reference (lib/loss.py:97-150): only active for the
    styled_coco dataset; either a lambda-weighted sum
    ``lambda_D * loss + lambda_P * mean(perc)`` or the multiplicative "add"
    scheme ``loss + loss * mean(perc)``.

    Args:
      exp_data: experiment parameter dict.
      loss: scalar task loss (traced or concrete).
      perceptual_loss: (N,) per-sample perceptual loss values.
      use_perceptual_loss: CLI override (reference's params flag).
    """
    training = exp_data["training"]
    enabled = bool(training.get("perceptual_loss", False))
    if use_perceptual_loss is not None:
        enabled = enabled or use_perceptual_loss
    if exp_data["dataset"]["dataset_name"] != "styled_coco" or not enabled:
        return loss

    mean_perc = jnp.mean(jnp.asarray(perceptual_loss, jnp.float32))
    lam_d = training.get("lambda_D")
    lam_p = training.get("lambda_P")
    if lam_d is not None and lam_p is not None:
        return loss * lam_d + mean_perc * lam_p

    weighting = training.get("perceptual_weight", "add")
    if weighting != "add":
        raise ValueError(f"Perceptual weighting '{weighting}' not supported")
    return loss + loss * mean_perc


def load_perceptual_loss_dict(exp_data: dict, dict_path_root: str,
                              use_perceptual_loss: bool | None = None):
    """Load the precomputed styled-image -> perceptual-loss mapping.

    Mirrors the reference contract (lib/loss.py:154-198): file name
    ``perceptual_loss_dict_alpha_{a}_styles_{s}.json`` under the mapping-dict
    root; returns None when the experiment doesn't use perceptual weighting.
    """
    training = exp_data["training"]
    enabled = bool(training.get("perceptual_loss", False))
    if use_perceptual_loss is not None:
        enabled = enabled or use_perceptual_loss
    if exp_data["dataset"]["dataset_name"] != "styled_coco" or not enabled:
        return None
    alpha = exp_data["dataset"]["alpha"]
    style = exp_data["dataset"]["styles"]
    path = os.path.join(
        dict_path_root,
        f"perceptual_loss_dict_alpha_{alpha}_styles_{style}.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Perceptual-loss dict '{path}' not found; precompute it with "
            "scripts/aux_create_offline_perceptual_loss.py")
    with open(path) as f:
        return json.load(f)
