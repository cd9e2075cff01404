"""
Horizontal-flip utilities for mirror augmentation and flip test-time
augmentation (reference: lib/transforms.py:147-181, lib/inference.py:16-27).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from stlpose_tpu import constants


def _pair_permutation(num_joints: int, flip_pairs) -> np.ndarray:
    perm = np.arange(num_joints)
    for a, b in flip_pairs:
        perm[a], perm[b] = b, a
    return perm


FLIP_PERM = _pair_permutation(constants.NUM_COCO_KPTS, constants.FLIP_PAIRS)


def flip_back(heatmaps, flip_pairs=constants.FLIP_PAIRS):
    """Un-flip heatmaps produced from a mirrored input.

    Equivalent of the reference's ``flip_back`` (lib/transforms.py:147-164):
    reverse the width axis and swap each left/right channel pair.

    Args:
      heatmaps: (N, J, H, W).
    """
    perm = jnp.asarray(_pair_permutation(heatmaps.shape[1], flip_pairs))
    return heatmaps[:, perm, :, ::-1]


def flip_back_nhwc(heatmaps, flip_pairs=constants.FLIP_PAIRS):
    """NHWC-layout variant of :func:`flip_back` (reverse W = axis 2, swap
    left/right channel pairs on axis 3) — keeps the eval path in the
    model's native layout."""
    perm = jnp.asarray(_pair_permutation(heatmaps.shape[3], flip_pairs))
    return heatmaps[:, :, ::-1, :][..., perm]


def average_flip_tta_nhwc(heatmaps, heatmaps_flipped, shift: bool = True):
    """NHWC-layout flip-TTA combine (see :func:`average_flip_tta`)."""
    unflipped = flip_back_nhwc(heatmaps_flipped)
    if shift:
        unflipped = unflipped.at[:, :, 1:, :].set(unflipped[:, :, :-1, :])
    return 0.5 * (heatmaps + unflipped)


def fliplr_joints(joints, joints_vis, width, flip_pairs=constants.FLIP_PAIRS):
    """Mirror joint annotations for a horizontally flipped image.

    Equivalent of the reference's ``fliplr_joints``
    (lib/transforms.py:167-181): x -> width - x - 1, swap left/right pairs,
    and zero out invisible joints (the reference returns joints*joints_vis).

    Args:
      joints: (..., J, 2or3); joints_vis: (..., J) visibility weights.
    """
    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)
    perm = jnp.asarray(_pair_permutation(joints.shape[-2], flip_pairs))
    flipped = joints.at[..., 0].set(width - joints[..., 0] - 1.0)
    flipped = jnp.take(flipped, perm, axis=-2)
    vis = jnp.take(vis, perm, axis=-1)
    return flipped * vis[..., None], vis


def average_flip_tta(heatmaps, heatmaps_flipped, shift: bool = True):
    """Combine direct and flipped forward passes.

    Equivalent of the reference's flip-TTA in ``forward_pass``
    (lib/inference.py:16-27): un-flip the mirrored heatmaps, shift them one
    pixel to the right (feature-map alignment trick from the HRNet codebase),
    and average with the direct output.
    """
    unflipped = flip_back(heatmaps_flipped)
    if shift:
        unflipped = unflipped.at[..., 1:].set(unflipped[..., :-1])
    return 0.5 * (heatmaps + unflipped)
