"""
On-device heatmap decoding: argmax -> sub-pixel refinement -> un-warp.

TPU-native replacement for the reference's host-numpy decode
(reference: lib/pose_parsing.py:16-92). The whole decode stays in the same
XLA program as the model forward pass; only the final (N, J, 3) keypoints
cross to the host. All stages are batched reductions/gathers — no Python
loops over people or joints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stlpose_tpu.ops.affine import transform_preds


def heatmap_argmax(heatmaps):
    """Peak locations and values per joint heatmap.

    Batched equivalent of ``get_max_preds_hrnet``
    (lib/pose_parsing.py:16-55): flat argmax, (x, y) unravel, and zeroing of
    coordinates whose peak value is <= 0.

    Args:
      heatmaps: (N, J, H, W).
    Returns:
      coords: (N, J, 2) float32 (x, y); maxvals: (N, J) float32.
    """
    N, J, H, W = heatmaps.shape
    flat = heatmaps.reshape(N, J, H * W)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / W)
    coords = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0)[..., None].astype(jnp.float32)
    return coords * mask, maxvals


def refine_subpixel(heatmaps, coords):
    """Quarter-pixel shift toward the local gradient.

    Batched equivalent of the reference's post-processing loop
    (lib/pose_parsing.py:70-82): if the integer peak is strictly inside the
    border (1 < p < size-1), nudge 0.25 px in the sign of the central
    difference of the heatmap.
    """
    N, J, H, W = heatmaps.shape
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    ok = (px > 1) & (px < W - 1) & (py > 1) & (py < H - 1)
    pxc = jnp.clip(px, 1, W - 2)
    pyc = jnp.clip(py, 1, H - 2)

    flat = heatmaps.reshape(N, J, H * W)

    def at(yy, xx):
        return jnp.take_along_axis(flat, (yy * W + xx)[..., None],
                                   axis=-1)[..., 0]

    dx = at(pyc, pxc + 1) - at(pyc, pxc - 1)
    dy = at(pyc + 1, pxc) - at(pyc - 1, pxc)
    shift = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return coords + shift * ok[..., None].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("post_process",))
def decode_heatmaps(heatmaps, center, scale, post_process: bool = True):
    """Full decode: argmax + sub-pixel + inverse-affine to image coords.

    Batched equivalent of ``get_final_preds_hrnet``
    (lib/pose_parsing.py:58-92).

    Args:
      heatmaps: (N, J, H, W); center: (N, 2); scale: (N, 2).
    Returns:
      preds: (N, J, 2) keypoints in source-image pixels.
      maxvals: (N, J) peak confidences.
      coords: (N, J, 2) refined heatmap-space coordinates.
    """
    H, W = heatmaps.shape[2], heatmaps.shape[3]
    coords, maxvals = heatmap_argmax(heatmaps)
    if post_process:
        coords = refine_subpixel(heatmaps, coords)
    preds = transform_preds(coords, center, scale, (W, H))
    return preds, maxvals, coords


@functools.partial(jax.jit, static_argnames=("post_process",))
def decode_heatmaps_nhwc(heatmaps_nhwc, center, scale,
                         post_process: bool = True):
    """Decode straight from the model's NHWC output layout.

    Functionally identical to :func:`decode_heatmaps` on the transposed
    input, but avoids materializing the (N, J, H, W) copy — on TPU the
    transpose of a large heatmap batch costs more HBM traffic than the
    whole decode.
    """
    N, H, W, J = heatmaps_nhwc.shape
    flat = heatmaps_nhwc.reshape(N, H * W, J)
    idx = jnp.argmax(flat, axis=1)                     # (N, J)
    maxvals = jnp.max(flat, axis=1)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / W)
    coords = jnp.stack([x, y], axis=-1)
    coords = coords * (maxvals > 0.0)[..., None].astype(jnp.float32)

    if post_process:
        px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
        py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
        ok = (px > 1) & (px < W - 1) & (py > 1) & (py < H - 1)
        pxc = jnp.clip(px, 1, W - 2)
        pyc = jnp.clip(py, 1, H - 2)

        def at(yy, xx):
            lin = yy * W + xx                          # (N, J)
            return jnp.take_along_axis(flat, lin[:, None, :],
                                       axis=1)[:, 0, :]

        dx = at(pyc, pxc + 1) - at(pyc, pxc - 1)
        dy = at(pyc + 1, pxc) - at(pyc - 1, pxc)
        shift = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
        coords = coords + shift * ok[..., None].astype(jnp.float32)

    preds = transform_preds(coords, center, scale, (W, H))
    return preds, maxvals, coords


def keypoints_with_scores(heatmaps, center, scale):
    """Convenience: (N, J, 3) [x, y, score] array in image coordinates."""
    preds, maxvals, _ = decode_heatmaps(heatmaps, center, scale)
    return jnp.concatenate([preds, maxvals[..., None]], axis=-1)
