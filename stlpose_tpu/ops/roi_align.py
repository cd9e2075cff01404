"""
RoIAlign on device (batched, static shapes).

TPU-native replacement for torchvision's C++/CUDA RoIAlign used inside the
reference's Faster R-CNN (reference: lib/model_setup.py:70-73). Bilinear
sampling grids are computed for ALL proposals against EVERY FPN level and
the right level is selected with a mask — trading a small constant factor
of VPU work for a single static-shape XLA program with no dynamic
partitioning (SURVEY.md §7 "fixed shapes everywhere").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align_single_level(features, boxes, output_size: int = 7,
                           sampling_ratio: int = 2,
                           spatial_scale: float = 1.0):
    """RoIAlign of (P, 4) xyxy image-space boxes against one (H, W, C) map.

    Follows the torchvision aligned=False convention (continuous coords,
    bin averaged over sampling_ratio^2 bilinear taps).
    Returns (P, output_size, output_size, C).
    """
    H, W, C = features.shape
    boxes = boxes * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    sr = sampling_ratio
    # sample offsets inside each bin: (sr,) at (i + 0.5) / sr
    offs = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr
    bin_idx = jnp.arange(output_size, dtype=jnp.float32)
    # (out, sr) fractional positions along one axis in bin units
    pos = bin_idx[:, None] + offs[None, :]
    # (P, out*sr) absolute coords
    xs = x1[:, None] + pos.reshape(-1)[None, :] * bin_w[:, None]
    ys = y1[:, None] + pos.reshape(-1)[None, :] * bin_h[:, None]
    # aligned=False bilinear grid: the continuous coordinate IS the array
    # index (a pixel's value sits at integer index, no half-pixel shift).
    # torchvision's aligned=True variant would shift the roi start by -0.5;
    # the reference's detector uses aligned=False, so match that exactly
    # for imported-weight parity (ADVICE r1).

    def sample_one(xv, yv):
        """Bilinear sample (n,) coords each axis -> (ny, nx, C).

        Boundary semantics match torchvision's bilinear_interpolate:
        a point strictly outside (-1, size) contributes 0; coords in
        [-1, 0] clamp to 0; the high tap clamps to the last index.
        """
        gx, gy = jnp.meshgrid(xv, yv)           # (ny, nx)
        # closed interval: torchvision rejects only coord < -1 or
        # coord > size, so exactly -1 / size still clamp and contribute
        inside = (gx >= -1.0) & (gx <= W) & (gy >= -1.0) & (gy <= H)
        gx = jnp.clip(gx, 0.0, W - 1)
        gy = jnp.clip(gy, 0.0, H - 1)
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        fx = gx - x0
        fy = gy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def tap(yi, xi):
            return features[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]

        v = (tap(y0i, x0i) * ((1 - fx) * (1 - fy))[..., None] +
             tap(y0i, x0i + 1) * (fx * (1 - fy))[..., None] +
             tap(y0i + 1, x0i) * ((1 - fx) * fy)[..., None] +
             tap(y0i + 1, x0i + 1) * (fx * fy)[..., None])
        return jnp.where(inside[..., None], v, 0.0)

    samples = jax.vmap(sample_one)(xs, ys)      # (P, n, n, C)
    n = output_size
    samples = samples.reshape(-1, n, sr, n, sr, C)
    return samples.mean(axis=(2, 4))


def multilevel_roi_align(feature_levels, boxes, strides,
                         output_size: int = 7, sampling_ratio: int = 2,
                         canonical_scale: float = 224.0,
                         canonical_level: int = 4):
    """FPN RoIAlign: assign each box to a pyramid level by its scale
    (k = k0 + log2(sqrt(area)/224), clamped) and gather from that level.

    Args:
      feature_levels: list of (H_l, W_l, C) maps, fine->coarse (P2..P5).
      boxes: (P, 4) xyxy in image coordinates.
      strides: per-level stride (4, 8, 16, 32).
    Returns (P, output_size, output_size, C).
    """
    areas = jnp.maximum(0.0, boxes[:, 2] - boxes[:, 0]) * \
        jnp.maximum(0.0, boxes[:, 3] - boxes[:, 1])
    k = jnp.floor(canonical_level +
                  jnp.log2(jnp.sqrt(areas) / canonical_scale + 1e-8))
    min_level = 2
    k = jnp.clip(k, min_level, min_level + len(feature_levels) - 1)

    out = None
    for li, (feat, stride) in enumerate(zip(feature_levels, strides)):
        pooled = roi_align_single_level(
            feat, boxes, output_size, sampling_ratio,
            spatial_scale=1.0 / stride)
        mask = (k == min_level + li).astype(pooled.dtype)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out
