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

# static short-axis patch budget for the fast FPN RoIAlign: the canonical
# level-assignment rule caps a box's on-level area at ~28^2 map pixels
# (sqrt(wh)/2^k <= 28 after the floor), so min(extent_x, extent_y) <= 28;
# +1 border margin each side still fits 32 rows
SHORT_EXTENT = 32


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


def _assign_levels(boxes, n_levels, canonical_scale, canonical_level):
    """Canonical FPN assignment k = floor(k0 + log2(sqrt(area)/224)),
    clipped to the available levels (torchvision LevelMapper)."""
    areas = jnp.maximum(0.0, boxes[:, 2] - boxes[:, 0]) * \
        jnp.maximum(0.0, boxes[:, 3] - boxes[:, 1])
    k = jnp.floor(canonical_level +
                  jnp.log2(jnp.sqrt(areas) / canonical_scale + 1e-8))
    return jnp.clip(k, 2, 2 + n_levels - 1)


def multilevel_roi_align_reference(feature_levels, boxes, strides,
                                   output_size: int = 7,
                                   sampling_ratio: int = 2,
                                   canonical_scale: float = 224.0,
                                   canonical_level: int = 4):
    """FPN RoIAlign, straightforward formulation: sample EVERY level for
    every box and mask-select the assigned one. Semantically the spec
    (oracle for the fast path below), but 4x the necessary gather work —
    and XLA lowers the 2-D bilinear gathers to slow HBM gathers, which
    made this ~95% of detector inference time at batch 16.
    """
    k = _assign_levels(boxes, len(feature_levels), canonical_scale,
                       canonical_level)
    out = None
    for li, (feat, stride) in enumerate(zip(feature_levels, strides)):
        pooled = roi_align_single_level(
            feat, boxes, output_size, sampling_ratio,
            spatial_scale=1.0 / stride)
        mask = (k == 2 + li).astype(pooled.dtype)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out


def _banded_interp_weights(pos, size, origin, extent):
    """(P, ns, extent) bilinear interpolation matrix for 1-D sample
    positions against patch-relative rows.

    Encodes torchvision's border rules exactly: positions outside
    [-1, size] contribute 0; positions in [-1, 0] clamp to row 0; the
    high tap clamps to the last row (frac hits 0 exactly at size-1).
    """
    inside = (pos >= -1.0) & (pos <= size[:, None])
    pc = jnp.clip(pos, 0.0, size[:, None] - 1.0)
    p0 = jnp.floor(pc)
    frac = pc - p0
    rel0 = (p0 - origin[:, None])[..., None]                 # (P, ns, 1)
    r = jnp.arange(extent, dtype=pos.dtype)[None, None, :]
    w = ((r == rel0) * (1.0 - frac)[..., None] +
         (r == rel0 + 1.0) * frac[..., None])
    return w * inside[..., None].astype(pos.dtype)


def multilevel_roi_align(feature_levels, boxes, strides,
                         output_size: int = 7, sampling_ratio: int = 2,
                         canonical_scale: float = 224.0,
                         canonical_level: int = 4):
    """FPN RoIAlign as patch extraction + two banded MATMULS (MXU work,
    zero point-gathers). Bit-equivalent to the reference formulation
    above (pinned by tests/test_roi_align_fast.py) but ~an order of
    magnitude faster on TPU.

    How: each box reads ONLY its assigned level. The canonical assignment
    rule bounds a box's on-level area to ~28^2 map pixels, so the box's
    SMALLER axis always fits a static 32-row patch; the longer axis gets
    the level's full (padded) extent. Per box we dynamic-slice one
    (32, PAD) x C patch (wide boxes) or (PAD, 32) x C patch (tall boxes)
    — contiguous block copies, not gathers — then resample with two
    banded bilinear-interpolation matmuls (separable regular sample grid)
    and average-pool sr^2 taps per bin. Both bucket orientations are
    computed and mask-selected to keep shapes static.
    """
    L = len(feature_levels)
    C = feature_levels[0].shape[-1]
    n, sr = output_size, sampling_ratio
    ns = n * sr
    P = boxes.shape[0]
    dtype = feature_levels[0].dtype
    # Bound check for the static patch budget: a whole-image box clamps to
    # the coarsest level, where its SHORT axis spans min(H, W) of that map;
    # +1 border tap each side must still fit SHORT_EXTENT rows. Holds for
    # all current configs (image_size<=~1024 with stride-32 coarsest); for
    # larger images fall back to multilevel_roi_align_reference.
    coarse_min = min(feature_levels[-1].shape[0], feature_levels[-1].shape[1])
    if coarse_min > SHORT_EXTENT - 2:
        raise ValueError(
            f"coarsest FPN level min-extent {coarse_min} exceeds the static "
            f"patch budget SHORT_EXTENT-2={SHORT_EXTENT - 2}; use "
            "multilevel_roi_align_reference for this geometry")
    maxHW = max(max(f.shape[0], f.shape[1]) for f in feature_levels)
    PAD = max(2 * SHORT_EXTENT, -(-maxHW // 8) * 8)
    # pad every level to (PAD, PAD), stack, and append the spatially
    # TRANSPOSED copy: tall boxes slice from the transposed half with x/y
    # swapped, so every patch has its SHORT axis on rows — one uniform
    # bucket instead of computing both orientations for every box
    pyramid = jnp.stack([
        jnp.pad(f, ((0, PAD - f.shape[0]), (0, PAD - f.shape[1]), (0, 0)))
        for f in feature_levels])                            # (L,PAD,PAD,C)
    pyramid = jnp.concatenate(
        [pyramid, jnp.swapaxes(pyramid, 1, 2)])              # (2L,...)
    sizes = jnp.asarray([[f.shape[0], f.shape[1]]
                         for f in feature_levels], jnp.float32)

    k = _assign_levels(boxes, L, canonical_scale, canonical_level)
    li = (k - 2).astype(jnp.int32)                           # (P,)
    stride = jnp.asarray(strides, jnp.float32)[li]
    size_h = sizes[li, 0]
    size_w = sizes[li, 1]

    b = boxes / stride[:, None]
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = jnp.maximum(b[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(b[:, 3] - y1, 1.0)

    # regular sample grid in bin units: (p // sr) + (p % sr + 0.5) / sr
    p_idx = jnp.arange(ns)
    grid = (p_idx // sr + (p_idx % sr + 0.5) / sr).astype(jnp.float32)
    px = x1[:, None] + grid[None, :] * (roi_w / n)[:, None]  # (P, ns)
    py = y1[:, None] + grid[None, :] * (roi_h / n)[:, None]

    # per-box orientation: short axis onto patch rows
    wide = roi_w >= roi_h                                    # short axis = y
    w3 = wide[:, None, None]
    pos_s = jnp.where(wide[:, None], py, px)
    pos_l = jnp.where(wide[:, None], px, py)
    size_s = jnp.where(wide, size_h, size_w)
    size_l = jnp.where(wide, size_w, size_h)
    src = jnp.where(wide, li, li + L)                # transposed half: tall

    o_s = jnp.clip(jnp.floor(pos_s.min(axis=1)) - 1.0, 0.0,
                   float(PAD - SHORT_EXTENT)).astype(jnp.int32)
    Ws = _banded_interp_weights(pos_s, size_s, o_s.astype(jnp.float32),
                                SHORT_EXTENT)                # (P,ns,SHORT)

    # long axis: each of the ns sample points needs exactly its 2 bilinear
    # tap columns, so slice (SHORT, 2, C) per sample point instead of the
    # whole (SHORT, PAD, C) band — ~PAD/(2*ns) less patch traffic, the
    # dominant detector cost (PROFILE_detector.md "what remains").
    # Border rules (torchvision bilinear_interpolate): outside [-1, size]
    # contributes 0; [-1, 0] clamps to col 0; the top tap clamps to the
    # last column. The 2-col slice must stay inside the REAL map, so its
    # origin clamps to size-2 and frac shifts accordingly (frac=1 then
    # selects the last column exactly).
    inside_l = (pos_l >= -1.0) & (pos_l <= size_l[:, None])
    pc = jnp.clip(pos_l, 0.0, size_l[:, None] - 1.0)
    c0 = jnp.clip(jnp.floor(pc), 0.0,
                  jnp.maximum(size_l[:, None] - 2.0, 0.0))
    frac = pc - c0                                   # in [0, 1]
    c0i = c0.astype(jnp.int32)                       # (P, ns)

    def slice_point(lvl, os_, c0_):
        return jax.lax.dynamic_slice(pyramid, (lvl, os_, c0_, 0),
                                     (1, SHORT_EXTENT, 2, C))[0]

    def slice_box(lvl, os_, c0s):
        return jax.vmap(slice_point, in_axes=(None, None, 0))(lvl, os_,
                                                              c0s)

    patches = jax.vmap(slice_box)(src, o_s, c0i)     # (P, ns, SHORT, 2, C)
    wl = jnp.where(inside_l, 1.0, 0.0)[..., None, None]      # (P, ns, 1, 1)
    f = frac[..., None, None].astype(dtype)
    # elementwise 2-tap interp in the FEATURE dtype (bf16 mode halves
    # traffic; jnp would otherwise silently promote bf16 x f32 -> f32)
    long_interp = (patches[..., 0, :] * (1.0 - f) +
                   patches[..., 1, :] * f) * wl.astype(dtype)
    # short-axis banded matmul; f32 path forces full MXU precision: TPU
    # matmuls default to reduced precision for f32 operands, which would
    # break the bit-equivalence to the gather formulation that the tests
    # pin (CLAUDE.md gotcha)
    Ws = Ws.astype(dtype)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    out = jnp.einsum("bps,blsc->bplc", Ws, long_interp,
                     precision=prec)                 # (P, ns_s, ns_l, C)
    # sr^2 bin pooling is per-axis and orientation-independent, so pool
    # FIRST, then restore (y, x) order for tall boxes (rows were x) on the
    # sr^2-smaller pooled tensor
    out = out.reshape(P, n, sr, n, sr, C).mean(axis=(2, 4))
    out = jnp.where(w3[..., None], out, jnp.swapaxes(out, 1, 2))
    return out.astype(dtype)
