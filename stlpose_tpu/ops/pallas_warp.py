"""Pallas TPU kernel: batched affine crop warp (two-pass resampler).

TPU-native replacement for the XLA gather formulation in ``ops/warp.py``
(itself the device-side re-design of the reference's per-sample host
``cv2.warpAffine`` crops, reference: data/JointsDataset.py:189-195).
Profiling on a v5e chip (PROFILE_device_warp.json) showed XLA lowers the
batched 2-D bilinear gather to an HBM gather that costs ~2.3x the ENTIRE
HRNet-W32 train step at batch 128 — ~70% of device step time, far past the
15% Pallas threshold set in SURVEY §2.2. This kernel replaces the 2-D
gather with Mosaic's native ``tpu.dynamic_gather`` (the only gather shape
the TPU vector unit supports: per-row lane shuffles / per-column sublane
shuffles on a 2-D block), reached from JAX via 2-D ``jnp.take_along_axis``.

Algorithm: classic two-pass (Catmull-Smith) decomposition of the inverse
similarity map  [sx, sy] = [[a, -b], [b, a]] @ [x', y'] + [tx, ty]:

  pass 1 (x-resample, per SOURCE row y):
      h[y, x'] = lerp_x( src[y, :],  X(x', y) )
      X(x', y) = (a + b^2/a) * x' - (b/a) * y + (tx + (b/a) * ty)
  pass 2 (y-resample, per output column x'):
      out[y', x'] = lerp_y( h[:, x'],  b * x' + a * y' + ty )

Both passes are 1-D interpolations whose index varies per (row, lane) —
exactly ``tpu.dynamic_gather``'s contract. Out-of-bounds taps contribute 0
(cv2 BORDER_CONSTANT(0) semantics).

Exactness: for unrotated crops (the ENTIRE inference/eval path — rot is
always 0 there) the decomposition is mathematically identical to direct
bilinear sampling, and the kernel is bit-comparable to ``ops/warp.py``.
For rotated crops (train-time augmentation only) the two-pass filter is a
different — equally valid — member of the bilinear family: pass 1 samples
each source row at the row's own sheared x position instead of the common
(sx, sy) point, so values deviate slightly from cv2's direct bilinear on
high-frequency content. This is a deliberate, documented deviation on the
augmentation path (COMPONENTS.md); tests pin the rot=0 exactness and the
rotated-case agreement with a NumPy oracle of the same two-pass spec.

Conditioning: a = s*cos(theta) vanishes as |theta| -> 90 deg (the reference
samples rotations in [-2*rf, 2*rf] = [-90, 90], JointsDataset.py:177-180).
When |a| < |b| the wrapper pre-rotates the canvas by 90 degrees (a pixel
PERMUTATION — exact) and folds the rotation into the params, so the kernel
always sees |a| >= |b| (effective |rotation| <= 45 deg).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stlpose_tpu.ops.affine import get_affine_params


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def use_pallas_warp() -> bool:
    """Single gate for every Pallas-warp call site (pipeline + two-stage
    crops): STLPOSE_PALLAS_WARP=1/true/on forces the kernel,
    0/false/off forces the XLA gather, anything else -> on for the TPU
    backend only. Call per dispatch, NOT from inside a jitted function —
    a jitted caller would freeze the answer at first trace."""
    import os
    v = os.environ.get("STLPOSE_PALLAS_WARP", "auto").lower()
    if v in ("1", "true", "on"):
        return True
    if v in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"


_LANES = 128


def _chunked_lane_resample(src, pos, S, n_rows, out_pad):
    """1-D lane-dimension bilinear resample, decomposed for Mosaic.

    ``tpu.dynamic_gather`` (the only vectorized gather the TPU VPU has) is
    an INTRA-vreg shuffle: the source extent along the gathered dimension
    must fit one vreg (128 lanes). A 1-D resample from an S-wide source is
    therefore decomposed into (output 128-lane tiles) x (source 128-lane
    chunks) masked gathers that accumulate into the output — every gather
    sees a (n_rows, 128) source, (n_rows, 128) indices, (n_rows, 128) out.

    Args:
      src: (n_rows, S) source values.
      pos: (n_rows, out_pad) fractional sample positions along the lane dim.
    Returns:
      (n_rows, out_pad) resampled values, zero outside [0, S).
    """
    p0 = jnp.floor(pos)
    frac = pos - p0
    p0i = p0.astype(jnp.int32)

    out_tiles = []
    for t in range(out_pad // _LANES):
        sl = slice(t * _LANES, (t + 1) * _LANES)
        idx_t = p0i[:, sl]                       # (n_rows, 128)
        frac_t = frac[:, sl]
        acc = jnp.zeros((n_rows, _LANES), jnp.float32)
        for tap in range(2):
            w = (1.0 - frac_t) if tap == 0 else frac_t
            xi = idx_t + tap
            for c in range(S // _LANES):
                local = xi - c * _LANES
                valid = (local >= 0) & (local < _LANES)
                g = jnp.take_along_axis(
                    src[:, c * _LANES:(c + 1) * _LANES],
                    jnp.where(valid, local, 0), axis=1,
                    mode="promise_in_bounds")
                acc = acc + jnp.where(valid, g, 0.0) * w
        out_tiles.append(acc)
    return jnp.concatenate(out_tiles, axis=1)


def _warp_kernel(params_ref, src_ref, out_ref, *, S, DH, DW, DW_pad,
                 DH_pad):
    """One (image, channel) grid step: (S, S) canvas -> (DH, DW) crop."""
    n = pl.program_id(0)
    u = params_ref[n, 0]        # a + b^2/a
    r = params_ref[n, 1]        # b / a
    txr = params_ref[n, 2]      # tx + (b/a) * ty
    b = params_ref[n, 3]
    a = params_ref[n, 4]
    ty = params_ref[n, 5]

    src = src_ref[0, 0]                                     # (S, S)

    # pass 1: x-resample every source row y at X(x', y) -> h (S, DW_pad)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, DW_pad), 0).astype(
        jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, DW_pad), 1).astype(
        jnp.float32)
    px = u * col - r * row + txr
    h = _chunked_lane_resample(src, px, S, S, DW_pad)

    # pass 2 on the transposed intermediate, so the y-resample is also a
    # lane-dimension gather: hT (DW_pad, S); outT[x', y'] = lerp_y(hT[x'])
    hT = h.T                                                # (DW_pad, S)
    rowT = jax.lax.broadcasted_iota(jnp.int32, (DW_pad, DH_pad), 0).astype(
        jnp.float32)
    colT = jax.lax.broadcasted_iota(jnp.int32, (DW_pad, DH_pad), 1).astype(
        jnp.float32)
    py = b * rowT + a * colT + ty
    outT = _chunked_lane_resample(hT, py, S, DW_pad, DH_pad)
    out_ref[0, 0] = outT.T[:DH, :DW]


@functools.partial(jax.jit,
                   static_argnames=("output_size", "interpret",
                                    "may_rotate"))
def affine_warp_pallas(images, center, scale, rot_deg, output_size,
                       interpret: bool = False, may_rotate: bool = True):
    """Drop-in replacement for ``ops.warp.affine_warp`` (same convention).

    Args:
      images: (N, S, S, C) float32 square source canvases.
      center/scale/rot_deg: crop params in the reference's pixel-std
        convention (same as affine_warp).
      output_size: static (dst_w, dst_h).
      interpret: run the kernel in interpreter mode (CPU tests).
      may_rotate: static promise. False (|rot| <= 45 deg guaranteed, e.g.
        an unaugmented eval pipeline where rot is identically 0) skips the
        conditioning pre-rotation — a full extra read+write of the canvas
        batch that XLA cannot elide because the swap mask is data-driven.

    Returns:
      (N, dst_h, dst_w, C) float32 crops, zero-padded out of bounds.
    """
    N, S, S2, C = images.shape
    assert S == S2, "canvas must be square"
    assert S % _LANES == 0, (
        f"canvas size must be a multiple of {_LANES} for the chunked "
        f"dynamic_gather decomposition; got {S} (use ops.warp.affine_warp)")
    dst_w, dst_h = output_size
    a, b, tx, ty = get_affine_params(center, scale, rot_deg, output_size,
                                     inv=True)

    if may_rotate:
        # conditioning: guarantee |a| >= |b| by pre-rotating the canvas
        # 90 deg (an exact pixel permutation; see module docstring)
        swap = jnp.abs(a) < jnp.abs(b)
        rot_images = jnp.rot90(images, k=1, axes=(1, 2))
        images = jnp.where(swap[:, None, None, None], rot_images, images)
        a, b, tx, ty = (jnp.where(swap, b, a), jnp.where(swap, -a, b),
                        jnp.where(swap, ty, tx),
                        jnp.where(swap, (S - 1.0) - tx, ty))

    r = b / a
    params = jnp.stack([a + b * r, r, tx + r * ty, b, a, ty,
                        jnp.zeros_like(a), jnp.zeros_like(a)],
                       axis=1).astype(jnp.float32)          # (N, 8)

    src = jnp.transpose(images, (0, 3, 1, 2)).astype(jnp.float32)
    return _pallas_warp_call(params, src, N, C, S, dst_h, dst_w,
                             shared=False, interpret=interpret)


def _warp_kernel_indexed(params_ref, src_idx_ref, src_ref, out_ref, **kw):
    # src_idx is consumed by the BlockSpec index map (it selects which
    # canvas this crop DMAs in); the compute body never reads it
    del src_idx_ref
    _warp_kernel(params_ref, src_ref, out_ref, **kw)


def _pallas_warp_call(params, src, N, C, S, dst_h, dst_w, *, shared,
                      interpret, src_idx=None):
    """Launch the warp kernel. ``shared=True`` reads ONE (1, C, S, S)
    canvas for every crop (two-stage inference: K detections, one image)
    instead of a per-crop canvas — no K-fold broadcast in HBM.
    ``src_idx`` (K,) int32 generalizes this to a BATCH of canvases: crop n
    reads canvas src_idx[n] (selected in the BlockSpec index map from the
    prefetched scalars, so only the needed canvas block is DMA'd)."""
    DW_pad = _round_up(dst_w, _LANES)
    DH_pad = _round_up(dst_h, _LANES)
    if src_idx is not None:
        n_prefetch = 2
        src_index = lambda n, c, params, idx: (idx[n], c, 0, 0)
        out_index = lambda n, c, params, idx: (n, c, 0, 0)
        kernel = functools.partial(_warp_kernel_indexed, S=S, DH=dst_h,
                                   DW=dst_w, DW_pad=DW_pad, DH_pad=DH_pad)
        operands = (params, src_idx, src)
    else:
        n_prefetch = 1
        src_index = ((lambda n, c, params: (0, c, 0, 0)) if shared
                     else (lambda n, c, params: (n, c, 0, 0)))
        out_index = lambda n, c, params: (n, c, 0, 0)
        kernel = functools.partial(_warp_kernel, S=S, DH=dst_h, DW=dst_w,
                                   DW_pad=DW_pad, DH_pad=DH_pad)
        operands = (params, src)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(N, C),
            in_specs=[
                pl.BlockSpec((1, 1, S, S), src_index),
            ],
            out_specs=pl.BlockSpec((1, 1, dst_h, dst_w), out_index),
        ),
        out_shape=jax.ShapeDtypeStruct((N, C, dst_h, dst_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=("output_size", "interpret"))
def crop_from_center_scale_batched_pallas(images, centers, scales, img_idx,
                                          output_size,
                                          interpret: bool = False):
    """Extract K crops from a BATCH of images: crop k reads
    ``images[img_idx[k]]`` (two-stage serving with cross-batch crop
    compaction — valid detections from a whole image batch gathered into
    one dense crop batch; reference per-image flow:
    04_evaluate_vases_qualitatively.py:176-263).

    Same unrotated-exactness contract as ``crop_from_center_scale_pallas``;
    the canvas selection happens in the BlockSpec index map from the
    prefetched ``img_idx`` scalars, so each grid step DMAs only its own
    source canvas.

    Args:
      images: (B, H, W, C) float32; centers/scales: (K, 2);
      img_idx: (K,) int32 in [0, B).
    Returns:
      (K, dst_h, dst_w, C) crops.
    """
    B, H, W, C = images.shape
    K = centers.shape[0]
    S = _round_up(max(H, W), _LANES)
    canvases = jnp.zeros((B, S, S, C), jnp.float32)
    canvases = jax.lax.dynamic_update_slice(
        canvases, images.astype(jnp.float32), (0, 0, 0, 0))

    dst_w, dst_h = output_size
    zero = jnp.zeros((K,), jnp.float32)
    a, b, tx, ty = get_affine_params(centers, scales, zero, output_size,
                                     inv=True)
    params = jnp.stack([a, jnp.zeros_like(a), tx, b, a, ty,
                        jnp.zeros_like(a), jnp.zeros_like(a)],
                       axis=1).astype(jnp.float32)           # (K, 8)
    src = jnp.transpose(canvases, (0, 3, 1, 2))              # (B, C, S, S)
    return _pallas_warp_call(params, src, K, C, S, dst_h, dst_w,
                             shared=False, interpret=interpret,
                             src_idx=img_idx.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("output_size", "interpret"))
def crop_from_center_scale_pallas(image, centers, scales, output_size,
                                  interpret: bool = False):
    """Extract K person crops from ONE image via the Pallas kernel
    (two-stage inference; same contract as ops.warp.crop_from_center_scale,
    reference: lib/transforms.py:30-60).

    Detection crops are unrotated, which is exactly the regime where the
    two-pass kernel is bit-equal to direct bilinear, so this path has NO
    filter-scheme deviation. The image is zero-padded to a 128-multiple
    square on device (static shapes) — identical to BORDER_CONSTANT(0)
    out-of-bounds semantics — and the kernel reads the single shared
    canvas for every crop instead of broadcasting it K times.
    """
    H, W, C = image.shape
    K = centers.shape[0]
    S = _round_up(max(H, W), _LANES)
    canvas = jnp.zeros((S, S, C), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(
        canvas, image.astype(jnp.float32), (0, 0, 0))

    dst_w, dst_h = output_size
    zero = jnp.zeros((K,), jnp.float32)
    a, b, tx, ty = get_affine_params(centers, scales, zero, output_size,
                                     inv=True)
    # rot=0: b == 0, so u = a, r = 0, txr = tx (no conditioning swap)
    params = jnp.stack([a, jnp.zeros_like(a), tx, b, a, ty,
                        jnp.zeros_like(a), jnp.zeros_like(a)],
                       axis=1).astype(jnp.float32)           # (K, 8)
    src = jnp.transpose(canvas, (2, 0, 1))[None]             # (1, C, S, S)
    return _pallas_warp_call(params, src, K, C, S, dst_h, dst_w,
                             shared=True, interpret=interpret)
