"""
Batched affine image warping on device.

TPU-native replacement for the reference's per-sample host
``cv2.warpAffine(img, trans, INTER_LINEAR)`` crops
(reference: data/JointsDataset.py:189-195, lib/transforms.py:30-60).
Instead of warping one crop at a time on a CPU thread, we warp a whole batch
inside one XLA program: for every destination pixel we compute the source
coordinate via the inverse crop similarity and bilinearly sample with
zero padding (cv2 BORDER_CONSTANT(0) semantics).

The sampler is expressed as two 1-D gathers + fused multiply-adds, which XLA
maps onto efficient dynamic-gather; per-crop work is ~190k samples so the op
is bandwidth-bound and fuses with the downstream normalize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stlpose_tpu.ops.affine import get_affine_params


def _bilinear_sample(img, xs, ys):
    """Bilinear sample a single (H, W, C) image at float coords, zero-padded.

    xs/ys: (...,) float32 source coordinates.
    Returns (..., C).
    """
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        vals = img[yc, xc]                     # gather, (..., C)
        return jnp.where(valid[..., None], vals, 0.0)

    w00 = ((1.0 - fx) * (1.0 - fy))[..., None]
    w01 = (fx * (1.0 - fy))[..., None]
    w10 = ((1.0 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    return (tap(y0i, x0i) * w00 + tap(y0i, x0i + 1) * w01 +
            tap(y0i + 1, x0i) * w10 + tap(y0i + 1, x0i + 1) * w11)


@functools.partial(jax.jit, static_argnames=("output_size",))
def affine_warp(images, center, scale, rot_deg, output_size):
    """Warp a batch of images to fixed-size crops.

    Args:
      images: (N, H, W, C) float32 source images (NHWC, any H/W).
      center: (N, 2), scale: (N, 2), rot_deg: (N,) crop parameters in the
        reference's pixel-std convention.
      output_size: static (dst_w, dst_h).

    Returns:
      (N, dst_h, dst_w, C) crops, bilinear, zero-padded out of bounds.
    """
    dst_w, dst_h = output_size
    # destination pixel grid
    xs = jnp.arange(dst_w, dtype=jnp.float32)
    ys = jnp.arange(dst_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)              # (dst_h, dst_w)

    # inverse map: dst -> src
    a, b, tx, ty = get_affine_params(center, scale, rot_deg, output_size,
                                     inv=True)

    def warp_one(img, a, b, tx, ty):
        sx = a * gx - b * gy + tx
        sy = b * gx + a * gy + ty
        return _bilinear_sample(img, sx, sy)

    return jax.vmap(warp_one)(images, a, b, tx, ty)


def crop_from_center_scale(image, centers, scales, output_size,
                           use_pallas: bool | None = None):
    """Extract multiple person crops from ONE image (two-stage inference).

    Equivalent of ``TransformDetection.__call__`` (lib/transforms.py:30-60)
    but batched over detections on device. On TPU this routes to the
    Pallas two-pass kernel (ops/pallas_warp.py) with a shared canvas —
    detection crops are unrotated, where the kernel is exactly direct
    bilinear — and falls back to the XLA gather elsewhere
    (STLPOSE_PALLAS_WARP=0 forces the XLA path).

    ``use_pallas``: explicit kernel selection. When None the
    STLPOSE_PALLAS_WARP env gate is read at call time — note that a
    *jitted* caller then freezes the gate into the compiled program at
    first trace; such callers should resolve ``use_pallas_warp()`` once
    outside the traced function and pass the bool here explicitly (as
    data/pipeline.py and bench.py do).

    Args:
      image: (H, W, C); centers: (K, 2); scales: (K, 2).
    Returns:
      (K, dst_h, dst_w, C) crops.
    """
    from stlpose_tpu.ops.pallas_warp import use_pallas_warp

    K = centers.shape[0]
    if use_pallas is None:
        use_pallas = use_pallas_warp()
    if use_pallas:
        from stlpose_tpu.ops.pallas_warp import crop_from_center_scale_pallas
        return crop_from_center_scale_pallas(image, centers, scales,
                                             output_size)
    images = jnp.broadcast_to(image, (K,) + image.shape)
    return affine_warp(images, centers, scales, jnp.zeros((K,), jnp.float32),
                       output_size)


def crop_from_center_scale_batched(images, centers, scales, img_idx,
                                   output_size,
                                   use_pallas: bool | None = None):
    """Extract K crops from a BATCH of images: crop k reads
    ``images[img_idx[k]]`` — the cross-batch crop-compaction primitive for
    two-stage serving (valid detections from a whole image batch gathered
    into one dense crop batch instead of a per-image pad). Routes to the
    Pallas kernel on TPU (canvas selected per crop in the index map — no
    K-fold image gather in HBM) with an XLA gather fallback.

    Same ``use_pallas`` contract as ``crop_from_center_scale``.

    Args:
      images: (B, H, W, C); centers/scales: (K, 2); img_idx: (K,) int32.
    Returns:
      (K, dst_h, dst_w, C) crops.
    """
    from stlpose_tpu.ops.pallas_warp import use_pallas_warp

    K = centers.shape[0]
    if use_pallas is None:
        use_pallas = use_pallas_warp()
    if use_pallas:
        from stlpose_tpu.ops.pallas_warp import (
            crop_from_center_scale_batched_pallas)
        return crop_from_center_scale_batched_pallas(
            images, centers, scales, img_idx, output_size)
    gathered = images[img_idx]                       # (K, H, W, C) gather
    return affine_warp(gathered, centers, scales,
                       jnp.zeros((K,), jnp.float32), output_size)
