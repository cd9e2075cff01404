"""
Pallas TPU kernel: fused heatmap peak decode.

One VMEM pass per image fuses what the XLA path does in several
(argmax, max, four neighbor gathers for the sub-pixel shift): the (H, W, J)
heatmap block is reduced joint-parallel on the VPU using one-hot selection
and rolled copies, emitting peak coordinates, peak values, and the
quarter-pixel refinement shifts. Grid = batch; each block is
64 x 48 x 17 x f32 ≈ 209 KB, comfortably inside VMEM.

Numerics match ops.decode.decode_heatmaps_nhwc exactly (see
tests/test_pallas_decode.py); ``decode_heatmaps_pallas`` is a drop-in for
the inference path on TPU (falls back to the XLA path elsewhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from stlpose_tpu.ops.affine import transform_preds


def _decode_kernel(hm_ref, coords_ref, maxvals_ref, shift_ref):
    _, H, W, J = hm_ref.shape
    HW = H * W
    flat = hm_ref[:].reshape(HW, J).astype(jnp.float32)

    idx = jnp.argmax(flat, axis=0)                       # (J,)
    maxvals = jnp.max(flat, axis=0)                      # (J,)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / W)
    valid = (maxvals > 0.0).astype(jnp.float32)
    x = x * valid
    y = y * valid

    # one-hot of the peak per joint (recomputed against the masked coords'
    # linear index so the reference's zeroed-invalid-coords semantics hold)
    lin = (y * W + x).astype(jnp.int32)                  # (J,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (HW, J), 0)
    onehot = (rows == lin[None, :]).astype(jnp.float32)

    # neighbor values via rolled copies + masked reduction (no gathers)
    def pick(shifted):
        return jnp.sum(shifted * onehot, axis=0)

    right = pick(jnp.roll(flat, -1, axis=0))
    left = pick(jnp.roll(flat, 1, axis=0))
    down = pick(jnp.roll(flat, -W, axis=0))
    up = pick(jnp.roll(flat, W, axis=0))

    px = jnp.floor(x + 0.5)
    py = jnp.floor(y + 0.5)
    ok = ((px > 1) & (px < W - 1) & (py > 1) & (py < H - 1)) \
        .astype(jnp.float32)
    sx = jnp.sign(right - left) * 0.25 * ok
    sy = jnp.sign(down - up) * 0.25 * ok

    coords_ref[0, 0, :] = x
    coords_ref[0, 1, :] = y
    maxvals_ref[0, 0, :] = maxvals
    shift_ref[0, 0, :] = sx
    shift_ref[0, 1, :] = sy


@functools.partial(jax.jit, static_argnames=("interpret",))
def heatmap_peaks_pallas(heatmaps_nhwc, interpret: bool = False):
    """Fused peak extraction: (N, H, W, J) -> coords (N, J, 2),
    maxvals (N, J), refined coords include the +-0.25 px shift."""
    N, H, W, J = heatmaps_nhwc.shape
    coords_xy, maxvals, shift = pl.pallas_call(
        _decode_kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, H, W, J), lambda n: (n, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, 2, J), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, J), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 2, J), lambda n: (n, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 2, J), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, J), jnp.float32),
            jax.ShapeDtypeStruct((N, 2, J), jnp.float32),
        ],
        interpret=interpret,
    )(heatmaps_nhwc)
    coords = jnp.stack([coords_xy[:, 0, :], coords_xy[:, 1, :]], axis=-1)
    sh = jnp.stack([shift[:, 0, :], shift[:, 1, :]], axis=-1)
    return coords + sh, maxvals[:, 0, :]


def decode_heatmaps_pallas(heatmaps_nhwc, center, scale,
                           interpret: bool = False):
    """Drop-in for decode_heatmaps_nhwc using the fused Pallas kernel."""
    coords, maxvals = heatmap_peaks_pallas(heatmaps_nhwc,
                                           interpret=interpret)
    H, W = heatmaps_nhwc.shape[1], heatmaps_nhwc.shape[2]
    preds = transform_preds(coords, center, scale, (W, H))
    return preds, maxvals, coords
