"""Pallas TPU kernel: fused FPN RoIAlign patch extraction + resampling.

Why this kernel exists (PROFILE_detector_stages.json): after the strided
2-tap-column rework, RoIAlign extraction still costs 35 ms of the 48 ms
bf16 Faster R-CNN predict at batch 16 — XLA lowers the vmapped two-axis
dynamic slice to a gather whose (32, 2, C) elements move at ~54 GB/s
effective, far under HBM bandwidth. The access pattern the hardware
actually wants is: ONE contiguous (SHORT, PAD, C) burst per box out of
HBM into VMEM (the rows of a level are contiguous), then do ALL the
resampling on-chip. That is exactly this kernel:

  per box (grid step, double-buffered so DMA overlaps compute):
    DMA   pyramid[src, o_s : o_s+SHORT]          (SHORT, PAD, C) -> VMEM
    for each of the ns long-axis sample points i (unrolled):
      cols = patch[:, c0_i : c0_i+2, :]          2-tap columns
      L    = cols[:,0]*wlo_i + cols[:,1]*whi_i   long-axis lerp (VPU)
      out[i] = Ws_box @ L                        short-axis interp (MXU)

The interpolation semantics (torchvision border rules, orientation
handling via the transposed pyramid half, conditioning of the 2-column
slice origin) are IDENTICAL to ops/roi_align.py::multilevel_roi_align —
the host-side wrapper below reuses its exact index/weight arithmetic and
the kernel is equivalence-tested against it (tests/test_pallas_roi.py).

Scalar operands (level index, row origin, column origins, lerp weights)
ride the SMEM scalar-prefetch path; boxes are processed in chunks of
CHUNK so the prefetch arrays stay small. Reference role: torchvision
RoIAlign inside lib/model_setup.py:70-73.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stlpose_tpu.ops.roi_align import SHORT_EXTENT, _assign_levels, \
    _banded_interp_weights

CHUNK = 512          # boxes per pallas_call: bounds SMEM prefetch size
# resolved at import, never under trace (ADVICE r2 env-gate class).
# Default ON; only an explicit "0" disables — empty string means unset
# (ADVICE r4: an explicitly-empty var must keep the documented default).
_F32_TIGHT = (os.environ.get("STLPOSE_PALLAS_ROI_F32_TIGHT") or "1") != "0"
# DMA formulation (round 5): "pp" DMAs, per long-axis sample point, ONLY
# its 2 bilinear tap columns — (SHORT_PAL, 2C) per point, ns DMAs per box
# — instead of the full (SHORT_PAL, PAD*C) band ("band"): ~PAD/(2*ns) ≈
# 3.7x less patch traffic on the dominant detector stage
# (PROFILE_detector.md round-5 section). Hardware-validated bit-exact;
# default "pp", STLPOSE_PALLAS_ROI_MODE=band restores the round-3/4
# geometry.
_ROI_MODE = (os.environ.get("STLPOSE_PALLAS_ROI_MODE") or "pp").lower()
# Boxes per grid step for the pp kernel. Hypothesis was that one box
# per step leaves ~2 us/box of grid-step + per-DMA-wait overhead across
# 4096 sequential steps; HARDWARE-CLOSED round 5b
# (scripts/validate_pallas_roi_block_hw.py, v5e): blocked outputs are
# bit-identical to KB=1 at every block size (full-model checksums equal)
# but blocking pays <=0.8% (bf16 predict 526.8 -> 529.7 (pp2) -> 531.0
# (pp4); int8 patches 597.0 -> 595.1 — within run-to-run noise), i.e.
# the pipeline already hides the per-step overhead behind the in-flight
# DMAs. Default stays 1 (smallest VMEM footprint: KB=4 at bf16/C=256
# needs ~7.3 MB of the 16 MB core budget vs ~1.8 MB at KB=1);
# STLPOSE_PALLAS_ROI_BLOCK or an explicit "pp2"/"pp4" mode pins it.
_ROI_BLOCK = int(os.environ.get("STLPOSE_PALLAS_ROI_BLOCK") or "1")
# Pallas-path patch budget: the short axis needs <= ~30 rows, but Mosaic
# requires the DMA row offset to be sublane-tile aligned. The sublane
# tile is DTYPE-dependent — 8 rows for f32, 16 for bf16 — so the origin
# rounds DOWN to the dtype's tile and the extent covers worst-case
# misalignment: f32 7 + 30 -> 40, bf16 15 + 30 -> 48. The smaller f32
# window cuts the per-box DMA ~17% (PROFILE_detector.md DMA budget).


def _dma_geometry(dtype):
    """(ALIGN, SHORT_PAL) for the dtype's sublane tile.

    The f32 sublane tile is 8 rows (bf16: 16, int8: 32), so f32 legally
    uses an 8-aligned 40-row window — ~17% less DMA per box.
    HARDWARE-VALIDATED (scripts/validate_pallas_roi_hw.py on the v5e
    chip): bit-exact vs the XLA path on every adversarial box regime
    incl. the far-edge level-2 windows (the silent-zero bug class
    interpret mode cannot catch), identical full-model predict checksum,
    and 248.7 -> 273.6 f32 imgs/s at B=16 (+10%, PROFILE_detector.md
    round-4 section). Default ON for f32; STLPOSE_PALLAS_ROI_F32_TIGHT=0
    restores the shared 16/48 geometry. The env gate is resolved at
    import, never under trace.

    int8 patches (``patch_quant``) pay a 32-row sublane tile: origin
    aligns down to 32 and the 64-row window covers worst-case
    misalignment (31 + the ~30-row short-axis budget). Still a net DMA
    win: 64 int8 rows = 64 B/lane-col vs bf16's 48*2 = 96."""
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize == 1:
        return 32, 64
    if itemsize >= 4 and _F32_TIGHT:
        return 8, 40
    return 16, 48


def use_pallas_roi() -> bool:
    """Gate for the fused RoIAlign kernel: STLPOSE_PALLAS_ROI=1/0 forces,
    default = on for the TPU backend. Resolve OUTSIDE jit (the detector
    facade reads it once at construction) — a jitted caller would freeze
    the answer at first trace."""
    import os
    v = os.environ.get("STLPOSE_PALLAS_ROI", "auto").lower()
    if v in ("1", "true", "on"):
        return True
    if v in ("0", "false", "off"):
        return False
    return jax.default_backend() == "tpu"


def _roi_kernel(src_ref, os_ref, c0_ref, wlo_ref, whi_ref, ws_ref,
                pyr_ref, out_ref, patch0, patch1, sem, *, n_boxes, ns,
                PAD, C, ALIGN, SHORT_PAL):
    n = pl.program_id(0)

    def dma(box, pref, slot):
        return pltpu.make_async_copy(
            pyr_ref.at[src_ref[box],
                       pl.ds(pl.multiple_of(os_ref[box], ALIGN),
                             SHORT_PAL)],
            pref, sem.at[slot])

    def stage(cur, cur_slot, nxt, nxt_slot):
        # double buffering: box n's DMA was started at step n-1 (box 0 at
        # its own step); start box n+1 before waiting on box n. Buffers
        # are selected by STATIC parity branches — Mosaic's dynamic
        # leading-index reads of VMEM scratch are not trustworthy here.
        @pl.when(n == 0)
        def _():
            dma(0, cur, cur_slot).start()

        @pl.when(n + 1 < n_boxes)
        def _():
            dma(n + 1, nxt, nxt_slot).start()

        dma(n, cur, cur_slot).wait()

        ws = ws_ref[0]                               # (ns, SHORT)
        for i in range(ns):
            # patch rows are (PAD*C) flattened so the 2-tap column pair
            # is a LANE slice at offset c0*C — provably 128-aligned
            # (C % 128 == 0), which Mosaic requires for dynamic lane
            # offsets (a (PAD, C) layout would need dynamic SUBLANE
            # offsets, which it rejects)
            base = pl.multiple_of(c0_ref[n, i] * C, C)
            cols = cur[:, pl.ds(base, 2 * C)]              # (SHORT, 2C)
            L = (cols[:, :C] * wlo_ref[n, i] +
                 cols[:, C:] * whi_ref[n, i])              # (SHORT, C)
            # f32 inputs force full MXU precision (TPU matmuls default to
            # reduced precision for f32 — the CLAUDE.md geometry gotcha);
            # bf16 serving keeps the fast default
            prec = (jax.lax.Precision.HIGHEST
                    if ws.dtype == jnp.float32 else
                    jax.lax.Precision.DEFAULT)
            out_i = jax.lax.dot_general(
                ws, L.astype(ws.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                            # (ns, C)
            out_ref[0, i] = out_i.astype(out_ref.dtype)

    parity = jax.lax.rem(n, 2)

    @pl.when(parity == 0)
    def _():
        stage(patch0, 0, patch1, 1)

    @pl.when(parity == 1)
    def _():
        stage(patch1, 1, patch0, 0)


def _roi_kernel_pp(src_ref, os_ref, c0_ref, wlo_ref, whi_ref, ws_ref,
                   pyr_ref, out_ref, patch0, patch1, lbuf, sem, *,
                   n_steps, ns, C, ALIGN, SHORT_PAL, KB):
    """Per-point DMA formulation: each of the ns long-axis sample points
    DMAs ONLY its 2 bilinear tap columns — (SHORT_PAL, 2C) — instead of
    the box's full (SHORT_PAL, PAD*C) band. ~PAD/(2*ns) less HBM traffic
    on the dominant detector stage; the ns per-box matmuls collapse into
    ONE (ns, SHORT_PAL) @ (SHORT_PAL, ns*C) MXU dot per box against the
    lerp scratch. Interpolation semantics identical to _roi_kernel (the
    host arithmetic is shared verbatim).

    Each grid step processes a BLOCK of ``KB`` boxes (all KB*ns tap
    DMAs of a block start together per double-buffer stage): one box
    per step leaves ~2 us/box of grid-step + DMA-wait overhead on the
    hardware — see the round-5 block table in PROFILE_detector.md."""
    n = pl.program_id(0)

    def dma(step, j, i, pref, slot):
        # 2-D sliced HBM->VMEM copy: rows at the sublane-tile-aligned
        # window origin, the point's 2 tap columns at lane offset c0*C
        # (provably a C-multiple; C % 128 == 0 is checked by the caller)
        box = step * KB + j
        k = j * ns + i
        return pltpu.make_async_copy(
            pyr_ref.at[src_ref[box],
                       pl.ds(pl.multiple_of(os_ref[box], ALIGN),
                             SHORT_PAL),
                       pl.ds(pl.multiple_of(c0_ref[box, i] * C, C),
                             2 * C)],
            pref.at[:, k * 2 * C:(k + 1) * 2 * C],
            sem.at[slot, j, i])

    def start_all(step, pref, slot):
        for j in range(KB):
            for i in range(ns):
                dma(step, j, i, pref, slot).start()

    def stage(cur, cur_slot, nxt, nxt_slot):
        @pl.when(n == 0)
        def _():
            start_all(0, cur, cur_slot)

        @pl.when(n + 1 < n_steps)
        def _():
            start_all(n + 1, nxt, nxt_slot)

        prec = (jax.lax.Precision.HIGHEST
                if ws_ref.dtype == jnp.float32 else
                jax.lax.Precision.DEFAULT)
        for j in range(KB):
            box = n * KB + j
            for i in range(ns):
                dma(n, j, i, cur, cur_slot).wait()
                k = j * ns + i
                cols = cur[:, k * 2 * C:(k + 1) * 2 * C]   # (SHORT, 2C)
                # int8 patches promote to f32 against the f32 SMEM
                # weight exactly like bf16 ones do; the lerp result is
                # stored in the COMPUTE dtype scratch (bf16 serving
                # keeps bf16 precision, f32 keeps the bit-exactness
                # contract)
                L = (cols[:, :C] * wlo_ref[box, i] +
                     cols[:, C:] * whi_ref[box, i])        # (SHORT, C)
                lbuf[:, k * C:(k + 1) * C] = L.astype(lbuf.dtype)
            out_ref[j] = jax.lax.dot_general(
                ws_ref[j], lbuf[:, j * ns * C:(j + 1) * ns * C],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(out_ref.dtype)      # (ns, ns*C)

    parity = jax.lax.rem(n, 2)

    @pl.when(parity == 0)
    def _():
        stage(patch0, 0, patch1, 1)

    @pl.when(parity == 1)
    def _():
        stage(patch1, 1, patch0, 0)


def _roi_chunk_call(pyramid, src, o_s, c0, wlo, whi, ws, *, ns, PAD, C,
                    interpret, mode="band"):
    """One pallas_call over a CHUNK of boxes. Returns (N, ns_l, ns_s, C).

    ``pyramid`` may be int8 (``patch_quant`` path) — patches are DMA'd in
    the pyramid dtype while the lerp/matmul/output run in ``ws``'s
    compute dtype."""
    N = src.shape[0]
    pdtype = pyramid.dtype
    cdtype = ws.dtype
    ALIGN, SHORT_PAL = _dma_geometry(pdtype)
    if mode.startswith("pp"):
        # block size: largest power of two <= the requested block that
        # divides the chunk AND keeps the kernel's VMEM footprint
        # (2 patch buffers + lerp scratch) under ~10 MB of the 16 MB
        # core budget (the f32 geometry at KB=4 would need ~11.8 MB —
        # it caps at 2). "pp" uses the env/default block; an explicit
        # "pp1"/"pp2"/"pp4" pins it (the A/B sweep knob).
        KB = max(1, int(mode[2:]) if mode[2:] else _ROI_BLOCK)
        psz = jnp.dtype(pdtype).itemsize
        csz = jnp.dtype(cdtype).itemsize
        while KB > 1 and (
                N % KB != 0 or
                SHORT_PAL * KB * ns * C * (4 * psz + csz) > 10 * 2**20):
            KB //= 2
        kernel = functools.partial(_roi_kernel_pp, n_steps=N // KB, ns=ns,
                                   C=C, ALIGN=ALIGN, SHORT_PAL=SHORT_PAL,
                                   KB=KB)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,       # src, o_s, c0, wlo, whi
                grid=(N // KB,),
                in_specs=[
                    pl.BlockSpec((KB, ns, SHORT_PAL),
                                 lambda n, *_: (n, 0, 0)),   # Ws per block
                    pl.BlockSpec(memory_space=pl.ANY),       # pyramid HBM
                ],
                out_specs=pl.BlockSpec((KB, ns, ns * C),
                                       lambda n, *_: (n, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((SHORT_PAL, KB * ns * 2 * C), pdtype),
                    pltpu.VMEM((SHORT_PAL, KB * ns * 2 * C), pdtype),
                    pltpu.VMEM((SHORT_PAL, KB * ns * C), cdtype),
                    pltpu.SemaphoreType.DMA((2, KB, ns)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((N, ns, ns * C), cdtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(src, o_s, c0, wlo, whi, ws, pyramid)
        return out.reshape(N, ns, ns, C)
    if mode != "band":
        raise ValueError(f"unknown RoI DMA mode {mode!r}")
    kernel = functools.partial(_roi_kernel, n_boxes=N, ns=ns, PAD=PAD, C=C,
                               ALIGN=ALIGN, SHORT_PAL=SHORT_PAL)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,           # src, o_s, c0, wlo, whi
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, ns, SHORT_PAL),
                             lambda n, *_: (n, 0, 0)),      # Ws per box
                pl.BlockSpec(memory_space=pl.ANY),          # pyramid HBM
            ],
            out_specs=pl.BlockSpec((1, ns, ns, C),
                                   lambda n, *_: (n, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((SHORT_PAL, PAD * C), pdtype),
                pltpu.VMEM((SHORT_PAL, PAD * C), pdtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((N, ns, ns, C), cdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(src, o_s, c0, wlo, whi, ws, pyramid)


def multilevel_roi_align_pallas(feature_levels, boxes, strides,
                                output_size: int = 7,
                                sampling_ratio: int = 2,
                                canonical_scale: float = 224.0,
                                canonical_level: int = 4,
                                interpret: bool = False,
                                mode: str | None = None,
                                patch_quant: bool = False):
    """Drop-in replacement for ops.roi_align.multilevel_roi_align (one
    image) — see multilevel_roi_align_pallas_batched."""
    out = multilevel_roi_align_pallas_batched(
        [f[None] for f in feature_levels], boxes[None], strides,
        output_size, sampling_ratio, canonical_scale, canonical_level,
        interpret=interpret, mode=mode, patch_quant=patch_quant)
    return out[0]


def multilevel_roi_align_pallas_batched(feature_levels, boxes, strides,
                                        output_size: int = 7,
                                        sampling_ratio: int = 2,
                                        canonical_scale: float = 224.0,
                                        canonical_level: int = 4,
                                        interpret: bool = False,
                                        mode: str | None = None,
                                        patch_quant: bool = False):
    """Batched fused RoIAlign: ``feature_levels`` are per-level
    (B, h, w, C) maps, ``boxes`` is (B, P, 4); returns (B, P, n, n, C).

    All B*P boxes run through ONE kernel grid — the per-box DMA source
    index encodes (image, level, orientation), so no vmap-of-pallas is
    needed and the double-buffered DMA pipeline spans the whole batch.
    Index/weight arithmetic is identical to
    ops/roi_align.py::multilevel_roi_align.

    ``mode``: "pp" (default, STLPOSE_PALLAS_ROI_MODE overrides) DMAs per
    sample point only the 2 tap columns; "band" DMAs the full padded
    band per box (round-3/4 geometry). "pp1"/"pp2"/"pp4" pin the pp
    kernel's boxes-per-grid-step block (bare "pp" uses
    STLPOSE_PALLAS_ROI_BLOCK, default 1 — blocking measured <=0.8% on
    hardware and is kept only as an A/B knob; see the round-5b note at
    _ROI_BLOCK).

    ``patch_quant``: quantize the patch pyramid to int8 with dynamic
    per-(level, channel) symmetric scales before the DMA stage. RoIAlign
    is linear per channel and every tap of a box comes from ONE level,
    so dequantization is EXACT as a single post-pooling multiply by the
    box-level's channel scales — the only approximation is the int8
    rounding of the features themselves (bounded at absmax/254 per
    channel). Halves (vs bf16; 2.5x vs f32) the dominant per-box DMA.
    Serving knob — accuracy-bounded by tests/test_detector_bf16_accuracy
    style instruments; NOT the AP-parity configuration."""
    L = len(feature_levels)
    B, P = boxes.shape[:2]
    C = feature_levels[0].shape[-1]
    n, sr = output_size, sampling_ratio
    ns = n * sr
    dtype = feature_levels[0].dtype
    if mode is None:
        mode = _ROI_MODE
    maxHW = max(max(f.shape[1], f.shape[2]) for f in feature_levels)
    PAD = max(2 * SHORT_EXTENT, -(-maxHW // 8) * 8)
    coarse_min = min(feature_levels[-1].shape[1],
                     feature_levels[-1].shape[2])
    if coarse_min > SHORT_EXTENT - 2:
        raise ValueError(
            f"coarsest FPN level min-extent {coarse_min} exceeds the "
            f"static patch budget SHORT_EXTENT-2={SHORT_EXTENT - 2}")
    if C % 128 != 0 and not interpret:
        # the kernel's lane-offset trick needs C to be a lane-tile
        # multiple; thin test configs take the XLA path instead
        # (patch_quant is a no-op here — the fallback stays exact)
        from stlpose_tpu.ops.roi_align import multilevel_roi_align
        return jax.vmap(
            lambda fs, bx: multilevel_roi_align(
                list(fs), bx, strides, output_size, sampling_ratio,
                canonical_scale, canonical_level))(
            tuple(feature_levels), boxes)
    scale_arr = None
    if patch_quant:
        # dynamic symmetric per-(level, channel) scales over the whole
        # batch; the division runs in f32 so bf16 features do not lose
        # rounding-boundary precision on the way into int8
        scales = [jnp.maximum(jnp.abs(f.astype(jnp.float32))
                              .max(axis=(0, 1, 2)), 1e-8) / 127.0
                  for f in feature_levels]
        feature_levels = [
            jnp.clip(jnp.round(f.astype(jnp.float32) / s), -127, 127)
            .astype(jnp.int8)
            for f, s in zip(feature_levels, scales)]
        scale_arr = jnp.stack(scales)                        # (L, C) f32
    # Rows get ONE extra ALIGN of zero padding: near the far edge of the
    # largest map there is otherwise NO tile-aligned SHORT_PAL-row window
    # that both covers the box's short-axis rows and stays inside PAD rows
    # (the bug class every level-2 edge box hit on first hardware run).
    ALIGN, SHORT_PAL = _dma_geometry(feature_levels[0].dtype)
    PAD_ROWS = PAD + ALIGN
    # (B, 2L, PAD_ROWS, PAD, C): levels then their transposed copies
    normal = jnp.stack([
        jnp.pad(f, ((0, 0), (0, PAD_ROWS - f.shape[1]),
                    (0, PAD - f.shape[2]), (0, 0)))
        for f in feature_levels], axis=1)                    # (B,L,...)
    swapped = jnp.stack([
        jnp.pad(jnp.swapaxes(f, 1, 2),
                ((0, 0), (0, PAD_ROWS - f.shape[2]),
                 (0, PAD - f.shape[1]), (0, 0)))
        for f in feature_levels], axis=1)
    pyr = jnp.concatenate([normal, swapped], axis=1)
    # rows stay the DMA-sliced dim; (PAD, C) flattens into lanes for the
    # kernel's aligned dynamic column slices
    pyramid = pyr.reshape(B * 2 * L, PAD_ROWS, PAD * C)
    sizes = jnp.asarray([[f.shape[1], f.shape[2]]
                         for f in feature_levels], jnp.float32)

    flat = boxes.reshape(B * P, 4)
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)

    # --- identical index/weight arithmetic to multilevel_roi_align ------
    k = _assign_levels(flat, L, canonical_scale, canonical_level)
    li = (k - 2).astype(jnp.int32)
    stride = jnp.asarray(strides, jnp.float32)[li]
    size_h = sizes[li, 0]
    size_w = sizes[li, 1]
    b = flat / stride[:, None]
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = jnp.maximum(b[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(b[:, 3] - y1, 1.0)
    p_idx = jnp.arange(ns)
    grid = (p_idx // sr + (p_idx % sr + 0.5) / sr).astype(jnp.float32)
    px = x1[:, None] + grid[None, :] * (roi_w / n)[:, None]
    py = y1[:, None] + grid[None, :] * (roi_h / n)[:, None]
    wide = roi_w >= roi_h
    w3 = wide[:, None, None]
    pos_s = jnp.where(wide[:, None], py, px)
    pos_l = jnp.where(wide[:, None], px, py)
    size_s = jnp.where(wide, size_h, size_w)
    size_l = jnp.where(wide, size_w, size_h)
    src = jnp.where(wide, li, li + L) + img_idx * (2 * L)
    # 16-aligned patch origin (Mosaic DMA sublane-tile constraint); the
    # banded weights absorb the shift, SHORT_PAL rows cover the window,
    # and the PAD_ROWS over-allocation guarantees an aligned origin
    # exists for edge windows (align-down after this clip loses <= 15
    # rows at the top, which the extra row padding absorbs)
    o_s = jnp.clip(jnp.floor(pos_s.min(axis=1)) - 1.0, 0.0,
                   float(PAD + ALIGN - SHORT_PAL)).astype(jnp.int32)
    o_s = (o_s // ALIGN) * ALIGN
    Ws = _banded_interp_weights(pos_s, size_s, o_s.astype(jnp.float32),
                                SHORT_PAL)
    inside_l = (pos_l >= -1.0) & (pos_l <= size_l[:, None])
    pc = jnp.clip(pos_l, 0.0, size_l[:, None] - 1.0)
    c0 = jnp.clip(jnp.floor(pc), 0.0,
                  jnp.maximum(size_l[:, None] - 2.0, 0.0))
    frac = pc - c0
    c0i = c0.astype(jnp.int32)
    live = inside_l.astype(jnp.float32)
    wlo = (1.0 - frac) * live
    whi = frac * live
    # --------------------------------------------------------------------

    Ws = Ws.astype(dtype)
    PT = B * P
    chunk = min(CHUNK, -(-PT // 8) * 8)      # small PT: one small chunk
    pad_p = -PT % chunk
    if pad_p:
        def padp(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad_p,) + x.shape[1:], x.dtype)])
        src, o_s, c0i = padp(src), padp(o_s), padp(c0i)
        wlo, whi, Ws = padp(wlo), padp(whi), padp(Ws)
    n_chunks = (PT + pad_p) // chunk

    def one_chunk(args):
        s, o, c, lo, hi, w = args
        return _roi_chunk_call(pyramid, s, o, c, lo, hi, w, ns=ns,
                               PAD=PAD, C=C, interpret=interpret,
                               mode=mode)

    chunked = jax.lax.map(one_chunk, (
        src.reshape(n_chunks, chunk),
        o_s.reshape(n_chunks, chunk),
        c0i.reshape(n_chunks, chunk, ns),
        wlo.reshape(n_chunks, chunk, ns),
        whi.reshape(n_chunks, chunk, ns),
        Ws.reshape(n_chunks, chunk, ns, SHORT_PAL)))
    out_lm = chunked.reshape(n_chunks * chunk, ns, ns, C)[:PT]
    # the band kernel emits (PT, ns_long, ns_short, C) and downstream
    # expects (PT, ns_short, ns_long, C); the pp kernel's fused dot
    # already emits short-major (its dot LHS is the short-axis Ws)
    out = out_lm if mode.startswith("pp") else jnp.swapaxes(out_lm, 1, 2)
    out = out.reshape(PT, n, sr, n, sr, C).mean(axis=(2, 4))
    out = jnp.where(w3[..., None], out, jnp.swapaxes(out, 1, 2))
    if scale_arr is not None:
        # exact per-channel dequantization: every tap of box b came from
        # level li[b], and RoIAlign is linear per channel, so one
        # post-pooling multiply by that level's channel scales undoes the
        # int8 scaling (channel-scale/orientation commute: the transposed
        # pyramid half shares the same scales)
        out = (out.astype(jnp.float32) *
               scale_arr[li][:, None, None, :])
    return out.astype(dtype).reshape(B, P, n, n, C)
