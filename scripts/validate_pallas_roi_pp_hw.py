"""Hardware validation for the round-5 RoIAlign DMA formulations.

Two new kernel variants need first hardware contact (interpret mode
models neither Mosaic's DMA alignment rules nor its dynamic-lane-offset
support — misses are SILENT zeros, CLAUDE.md):

  * "pp" per-point DMA: ns small (SHORT_PAL, 2C) copies per box with a
    DYNAMIC LANE offset (c0*C) instead of the full (SHORT_PAL, PAD*C)
    band — ~3.7x less patch traffic on the dominant detector stage.
  * int8 patch pyramid (``patch_quant``): 32-row sublane tile -> the
    new (32, 64) window geometry, DMA'd at 1 byte/element.

Runs EVERYTHING in one process (one-JAX-process rule; chained honest
timing from bench.py):

  step 1  f32 pp vs XLA formulation: bit-exactness + silent-zero scan on
          the real 400px / C=256 geometry, 4 adversarial box regimes
  step 2  bf16 pp vs bf16 band kernel outputs (dtype-noise tolerance)
  step 3  int8 patch pyramid (band + pp) vs host-dequantized oracle
          through the XLA path (f32 compute; silent-zero scan)
  step 4  full Faster R-CNN predict throughput A/B at B=16:
          f32 band / f32 pp / bf16 band / bf16 pp / bf16 pp+int8
          (+ checksum cross-check: band vs pp f32 checksums must match
          bit-for-bit through the whole program)

Prints one JSON line per step. Reference role: torchvision RoIAlign,
/root/reference/src/lib/model_setup.py:70-73.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cases(img):
    import jax.numpy as jnp

    def rand_boxes(seed, P):
        r = np.random.RandomState(seed)
        x1 = r.uniform(0, img - 2, P)
        y1 = r.uniform(0, img - 2, P)
        w = r.uniform(1, img, P)
        h = r.uniform(1, img, P)
        return jnp.asarray(np.stack(
            [x1, y1, np.minimum(x1 + w, img), np.minimum(y1 + h, img)],
            -1), jnp.float32)

    return {
        "random_256": rand_boxes(1, 256),
        "extreme": jnp.asarray([
            [0.0, 0.0, 399.0, 10.0],
            [380.0, 0.0, 400.0, 400.0],
            [0.0, 0.0, 400.0, 400.0],
            [0.0, 100.0, 400.0, 130.0],
            [10.0, 10.0, 11.0, 11.0],
            [5.0, 5.0, 5.0, 5.0],
            [340.0, 340.0, 400.0, 400.0],
        ], jnp.float32),
        "far_edge_level2": jnp.asarray([
            [370.0, 250.0, 400.0, 295.0],
            [170.0, 390.0, 280.0, 400.0],
            [380.0, 295.0, 400.0, 400.0],
            [360.0, 80.0, 400.0, 225.0],
            [390.0, 390.0, 400.0, 400.0],
            [0.0, 370.0, 45.0, 400.0],
        ], jnp.float32),
        "chunk_boundary_13": rand_boxes(2, 13),
    }


def _scan(out, ref, tol):
    diff = float(np.abs(out - ref).max())
    zero_rows = int(((np.abs(out).sum(axis=(2, 3)) == 0) &
                     (np.abs(ref).sum(axis=(2, 3)) > 1e-3)).sum())
    return {"max_abs_diff": diff, "bit_exact": bool((out == ref).all()),
            "silent_zero_rows": zero_rows,
            "ok": diff <= tol and zero_rows == 0}


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from stlpose_tpu.ops.pallas_roi import (_dma_geometry,
                                            multilevel_roi_align_pallas)
    from stlpose_tpu.ops.roi_align import multilevel_roi_align

    print(json.dumps({
        "backend": jax.default_backend(),
        "geometry": {"f32": _dma_geometry(jnp.float32),
                     "bf16": _dma_geometry(jnp.bfloat16),
                     "int8": _dma_geometry(jnp.int8)}}), flush=True)

    strides = (4, 8, 16, 32)
    img, C = 400, 256
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(
        rng.randn((img + s - 1) // s, (img + s - 1) // s, C)
        .astype(np.float32) * 0.5) for s in strides]
    cases = _cases(img)
    all_ok = True

    # ---- step 1: f32 pp vs XLA, bit-exactness + silent-zero scan -------
    per_case = {}
    for name, boxes in cases.items():
        out = np.asarray(multilevel_roi_align_pallas(
            feats, boxes, strides, mode="pp"))
        ref = np.asarray(multilevel_roi_align(feats, boxes, strides))
        per_case[name] = _scan(out, ref, 1e-4)
        all_ok &= per_case[name]["ok"]
    print(json.dumps({"step": "f32_pp_vs_xla", "ok": all_ok,
                      "cases": per_case}), flush=True)

    # ---- step 2: bf16 pp vs bf16 band ----------------------------------
    feats16 = [f.astype(jnp.bfloat16) for f in feats]
    per_case = {}
    for name, boxes in cases.items():
        a = np.asarray(multilevel_roi_align_pallas(
            feats16, boxes, strides, mode="pp").astype(jnp.float32))
        b = np.asarray(multilevel_roi_align_pallas(
            feats16, boxes, strides, mode="band").astype(jnp.float32))
        per_case[name] = _scan(a, b, 0.05)   # bf16 dtype noise only
        all_ok &= per_case[name]["ok"]
    print(json.dumps({"step": "bf16_pp_vs_band", "ok": all_ok,
                      "cases": per_case}), flush=True)

    # ---- step 3: int8 patch pyramid vs host-dequantized oracle ---------
    deq = []
    for f in feats:
        s = jnp.maximum(jnp.abs(f).max(axis=(0, 1)), 1e-8) / 127.0
        q = jnp.clip(jnp.round(f / s), -127, 127)
        deq.append((q * s).astype(f.dtype))
    for mode in ("band", "pp"):
        per_case = {}
        for name, boxes in cases.items():
            out = np.asarray(multilevel_roi_align_pallas(
                feats, boxes, strides, mode=mode, patch_quant=True))
            ref = np.asarray(multilevel_roi_align(deq, boxes, strides))
            per_case[name] = _scan(out, ref, 1e-4)
            all_ok &= per_case[name]["ok"]
        print(json.dumps({"step": f"int8_{mode}_vs_dequant_oracle",
                          "ok": all_ok, "cases": per_case}), flush=True)

    if not all_ok:
        print(json.dumps({"verdict": "CORRECTNESS FAILED — do not flip "
                                     "defaults"}), flush=True)
        sys.exit(1)

    # ---- step 4: full-predict throughput A/B ---------------------------
    import bench
    runs = [
        ("float32", "band", False),
        ("float32", "pp", False),
        ("bfloat16", "band", False),
        ("bfloat16", "pp", False),
        ("bfloat16", "pp", True),
        ("bfloat16", "band", True),
    ]
    checks = {}
    for dtype, mode, quant in runs:
        res = bench.bench_detector(16, 30, 5, dtype=dtype, roi_mode=mode,
                                   roi_patch_quant=quant)
        res["detail"]["roi_mode"] = mode
        key = f"{dtype}/{mode}" + ("/int8" if quant else "")
        checks[key] = res["detail"]["checksum"]
        print(json.dumps(res), flush=True)
    # band vs pp f32 must agree bit-for-bit through the whole program
    print(json.dumps({"step": "checksums", "checksums": checks,
                      "f32_band_pp_equal":
                          checks["float32/band"] == checks["float32/pp"]}),
          flush=True)


if __name__ == "__main__":
    main()
