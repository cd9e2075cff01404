"""Hardware validation for the fused Pallas RoIAlign kernel geometry.

The interpret-mode suite (tests/test_pallas_roi.py) cannot catch Mosaic
DMA-alignment misses — they are SILENT zeros on hardware (CLAUDE.md,
PROFILE_detector.md). This script is the "queued measurement" referenced
by PROFILE_detector.md's round-4 section: it must be run ON THE TPU once
per geometry variant:

    python scripts/validate_pallas_roi_hw.py                 # default 16/48
    STLPOSE_PALLAS_ROI_F32_TIGHT=1 \
        python scripts/validate_pallas_roi_hw.py             # tight f32 8/40

Step 1 — correctness: the kernel output must match the XLA formulation
(ops/roi_align.py::multilevel_roi_align, itself pinned to the
all-level+mask reference semantics) on the real 400px Faster R-CNN FPN
geometry with serving channel width (C=256), across the adversarial box
regimes the CPU suite uses (random / extreme-aspect / far-edge level-2 /
chunk-boundary). Any silent-zero DMA miss shows up as a large block
error here.

Step 2 — throughput: Faster R-CNN f32 predict at B=16 via
bench.bench_detector (chained honest timing), so the geometry's DMA
saving is priced on the same instrument as PROFILE_detector.md.

Prints one JSON line per step. Reference role: torchvision RoIAlign,
/root/reference/src/lib/model_setup.py:70-73.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from stlpose_tpu.ops.pallas_roi import (_dma_geometry,
                                            multilevel_roi_align_pallas)
    from stlpose_tpu.ops.roi_align import multilevel_roi_align

    align, short_pal = _dma_geometry(jnp.float32)
    print(json.dumps({"geometry": {"dtype": "float32", "ALIGN": align,
                                   "SHORT_PAL": short_pal},
                      "backend": jax.default_backend()}), flush=True)

    strides = (4, 8, 16, 32)
    img = 400
    rng = np.random.RandomState(0)
    # serving channel width so the kernel path (not the thin-C XLA
    # fallback) is exercised
    C = 256
    feats = [jnp.asarray(
        rng.randn((img + s - 1) // s, (img + s - 1) // s, C)
        .astype(np.float32) * 0.5) for s in strides]

    def rand_boxes(seed, P):
        r = np.random.RandomState(seed)
        x1 = r.uniform(0, img - 2, P)
        y1 = r.uniform(0, img - 2, P)
        w = r.uniform(1, img, P)
        h = r.uniform(1, img, P)
        return jnp.asarray(np.stack(
            [x1, y1, np.minimum(x1 + w, img), np.minimum(y1 + h, img)],
            -1), jnp.float32)

    cases = {
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

    worst = 0.0
    ok = True
    per_case = {}
    for name, boxes in cases.items():
        out = np.asarray(multilevel_roi_align_pallas(feats, boxes, strides))
        ref = np.asarray(multilevel_roi_align(feats, boxes, strides))
        diff = float(np.abs(out - ref).max())
        bitexact = bool((out == ref).all())
        # a silent-zero DMA miss zeroes whole interpolated blocks: also
        # flag any output row that is exactly zero where the ref is not
        zero_rows = int(((np.abs(out).sum(axis=(2, 3)) == 0) &
                         (np.abs(ref).sum(axis=(2, 3)) > 1e-3)).sum())
        per_case[name] = {"max_abs_diff": diff, "bit_exact": bitexact,
                          "silent_zero_rows": zero_rows}
        worst = max(worst, diff)
        if diff > 1e-4 or zero_rows:
            ok = False
    print(json.dumps({"step": "equivalence", "ok": ok,
                      "worst_max_abs_diff": worst, "cases": per_case}),
          flush=True)
    if not ok:
        sys.exit(1)

    import bench
    res = bench.bench_detector(16, 30, 5, dtype="float32")
    res["detail"]["roi_geometry"] = {"ALIGN": align, "SHORT_PAL": short_pal}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
