"""Hardware validation for the blocked pp RoIAlign kernel (round 5b).

The round-5 pp kernel runs ONE box per grid step: 4096 sequential grid
steps (each with ns=14 DMA waits) per B=16 predict, leaving ~2 us/box of
grid-step/semaphore overhead above the DMA-bandwidth + MXU bound.
The blocked variant processes KB boxes per step (KB*ns tap DMAs in
flight per double-buffer stage). Per-box arithmetic is UNCHANGED — the
same lerp + one (ns, SHORT_PAL) @ (SHORT_PAL, ns*C) dot per box — so
blocked outputs must be BIT-IDENTICAL to the KB=1 kernel, and f32 must
stay bit-exact vs the XLA formulation.

One process (one-JAX-process rule; chained honest timing from bench.py):

  step 1  f32 default (KB=1) AND f32 blocked (explicit pp2, the max f32
          block after the VMEM auto-cap) vs XLA: bit-exactness +
          silent-zero scan on the real 400px / C=256 geometry,
          4 adversarial box regimes
  step 2  bf16 pp4 vs pp1 and int8-patch pp4 vs pp1: bit-identity
  step 3  full Faster R-CNN predict throughput A/B at B=16 over
          KB in {1,2,4} x {plain bf16, int8 patches} + f32 pp1/pp2,
          with cross-KB checksum equality through the whole program

Prints one JSON line per step. Reference role: torchvision RoIAlign,
/root/reference/src/lib/model_setup.py:70-73.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validate_pallas_roi_pp_hw import _cases, _scan  # noqa: E402


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stlpose_tpu.ops.pallas_roi import multilevel_roi_align_pallas
    from stlpose_tpu.ops.roi_align import multilevel_roi_align

    print(json.dumps({"backend": jax.default_backend(),
                      "validating": "pp blocked kernel"}), flush=True)

    strides = (4, 8, 16, 32)
    img, C = 400, 256
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(
        rng.randn((img + s - 1) // s, (img + s - 1) // s, C)
        .astype(np.float32) * 0.5) for s in strides]
    cases = _cases(img)
    all_ok = True

    # ---- step 1: f32 default (KB=1) and f32 BLOCKED (pp2) vs XLA -------
    # NB: bare mode="pp" resolves KB from STLPOSE_PALLAS_ROI_BLOCK
    # (default 1), so the blocked leg must pin the block EXPLICITLY —
    # the original round-5b run of this script validated only KB=1 here
    # (pp2 is the largest f32 block after the VMEM auto-cap; KB=4's
    # ~11.8 MB f32 scratch caps to 2)
    for leg, mode in (("f32_default_kb1_vs_xla", "pp"),
                      ("f32_blocked_pp2_vs_xla", "pp2")):
        per_case = {}
        leg_ok = True
        for name, boxes in cases.items():
            out = np.asarray(multilevel_roi_align_pallas(
                feats, boxes, strides, mode=mode))
            ref = np.asarray(multilevel_roi_align(feats, boxes, strides))
            per_case[name] = _scan(out, ref, 1e-4)
            leg_ok &= per_case[name]["ok"]
        all_ok &= leg_ok
        print(json.dumps({"step": leg, "ok": leg_ok,
                          "cases": per_case}), flush=True)

    # ---- step 2: blocked vs unblocked bit-identity ----------------------
    feats16 = [f.astype(jnp.bfloat16) for f in feats]
    for quant in (False, True):
        per_case = {}
        step_ok = True
        for name, boxes in cases.items():
            a = np.asarray(multilevel_roi_align_pallas(
                feats16, boxes, strides, mode="pp4",
                patch_quant=quant).astype(jnp.float32))
            b = np.asarray(multilevel_roi_align_pallas(
                feats16, boxes, strides, mode="pp1",
                patch_quant=quant).astype(jnp.float32))
            ident = bool((a == b).all())
            per_case[name] = {"bit_identical": ident,
                              "max_abs_diff": float(np.abs(a - b).max())}
            step_ok &= ident
        all_ok &= step_ok
        print(json.dumps({
            "step": ("int8_pp4_vs_pp1" if quant else "bf16_pp4_vs_pp1"),
            "ok": step_ok, "cases": per_case}), flush=True)

    if not all_ok:
        print(json.dumps({"verdict": "CORRECTNESS FAILED — do not flip "
                                     "defaults"}), flush=True)
        sys.exit(1)

    # ---- step 3: full-predict throughput A/B ---------------------------
    import bench
    runs = [
        ("bfloat16", "pp1", False),
        ("bfloat16", "pp2", False),
        ("bfloat16", "pp4", False),
        ("bfloat16", "pp1", True),
        ("bfloat16", "pp4", True),
        ("float32", "pp1", False),       # the shipping default (KB=1)
        ("float32", "pp2", False),       # max f32 block (auto-cap at 2)
    ]
    checks = {}
    for dtype, mode, quant in runs:
        res = bench.bench_detector(16, 30, 5, dtype=dtype, roi_mode=mode,
                                   roi_patch_quant=quant)
        res["detail"]["roi_mode"] = mode
        key = f"{dtype}/{mode}" + ("/int8" if quant else "")
        checks[key] = res["detail"]["checksum"]
        print(json.dumps(res), flush=True)
    print(json.dumps({
        "step": "checksums", "checksums": checks,
        "bf16_blocks_equal": len({checks["bfloat16/pp1"],
                                  checks["bfloat16/pp2"],
                                  checks["bfloat16/pp4"]}) == 1,
        "int8_blocks_equal": checks["bfloat16/pp1/int8"]
        == checks["bfloat16/pp4/int8"],
        "f32_blocks_equal": checks["float32/pp1"]
        == checks["float32/pp2"]}), flush=True)


if __name__ == "__main__":
    main()
