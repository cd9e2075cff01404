"""Thin-channel MFU experiment (VERDICT r2, weak item 5 / next-round #7).

PROFILE_hrnet_roofline.md ends at "XLA's convs are the limiter" for the
64x48x32 high-res branch geometry (29% of bf16 peak). This script tests
the structural counter-moves on that exact geometry, batch 128 (the
headline knee):

  baseline   the XLA conv everyone measures (16-deep chain)
  im2col     9-shift concat -> 1x1 conv: contraction K=288 instead of a
             3x3 window walk (isolates whether XLA's conv lowering or the
             matmul shape is the limit; N=32 stays thin)
  padN       conv 32->128 with only 32 live outputs: pays 4x FLOPs for
             full output lanes — confirms/denies the lane-padding theory
  groupfold  fold 4 batch images into channels, feature_group_count=4
             with replicated weights: same math, 128-channel tensors

(space-to-depth is analyzed, not timed: its dense equivalent costs the
same 4x FLOPs as padN plus pack/unpack — see the in-code note.)

Every variant is numerically checked against the baseline before timing.
Writes PROFILE_thin_conv_experiment.json.
"""

import json
import os

import numpy as np

PEAK_BF16_TFLOPS = 197.0
H, W, C = 64, 48, 32
REPS = 16


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from jax import lax
    from stlpose_tpu.utils.timing import chained_time

    B = args.batch
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    x_np = rng.randn(B, H, W, C).astype(np.float32)
    w_np = (rng.randn(3, 3, C, C) * 0.05).astype(np.float32)
    x = jax.device_put(x_np, dev)
    wt = jax.device_put(w_np, dev)
    dn = lax.conv_dimension_numbers(x_np.shape, w_np.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(y, w):
        return lax.conv_general_dilated(y, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    def chain_time(fn, *const_args):
        per_iter, _ = chained_time(fn, lambda c: const_args + (c,),
                                   args.iters, args.warmup)
        return per_iter * 1000.0 / REPS

    flops = 2.0 * B * H * W * 9 * C * C
    results = {}

    def record(name, ms, note=""):
        tf = flops / (ms / 1000.0) / 1e12
        results[name] = {"ms_per_conv": round(ms, 3),
                         "tflops_effective": round(tf, 1),
                         "pct_of_peak": round(100 * tf / PEAK_BF16_TFLOPS,
                                              1), "note": note}
        print(f"{name:10s} {ms:7.3f} ms  {tf:6.1f} TF/s "
              f"({100 * tf / PEAK_BF16_TFLOPS:4.1f}% peak)  {note}")

    # ---------------- baseline ----------------
    @jax.jit
    def f_base(w, y, c):
        y = (y + c * 0.0).astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        for _ in range(REPS):
            y = conv(y, wb)
        return jnp.sum(y.astype(jnp.float32))

    record("baseline", chain_time(f_base, wt, x))

    def ref_once(y):
        return conv(y.astype(jnp.bfloat16), wt.astype(jnp.bfloat16))

    ref = np.asarray(jax.jit(ref_once)(x), np.float32)

    def check(fn, name):
        got = np.asarray(jax.jit(fn)(x), np.float32)
        err = np.abs(got - ref).max() / max(1e-6, np.abs(ref).max())
        assert err < 0.05, f"{name} mismatch: rel sup err {err}"

    # ---------------- im2col ----------------
    def im2col_once(y):
        yb = y.astype(jnp.bfloat16)
        yp = jnp.pad(yb, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [yp[:, dy:dy + H, dx:dx + W, :]
                for dy in range(3) for dx in range(3)]
        y9 = jnp.concatenate(cols, axis=-1)           # (B, H, W, 9C)
        wf = wt.astype(jnp.bfloat16).reshape(9 * C, C)
        return jnp.einsum("bhwk,kc->bhwc", y9, wf)

    check(im2col_once, "im2col")

    @jax.jit
    def f_im2col(w, y, c):
        y = (y + c * 0.0)
        for _ in range(REPS):
            y = im2col_once(y).astype(jnp.float32)
        return jnp.sum(y)

    record("im2col", chain_time(f_im2col, wt, x),
           "K=288 matmul, N=32 still thin")

    # ---------------- padN: 32 -> 128 outputs, 32 live ----------------
    w_pad = jnp.zeros((3, 3, C, 4 * C), jnp.float32).at[:, :, :, :C].set(wt)

    @jax.jit
    def f_padN(w, y, c):
        y = (y + c * 0.0).astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        for _ in range(REPS):
            y = conv(y, wb)[..., :C]
        return jnp.sum(y.astype(jnp.float32))

    record("padN", chain_time(f_padN, jax.device_put(w_pad, dev), x),
           "4x FLOPs for full output lanes")

    # ---------------- groupfold: 4 batch -> channels ----------------
    G = 4
    assert B % G == 0
    w_grp = jnp.tile(wt, (1, 1, 1, G))     # (3,3,C, G*C): group g = copy

    def grp_once(y):
        yg = y.reshape(B // G, G, H, W, C).transpose(0, 2, 3, 1, 4)
        yg = yg.reshape(B // G, H, W, G * C).astype(jnp.bfloat16)
        out = lax.conv_general_dilated(
            yg, w_grp.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, feature_group_count=G)
        out = out.reshape(B // G, H, W, G, C).transpose(0, 3, 1, 2, 4)
        return out.reshape(B, H, W, C)

    check(grp_once, "groupfold")

    @jax.jit
    def f_grp(w, y, c):
        yg = (y + c * 0.0).reshape(B // G, G, H, W, C)
        yg = yg.transpose(0, 2, 3, 1, 4).reshape(B // G, H, W, G * C)
        yg = yg.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        for _ in range(REPS):
            yg = lax.conv_general_dilated(
                yg, wb, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=G)
        return jnp.sum(yg.astype(jnp.float32))

    record("groupfold", chain_time(f_grp, jax.device_put(w_grp, dev), x),
           "128-channel tensors, grouped weights")

    # ---------------- int8 probe (the named "honest next lever") --------
    # not numerics-matched (different domain); measures whether the int8
    # MXU (2x bf16 peak on v5e) actually engages for this conv shape
    x8 = jax.device_put((x_np * 10).astype(np.int8), dev)
    w8 = jax.device_put((w_np * 100).astype(np.int8), dev)

    @jax.jit
    def f_int8(w, y, c):
        y = y + c.astype(jnp.int8) * 0
        acc = None
        for _ in range(REPS):
            o = lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            # re-quantize so the chain stays int8 (serving would rescale)
            y = (o >> 7).astype(jnp.int8)
        return jnp.sum(y.astype(jnp.int32))

    try:
        ms = chain_time(f_int8, w8, x8)
        tf = flops / (ms / 1000.0) / 1e12
        results["int8"] = {"ms_per_conv": round(ms, 3),
                           "tops_effective": round(tf, 1),
                           "pct_of_int8_peak": round(
                               100 * tf / (2 * PEAK_BF16_TFLOPS), 1),
                           "note": "int8 MXU probe (peak 2x bf16)"}
        print(f"{'int8':10s} {ms:7.3f} ms  {tf:6.1f} TOP/s "
              f"({100 * tf / (2 * PEAK_BF16_TFLOPS):4.1f}% int8 peak)")
    except Exception as e:           # int8 conv may not lower on all paths
        results["int8"] = {"error": str(e)[:200]}
        print("int8 probe failed:", str(e)[:200])

    # NOTE on space-to-depth: the dense conv equivalent to a 3x3 s1 conv
    # on 2x2-packed data needs 3x3 support in PACKED space (sub-offset r
    # plus tap d spans floor((r+d)/2) in {-1,0,1}), i.e. a (3,3,4C,4C)
    # kernel = 4x the FLOPs — strictly dominated by the padN probe above
    # (same 4x-FLOPs-for-full-lanes trade, none of the pack/unpack tax),
    # so it is not measured separately.

    # ---------------- batch scaling of the baseline ----------------
    for B2 in (256, 512):
        x2 = jax.device_put(rng.randn(B2, H, W, C).astype(np.float32), dev)

        @jax.jit
        def f_b2(w, y, c):
            y = (y + c * 0.0).astype(jnp.bfloat16)
            wb = w.astype(jnp.bfloat16)
            for _ in range(REPS):
                y = conv(y, wb)
            return jnp.sum(y.astype(jnp.float32))

        ms = chain_time(f_b2, wt, x2)
        tf = (flops * B2 / B) / (ms / 1000.0) / 1e12
        results[f"baseline_B{B2}"] = {
            "ms_per_conv": round(ms, 3), "tflops_effective": round(tf, 1),
            "pct_of_peak": round(100 * tf / PEAK_BF16_TFLOPS, 1),
            "note": "M-dim scaling probe"}
        print(f"baseline_B{B2} {ms:7.3f} ms  {tf:6.1f} TF/s "
              f"({100 * tf / PEAK_BF16_TFLOPS:4.1f}% peak)")

    out = {"metric": "thin_conv_experiment",
           "geometry": f"{H}x{W}x{C}", "batch": B, "reps": REPS,
           "variants": results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_thin_conv_experiment.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
