"""HRNet-W32 single-chip roofline profile (VERDICT r1, weak item 4).

Produces the numbers behind PROFILE_hrnet_roofline.md: why HRNet-W32
inference sits where it does on a v5e chip, and how much headroom XLA is
actually leaving.

Measurements (chained-dependency protocol, one drain per series):
  1. conv microbench — one 3x3 C->C conv at each HRNet branch geometry
     (identical FLOPs by design: HW * C^2 is constant across branches), so
     the per-width MXU lane efficiency (C=32 pads 128 lanes 4x, C=64 2x,
     C>=128 full) is isolated from everything else.
  2. forward-only vs forward+decode at the bench batch — the decode tax.
  3. the headline bench program (forward+normalize+decode).

Writes PROFILE_hrnet_roofline.json.
"""

import argparse
import json
import os
import time

import numpy as np

PEAK_BF16_TFLOPS = 197.0     # v5e MXU peak (bf16 multiply-accumulate)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import flax.linen as nn
    import jax.numpy as jnp

    B = args.batch
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)

    from stlpose_tpu.utils.timing import chained_time

    def chained(fn, *const_args):
        per_iter, _ = chained_time(fn, lambda c: const_args + (c,),
                                   args.iters, args.warmup)
        return per_iter * 1000.0

    # --- 1. per-branch-geometry conv microbench (equal FLOPs) ----------
    # REPS dependent convs per jit call so per-dispatch overhead (which a
    # full ~300-op model amortizes away) doesn't drown the conv time
    REPS = 16
    geoms = [(64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256)]
    widths = {}
    for (H, W, C) in geoms:
        conv = nn.Conv(C, (3, 3), padding="SAME", use_bias=False,
                       dtype=jnp.bfloat16)
        x = jax.device_put(
            rng.randn(B, H, W, C).astype(np.float32), dev)
        with jax.default_device(jax.devices("cpu")[0]):
            v = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C)))
        v = jax.device_put(v, dev)

        @jax.jit
        def f(v, x, chain, conv=conv):
            y = (x + chain * 0.0).astype(jnp.bfloat16)
            for _ in range(REPS):
                y = conv.apply(v, y)
            return jnp.sum(y.astype(jnp.float32))

        ms = chained(f, v, x) / REPS
        flops = 2.0 * B * H * W * 9 * C * C
        tflops = flops / (ms / 1000.0) / 1e12
        widths[C] = {"geom": f"{H}x{W}x{C}", "ms": round(ms, 3),
                     "tflops": round(tflops, 1),
                     "mxu_efficiency": round(tflops / PEAK_BF16_TFLOPS, 3)}

    # --- 2. forward-only vs forward+decode -----------------------------
    from stlpose_tpu.models import create_hrnet, fold_batchnorms
    from stlpose_tpu.ops.decode import decode_heatmaps_nhwc

    base = create_hrnet("w32_256x192", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = base.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 256, 192, 3)), train=False)
    model = create_hrnet("w32_256x192", dtype=jnp.bfloat16, folded=True)
    variables = jax.device_put(fold_batchnorms(variables), dev)
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0
    crops = jax.device_put(rng.randint(0, 256, (B, 256, 192, 3))
                           .astype(np.uint8), dev)
    centers = jax.device_put(rng.uniform(100, 400, (B, 2))
                             .astype(np.float32), dev)
    scales = jax.device_put(np.ones((B, 2), np.float32), dev)

    @jax.jit
    def fwd(variables, crops, chain):
        x = (crops.astype(jnp.float32) - mean) / std + chain * 0.0
        hm = model.apply(variables, x, train=False)
        return jnp.sum(hm)

    @jax.jit
    def fwd_decode(variables, crops, centers, scales, chain):
        x = (crops.astype(jnp.float32) - mean) / std + chain * 0.0
        hm = model.apply(variables, x, train=False)
        preds, maxvals, _ = decode_heatmaps_nhwc(hm, centers, scales)
        return jnp.sum(maxvals) + jnp.sum(preds)

    ms_fwd = chained(fwd, variables, crops)
    ms_full = chained(fwd_decode, variables, crops, centers, scales)

    # --- 3. roofline arithmetic ----------------------------------------
    # per-crop conv FLOPs by branch width (from the config graph; W32 at
    # 256x192 is ~14.2 GFLOP/crop counting mul+add)
    GFLOP_PER_CROP = 14.2
    ideal_us = GFLOP_PER_CROP / PEAK_BF16_TFLOPS * 1e6 / 1000.0
    # FLOP share by width (stem+layer1 counted at full efficiency):
    # branches contribute ~evenly per conv across widths by construction
    eff32 = widths[32]["mxu_efficiency"]
    eff64 = widths[64]["mxu_efficiency"]
    eff128 = widths[128]["mxu_efficiency"]
    eff256 = widths[256]["mxu_efficiency"]
    # measured efficiency-weighted multiplier over the ideal MXU time,
    # using the ~(1/4 each) branch FLOP split of the stage graph
    mult = 0.25 / eff32 + 0.25 / eff64 + 0.25 / eff128 + 0.25 / eff256
    out = {
        "metric": "hrnet_w32_roofline",
        "detail": {
            "batch": B,
            "conv_microbench_by_width": widths,
            "ms_forward_only": round(ms_fwd, 2),
            "ms_forward_plus_decode": round(ms_full, 2),
            "decode_tax_ms": round(ms_full - ms_fwd, 2),
            "us_per_crop_measured": round(ms_full / B * 1000.0, 1),
            "us_per_crop_ideal_mxu": round(ideal_us, 1),
            "thin_channel_multiplier_measured": round(mult, 2),
            "us_per_crop_adjusted_roofline": round(ideal_us * mult, 1),
            "xla_fraction_of_adjusted_roofline": round(
                (ideal_us * mult) / (ms_fwd / B * 1000.0), 3),
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_hrnet_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
