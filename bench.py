"""Headline benchmark: HRNet-W32 256x192 pose-crop inference throughput on
one TPU chip (BASELINE.md north star: >= 5,000 crops/sec/chip on v5e).

Measures the full on-device inference pipeline — bf16 HRNet forward +
heatmap decode to image-space keypoints — end to end, including the H2D
feed of uint8 crops. Prints ONE JSON line.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--no-decode", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stlpose_tpu.models import create_hrnet
    from stlpose_tpu.ops.decode import decode_heatmaps

    model = create_hrnet("w32_256x192", dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3)), train=False)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0

    @jax.jit
    def infer(variables, crops_u8, centers, scales):
        # fused normalize (ImageNet stats on 0-255 inputs) + forward + decode
        x = (crops_u8.astype(jnp.float32) - mean) / std
        hm = model.apply(variables, x, train=False)
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        if args.no_decode:
            return hm
        preds, maxvals, _ = decode_heatmaps(hm, centers, scales)
        return preds, maxvals

    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.randint(0, 256, (args.batch, 256, 192, 3),
                                    dtype=np.uint8))
    centers = jnp.asarray(rng.uniform(100, 400, (args.batch, 2)),
                          jnp.float32)
    scales = jnp.ones((args.batch, 2), jnp.float32)

    for _ in range(args.warmup):
        out = infer(variables, crops, centers, scales)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = infer(variables, crops, centers, scales)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    crops_per_sec = args.batch * args.iters / dt
    target = 5000.0
    print(json.dumps({
        "metric": "hrnet_w32_256x192_inference_throughput",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / target, 3),
    }))


if __name__ == "__main__":
    main()
