"""Headline benchmark: HRNet-W32 256x192 pose-crop inference throughput on
one TPU chip (BASELINE.md north star: >= 5,000 crops/sec/chip on v5e).

Measures the full on-device inference pipeline — normalize (ImageNet stats
on uint8 crops) + bf16 HRNet forward + heatmap decode to image-space
keypoints. Timing protocol: the axon TPU tunnel used in this environment
does NOT synchronize on ``block_until_ready`` (it returns at enqueue), so
every timed iteration fetches a scalar derived from the outputs (forcing
completion) and the measured per-call RPC latency is subtracted to report
device-bound throughput. Prints ONE JSON line.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    args = ap.parse_args()

    import jax
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from stlpose_tpu.models import create_hrnet
    from stlpose_tpu.ops.decode import decode_heatmaps_nhwc

    model = create_hrnet("w32_256x192", dtype=jnp.bfloat16)
    # init on the CPU backend: avoids a ~2 min remote compile of the init
    # program in a fresh process (per-session compile cache — CLAUDE.md)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 256, 192, 3)), train=False)
        variables = jax.device_put(variables, jax.devices()[0])
    except Exception:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 192, 3)), train=False)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0

    @jax.jit
    def infer(variables, crops_u8, centers, scales, chain):
        # `chain` (a scalar from the previous step) feeds the input so
        # successive steps form a true device-side dependency chain — the
        # only reliable way to time K executions over an RPC tunnel whose
        # block_until_ready does not wait for completion.
        x = (crops_u8.astype(jnp.float32) - mean) / std + chain * 0.0
        hm = model.apply(variables, x, train=False)
        # decode in the model's NHWC layout (no transpose copy)
        preds, maxvals, _ = decode_heatmaps_nhwc(hm, centers, scales)
        return preds, maxvals, jnp.sum(maxvals) + jnp.sum(preds)

    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.randint(0, 256, (args.batch, 256, 192, 3),
                                    dtype=np.uint8))
    centers = jnp.asarray(rng.uniform(100, 400, (args.batch, 2)),
                          jnp.float32)
    scales = jnp.ones((args.batch, 2), jnp.float32)

    chain = jnp.zeros((), jnp.float32)
    for _ in range(args.warmup):
        _, _, chain = infer(variables, crops, centers, scales, chain)
    end_to_end0 = time.perf_counter()
    float(chain)                        # drain the warmup chain
    latency_est = time.perf_counter() - end_to_end0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        _, _, chain = infer(variables, crops, centers, scales, chain)
    chk = float(chain)                  # one fetch drains the whole chain
    total = time.perf_counter() - t0
    per_iter = total / args.iters

    crops_per_sec = args.batch / per_iter
    target = 5000.0
    print(json.dumps({
        "metric": "hrnet_w32_256x192_inference_throughput",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / target, 3),
        "detail": {"batch": args.batch,
                   "ms_per_iter": round(per_iter * 1000, 2),
                   "iters": args.iters, "checksum": round(chk, 2)},
    }))


if __name__ == "__main__":
    main()
