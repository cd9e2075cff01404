"""Profile the device-warp input pipeline vs the train step (VERDICT item 6).

SURVEY §2.2 designated the batched warp + Gaussian-target datagen as a
candidate Pallas surface. This script produces the number that settles the
question: what fraction of a training step's device time does the
device-warp finalize program (affine crop warp + joint transform +
normalize + Gaussian targets, data/pipeline.py::_device_warp_finalize)
actually cost at real batch sizes?

jax.profiler cannot see device activity through the axon RPC tunnel, so the
measurement uses the same chained-dependency protocol as bench.py: each
iteration's input depends on a scalar from the previous iteration's output,
one final fetch drains the chain, per-call RPC overhead amortizes over
--iters.

Measured programs (inputs pre-placed on device; H2D transfer is a separate
column, measured once, since Pallas cannot fix transfer cost):
  warp      _device_warp_finalize equivalent at (batch, canvas, canvas)
  targets   normalize + generate_targets only (the non-warp pipeline tail)
  train     full HRNet-W32 train step (fwd+bwd+Adam+PCK) at the same batch

Writes PROFILE_device_warp.json at the repo root and prints one JSON line.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--canvas", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from stlpose_tpu.config import default_experiment_args
    from stlpose_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD
    from stlpose_tpu.models import create_hrnet
    from stlpose_tpu.ops.affine import get_affine_matrix, apply_affine
    from stlpose_tpu.ops.heatmap import generate_targets
    from stlpose_tpu.ops.warp import affine_warp
    from stlpose_tpu.parallel import get_mesh, shard_batch, make_train_step
    from stlpose_tpu.train import create_train_state

    B, S = args.batch, args.canvas
    IMAGE_SIZE = (192, 256)
    HEATMAP_SIZE = (48, 64)

    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    canvases = jax.device_put(
        rng.rand(B, S, S, 3).astype(np.float32) * 255.0, dev)
    centers = jax.device_put(
        rng.uniform(100, S - 100, (B, 2)).astype(np.float32), dev)
    scales = jax.device_put(
        rng.uniform(1.0, 2.0, (B, 2)).astype(np.float32), dev)
    rots = jax.device_put(
        rng.uniform(-40, 40, (B,)).astype(np.float32), dev)
    joints = jax.device_put(
        rng.uniform(0, S, (B, 17, 2)).astype(np.float32), dev)
    vis = jax.device_put(np.ones((B, 17), np.float32), dev)
    crops_in = jax.device_put(
        rng.rand(B, 256, 192, 3).astype(np.float32) * 255.0, dev)

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    @jax.jit
    def warp_finalize(canvases, centers, scales, rots, joints, vis, chain):
        canvases = canvases + chain * 0.0
        crops = affine_warp(canvases, centers, scales, rots, IMAGE_SIZE)
        x = (crops / 255.0 - mean) / std
        mats = get_affine_matrix(centers, scales, rots, IMAGE_SIZE)
        jc = apply_affine(joints, mats)
        jc = jnp.where(vis[..., None] > 0, jc, joints)
        target, weight = generate_targets(jc, vis,
                                          heatmap_size=HEATMAP_SIZE,
                                          image_size=IMAGE_SIZE)
        return jnp.sum(x) + jnp.sum(target) + jnp.sum(weight) + jnp.sum(jc)

    @jax.jit
    def targets_only(crops, joints, vis, chain):
        crops = crops + chain * 0.0
        x = (crops / 255.0 - mean) / std
        target, weight = generate_targets(joints[..., :2] % 192.0, vis,
                                          heatmap_size=HEATMAP_SIZE,
                                          image_size=IMAGE_SIZE)
        return jnp.sum(x) + jnp.sum(target) + jnp.sum(weight)

    from stlpose_tpu.utils.timing import chained_time

    def chained(fn, argfn):
        return chained_time(fn, argfn, args.iters, args.warmup)[0] * 1000.0

    ms_warp = chained(
        warp_finalize,
        lambda c: (canvases, centers, scales, rots, joints, vis, c))
    ms_targets = chained(
        targets_only, lambda c: (crops_in, joints, vis, c))

    # the Pallas two-pass kernel (ops/pallas_warp.py) in the same fused
    # finalize program
    from stlpose_tpu.ops.pallas_warp import affine_warp_pallas

    @jax.jit
    def warp_finalize_pallas(canvases, centers, scales, rots, joints, vis,
                             chain):
        canvases = canvases + chain * 0.0
        crops = affine_warp_pallas(canvases, centers, scales, rots,
                                   IMAGE_SIZE)
        x = (crops / 255.0 - mean) / std
        mats = get_affine_matrix(centers, scales, rots, IMAGE_SIZE)
        jc = apply_affine(joints, mats)
        jc = jnp.where(vis[..., None] > 0, jc, joints)
        target, weight = generate_targets(jc, vis,
                                          heatmap_size=HEATMAP_SIZE,
                                          image_size=IMAGE_SIZE)
        return jnp.sum(x) + jnp.sum(target) + jnp.sum(weight) + jnp.sum(jc)

    ms_warp_pallas = chained(
        warp_finalize_pallas,
        lambda c: (canvases, centers, scales, rots, joints, vis, c))

    # full train step at the same batch
    model = create_hrnet("w32_256x192")
    exp = default_experiment_args()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state, tx = create_train_state(model, exp, jax.random.PRNGKey(0),
                                       (1, 256, 192, 3))
    state = jax.device_put(state, dev)
    mesh = get_mesh(1)
    step = make_train_step(model, tx, mesh)
    base = {
        "target": jnp.asarray(rng.rand(B, 17, 64, 48).astype(np.float32)),
        "target_weight": jnp.ones((B, 17), jnp.float32),
        "perceptual_loss": jnp.zeros((B,), jnp.float32)}
    img = jnp.asarray(rng.randn(B, 256, 192, 3).astype(np.float32))

    @jax.jit
    def chain_img(img, chain):
        return img + chain * 0.0

    def one(state, chain):
        b = dict(base)
        b["image"] = chain_img(img, chain)
        state, metrics = step(state, shard_batch(mesh, b))
        return state, metrics["loss"]

    chain = jnp.zeros((), jnp.float32)
    for _ in range(args.warmup):
        state, chain = one(state, chain)
    float(chain)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, chain = one(state, chain)
    float(chain)
    ms_train = (time.perf_counter() - t0) / args.iters * 1000.0

    # one-shot H2D transfer cost of the canvases (f32, the current wire
    # format) for context — not fixable by a kernel, fixable by uint8 wire
    host_canvases = rng.randint(0, 256, (B, S, S, 3)).astype(np.float32)
    t0 = time.perf_counter()
    x = jax.device_put(host_canvases, dev)
    _ = float(jnp.sum(x[0, 0, 0]))
    ms_h2d_f32 = (time.perf_counter() - t0) * 1000.0
    host_u8 = host_canvases.astype(np.uint8)
    t0 = time.perf_counter()
    x = jax.device_put(host_u8, dev)
    _ = float(jnp.sum(x[0, 0, 0].astype(jnp.float32)))
    ms_h2d_u8 = (time.perf_counter() - t0) * 1000.0

    share_xla = ms_warp / (ms_warp + ms_train)
    share_pallas = ms_warp_pallas / (ms_warp_pallas + ms_train)
    out = {
        "metric": "device_warp_share_of_train_step",
        "value": round(share_pallas, 4),
        "unit": "fraction",
        "detail": {
            "batch": B, "canvas": S, "iters": args.iters,
            "ms_warp_finalize_xla": round(ms_warp, 2),
            "ms_warp_finalize_pallas": round(ms_warp_pallas, 2),
            "share_xla": round(share_xla, 4),
            "ms_targets_only": round(ms_targets, 2),
            "ms_train_step": round(ms_train, 2),
            "ms_h2d_canvases_f32": round(ms_h2d_f32, 1),
            "ms_h2d_canvases_u8": round(ms_h2d_u8, 1),
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_device_warp.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
