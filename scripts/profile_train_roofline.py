"""HRNet-W32 train-step roofline profile (VERDICT r4, weak item 2).

Inference got the roofline treatment in PROFILE_hrnet_roofline.md (45% of
bf16 peak, evidence-closed as shape-bound); the train step was one number
(1,400 samples/s bf16 at B=128). This script stage-breaks that number the
same way, in ONE TPU process (CLAUDE.md one-JAX-process rule), chained
protocol throughout:

  1. fwd_eval   — eval-mode forward + masked MSE (no BN stat update).
  2. fwd_train  — train-mode forward (mutable batch_stats) + loss.
                  delta vs 1 = the f32 BN batch-stat tax in forward.
  3. grad       — jax.value_and_grad of (2): forward + full backward.
                  delta vs 2 = the backward pass.
  4. opt        — (3) + Adam update + param apply + BN adoption, donated
                  state. delta vs 3 = optimizer + state plumbing.
  5. full       — the shipped make_train_step (adds the fused PCK metric).
                  delta vs 4 = the per-step PCK tax
                  (reference computes PCK every batch: 02_train.py:219-223).
  6. full_remat — (5) with the forward rematerialized (jax.checkpoint):
                  the memory-for-FLOPs lever, measured not assumed.

Roofline arithmetic: fwd is 14.2 GFLOP/crop (PROFILE_hrnet_roofline.md);
conv backward is ~2x fwd (grad-input + grad-weight each cost one fwd), so
the step's compute is ~42.6 GFLOP/crop. The inference study pinned this
architecture's shape-level MXU ceiling at ~45% of the 197 TF bf16 peak, so
the *shape-adjusted* step floor is 42.6e9 / (0.45 * 197e12) per crop —
the honest target, not the raw-peak one.

Writes PROFILE_train_roofline.json; prose conclusions in
PROFILE_train_roofline.md.
"""

import argparse
import json
import os

import numpy as np

PEAK_BF16_TFLOPS = 197.0
GFLOP_FWD_PER_CROP = 14.2          # PROFILE_hrnet_roofline.md
SHAPE_CEILING = 0.45               # measured MXU fraction, same doc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--model", default="w32_256x192",
                    help="'tiny' for a CPU smoke run")
    ap.add_argument("--skip-f32", action="store_true",
                    help="skip the f32 full-step reference point")
    args = ap.parse_args()

    import jax
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from stlpose_tpu.config import default_experiment_args
    from stlpose_tpu.models import create_hrnet
    from stlpose_tpu.parallel import get_mesh, make_train_step, shard_batch
    from stlpose_tpu.train import create_train_state
    from stlpose_tpu.train.loss import person_mse_loss
    from stlpose_tpu.utils.timing import chained_time

    B = args.batch
    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    rng = np.random.RandomState(0)
    mesh = get_mesh(1)

    model = create_hrnet(args.model, dtype=jnp.dtype(args.dtype))
    exp = default_experiment_args()
    with jax.default_device(cpu):
        host_state, tx = create_train_state(
            model, exp, jax.random.PRNGKey(0), (1, 256, 192, 3))

    img = jax.device_put(
        rng.randn(B, 256, 192, 3).astype(np.float32), dev)
    target = jax.device_put(
        rng.rand(B, 17, 64, 48).astype(np.float32), dev)
    tw = jax.device_put(np.ones((B, 17), np.float32), dev)

    # real numpy copy: donating variants delete their device buffers, and on
    # the CPU backend device_put(host_jax_array) aliases rather than copies
    host_np = jax.tree_util.tree_map(np.array, host_state)

    def fresh_state():
        return jax.device_put(host_np, dev)

    def chained(fn, args_fn):
        per_iter, chk = chained_time(fn, args_fn, args.iters, args.warmup)
        return per_iter * 1000.0, chk

    results = {}

    def _njhw(hm):
        return jnp.transpose(hm, (0, 3, 1, 2))

    # --- 1. eval-mode forward + loss -----------------------------------
    @jax.jit
    def fwd_eval(params, stats, img, target, tw, chain):
        x = img + chain * 0.0
        hm = model.apply({"params": params, "batch_stats": stats},
                         x, train=False)
        return person_mse_loss(_njhw(hm), target, tw)

    st = fresh_state()
    ms, _ = chained(fwd_eval,
                    lambda c: (st.params, st.batch_stats, img, target, tw, c))
    results["fwd_eval"] = ms

    # --- 2. train-mode forward + loss (mutable BN) ---------------------
    def loss_train(params, stats, img, target, tw):
        out, updates = model.apply(
            {"params": params, "batch_stats": stats}, img,
            train=True, mutable=["batch_stats"])
        loss = person_mse_loss(_njhw(out), target, tw)
        return loss, updates["batch_stats"]

    @jax.jit
    def fwd_train(params, stats, img, target, tw, chain):
        loss, new_stats = loss_train(params, stats, img + chain * 0.0,
                                     target, tw)
        # keep the stat update live with a cheap per-leaf touch
        touch = sum(l.ravel()[0].astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(new_stats))
        return loss + 0.0 * touch

    ms, _ = chained(fwd_train,
                    lambda c: (st.params, st.batch_stats, img, target, tw, c))
    results["fwd_train"] = ms

    # --- 3. + backward ---------------------------------------------------
    @jax.jit
    def grad_step(params, stats, img, target, tw, chain):
        (loss, _), grads = jax.value_and_grad(loss_train, has_aux=True)(
            params, stats, img + chain * 0.0, target, tw)
        touch = sum(jnp.sum(l).astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(grads))
        return loss + 0.0 * touch

    ms, _ = chained(grad_step,
                    lambda c: (st.params, st.batch_stats, img, target, tw, c))
    results["grad"] = ms

    # --- 4. + optimizer (donated state, no PCK) -------------------------
    from stlpose_tpu.train.state import PoseTrainState

    def opt_body(state, img, target, tw):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_train, has_aux=True)(
            state.params, state.batch_stats, img, target, tw)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        return PoseTrainState(params=params, batch_stats=new_stats,
                              opt_state=opt_state,
                              step=state.step + 1), loss

    opt_jit = jax.jit(opt_body, donate_argnums=(0,))

    def timed_donating(step_fn, make_args):
        state = fresh_state()
        holder = {"s": state}

        def one(chain):
            s, loss = step_fn(holder["s"], *make_args(chain))
            holder["s"] = s
            return (loss,)

        # chained_time expects fn(*args_fn(chain)) -> scalar
        per_iter, chk = chained_time(lambda loss: loss, one,
                                     args.iters, args.warmup)
        return per_iter * 1000.0, chk

    @jax.jit
    def chain_img(img, chain):
        return img + chain * 0.0

    ms, _ = timed_donating(opt_jit,
                           lambda c: (chain_img(img, c), target, tw))
    results["opt"] = ms

    # --- 5. the shipped full step (adds PCK) ----------------------------
    step = make_train_step(model, tx, mesh)
    base = {"target": target, "target_weight": tw,
            "perceptual_loss": jnp.zeros((B,), jnp.float32)}

    def full_step(state, img_c):
        b = dict(base)
        b["image"] = img_c
        state, metrics = step(state, shard_batch(mesh, b))
        return state, metrics["loss"]

    ms, _ = timed_donating(full_step, lambda c: (chain_img(img, c),))
    results["full"] = ms

    # --- 6. full with rematerialized forward ----------------------------
    def remat_body(state, img, target, tw):
        def lf(params, stats, img, target, tw):
            out, updates = model.apply(
                {"params": params, "batch_stats": stats}, img,
                train=True, mutable=["batch_stats"])
            return person_mse_loss(_njhw(out), target, tw), \
                (updates["batch_stats"], out)
        lf = jax.checkpoint(lf)
        (loss, (new_stats, out)), grads = jax.value_and_grad(
            lf, has_aux=True)(state.params, state.batch_stats, img,
                              target, tw)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        # PCK kept so this is apples-to-apples with `full`
        from stlpose_tpu.parallel.steps import _pck_from_heatmaps
        hit, cnt = _pck_from_heatmaps(_njhw(out), target)
        return PoseTrainState(params=params, batch_stats=new_stats,
                              opt_state=opt_state,
                              step=state.step + 1), \
            loss + 0.0 * (hit + cnt).astype(jnp.float32)

    remat_jit = jax.jit(remat_body, donate_argnums=(0,))
    ms, _ = timed_donating(remat_jit,
                           lambda c: (chain_img(img, c), target, tw))
    results["full_remat"] = ms

    # --- 7. per-branch-geometry conv BACKWARD microbench -----------------
    # Mirrors the inference study's forward conv microbench
    # (profile_hrnet_roofline.py): a 16-deep chain of 3x3 C->C convs per
    # HRNet branch geometry, this time under value_and_grad, so the
    # backward's per-shape MXU efficiency is isolated. bwd FLOPs = 2x fwd
    # (grad-input + grad-weight each cost one forward).
    from jax import lax
    REPS = 16
    geoms = [(64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256)]
    conv_bwd = {}
    dt = jnp.dtype(args.dtype)
    for (H, W, C) in geoms:
        xg = jax.device_put(rng.randn(B, H, W, C).astype(np.float32), dev)
        # DISTINCT weights per layer, like the real model: a chain sharing
        # one kernel lets XLA batch all 16 grad-weight correlations into a
        # single 16x-batch conv and the "backward" measures at 100% of
        # peak — an efficiency the per-layer model cannot reach
        scale = 1.0 / np.sqrt(9.0 * C)
        vg = jax.device_put(
            [rng.randn(3, 3, C, C).astype(np.float32) * scale
             for _ in range(REPS)], dev)

        def chain_fwd(ws, x, chain):
            y = (x + chain * 0.0).astype(dt)
            for w in ws:
                y = lax.conv_general_dilated(
                    y, w.astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # squared loss: cotangents must be DATA-DEPENDENT — with a
            # plain sum the all-ones cotangent lets XLA fold the
            # grad-input convs of constants and the "backward" measures
            # impossibly fast (>100% of peak was observed)
            return jnp.sum(jnp.square(y.astype(jnp.float32))) * 1e-3

        @jax.jit
        def f_fwd(v, x, chain, chain_fwd=chain_fwd):
            return chain_fwd(v, x, chain)

        @jax.jit
        def f_vag(v, x, chain, chain_fwd=chain_fwd):
            loss, g = jax.value_and_grad(chain_fwd)(v, x, chain)
            return loss + 0.0 * sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(g))

        ms_f, _ = chained(f_fwd, lambda c, v=vg, x=xg: (v, x, c))
        ms_vg, _ = chained(f_vag, lambda c, v=vg, x=xg: (v, x, c))
        bwd_ms = (ms_vg - ms_f) / REPS
        fwd_flops = 2.0 * B * H * W * 9 * C * C
        # SOUND number: whole fwd+bwd program efficiency (3x fwd FLOPs over
        # the vag program's time). The delta split (vag - standalone fwd) is
        # only indicative: the standalone forward chain is bandwidth-bound
        # at fat widths (~22% MXU at C=128), and inside the vag program XLA
        # schedules the shared forward tighter, so the delta UNDERESTIMATES
        # backward — taken at face value it implied >100% of peak.
        vag_tflops = 3.0 * fwd_flops * REPS / (ms_vg / 1000.0) / 1e12
        conv_bwd[C] = {
            "geom": f"{H}x{W}x{C}",
            "fwd_ms_per_conv": round(ms_f / REPS, 3),
            "fwdbwd_ms_per_conv": round(ms_vg / REPS, 3),
            "bwd_delta_ms_per_conv_indicative": round(bwd_ms, 3),
            "fwdbwd_tflops": round(vag_tflops, 1),
            "fwdbwd_mxu_efficiency": round(
                vag_tflops / PEAK_BF16_TFLOPS, 3)}

    # --- optional f32 full-step reference point --------------------------
    f32_ms = None
    if not args.skip_f32 and args.dtype != "float32":
        model32 = create_hrnet(args.model, dtype=jnp.float32)
        with jax.default_device(cpu):
            host32, tx32 = create_train_state(
                model32, exp, jax.random.PRNGKey(0), (1, 256, 192, 3))
        step32 = make_train_step(model32, tx32, mesh)
        holder = {"s": jax.device_put(host32, dev)}

        def one32(chain):
            b = dict(base)
            b["image"] = chain_img(img, chain)
            s, metrics = step32(holder["s"], shard_batch(mesh, b))
            holder["s"] = s
            return (metrics["loss"],)

        per_iter, _ = chained_time(lambda loss: loss, one32,
                                   args.iters, args.warmup)
        f32_ms = per_iter * 1000.0

    # --- roofline arithmetic ---------------------------------------------
    step_gflop = GFLOP_FWD_PER_CROP * 3.0          # fwd + ~2x fwd bwd
    meas_us = results["full"] / B * 1000.0
    # GFLOP/ms == TFLOP/s exactly
    ach_tflops = step_gflop * B / results["full"]
    ideal_us = step_gflop / PEAK_BF16_TFLOPS * 1e6 / 1000.0
    shape_us = ideal_us / SHAPE_CEILING

    def r(x):
        return None if x is None else round(x, 2)

    out = {
        "metric": "hrnet_w32_train_roofline",
        "detail": {
            "batch": B, "dtype": args.dtype,
            "iters": args.iters,
            "stage_ms": {k: r(v) for k, v in results.items()},
            "deltas_ms": {
                "bn_stat_tax": r(results["fwd_train"] - results["fwd_eval"]),
                "backward": r(results["grad"] - results["fwd_train"]),
                "optimizer": r(results["opt"] - results["grad"]),
                "pck": r(results["full"] - results["opt"]),
                "remat_overhead": r(results["full_remat"] - results["full"]),
            },
            "samples_per_sec": {k: round(B / (v / 1000.0), 1)
                                for k, v in results.items()},
            "conv_bwd_microbench_by_width": conv_bwd,
            "f32_full_ms": r(f32_ms),
            "roofline": {
                "step_gflop_per_crop": step_gflop,
                "us_per_crop_measured": round(meas_us, 1),
                "us_per_crop_raw_peak": round(ideal_us, 1),
                "us_per_crop_shape_adjusted": round(shape_us, 1),
                "achieved_tflops": round(ach_tflops, 1),
                "pct_of_raw_peak": round(
                    ach_tflops / PEAK_BF16_TFLOPS * 100.0, 1),
                "pct_of_shape_ceiling": round(
                    ach_tflops / (PEAK_BF16_TFLOPS * SHAPE_CEILING)
                    * 100.0, 1),
            },
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_train_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
