"""Where the engine-vs-compact throughput gap goes, phase by phase.

The ENGINE entry point (`VaseEvaluator.process_images`, fused packed
path) measures ~85% of the chained compact program's steady-state at
B=128 and less at smaller batches (README two-stage rows). This script
decomposes one engine call into its phases so the residual is evidence,
not attribution:

  total        unchained wall time of process_images(imgs_dev)
  device       chained steady-state of the SAME fused packed program
               (pure compute rate, the twostage_compact protocol)
  fetch_rt     np.array() of an equally-sized buffer from a trivial
               jitted program — the RPC round trip + D2H bytes floor
  host_work    _unpack_fused_outputs + per-image result assembly on an
               already-fetched numpy buffer

  residual = total - device - fetch_rt - host_work
             (enqueue/dispatch overhead + phase overlap error)

Writes PROFILE_engine_tax.json. Run on the TPU chip with a quiet host
(CLAUDE.md: concurrent CPU jobs skew unchained wall timings).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dets_per_img", type=int, default=16)
    args = ap.parse_args()

    os.environ["STLPOSE_DTYPE"] = "bfloat16"
    import jax
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import tempfile
    from stlpose_tpu.engines.detector_trainer import build_detector
    from stlpose_tpu.engines.vase_evaluator import (
        VaseEvaluator, _fused_pack_spec, _unpack_fused_outputs,
        build_fused_two_stage)
    from stlpose_tpu.utils.experiment import create_experiment
    from stlpose_tpu.utils.timing import chained_time

    results = {"iters": args.iters, "phases_ms": {}}
    for batch in [int(b) for b in args.batches.split(",")]:
        root = tempfile.mkdtemp()
        exp_path = create_experiment("profile_engine_tax",
                                     {"batch_size": batch}, root=root)
        rngb = np.random.RandomState(0)
        budget = int(-(-int(rngb.randint(1, 4, size=batch).sum()) // 8)
                     * 8)
        ev = VaseEvaluator(exp_path, bbox_thr=0.5,
                           max_dets=args.dets_per_img,
                           detector_config="faster_rcnn", save=False,
                           use_fused=True, crop_budget=budget)
        ev.detector, ev.det_cfg = build_detector(ev.exp_data,
                                                 "faster_rcnn")
        S = ev.det_cfg.image_size
        ev.setup_models(config_name="w32_256x192", pretrained=None)
        rng = np.random.RandomState(1)
        images = rng.rand(batch, S, S, 3).astype(np.float32)
        imgs_dev = jnp.asarray(images)

        # --- total: the engine entry point, unchained (device-resident)
        ev.process_images(imgs_dev)
        for _ in range(args.warmup):
            ev.process_images(imgs_dev)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            res = ev.process_images(imgs_dev)
        total = (time.perf_counter() - t0) / args.iters

        # --- device: chained steady-state of the same fused program
        inner = build_fused_two_stage(
            ev.detector, ev.pose_model, bbox_thr=ev.bbox_thr,
            max_dets=min(args.dets_per_img,
                         ev.det_cfg.detections_per_img),
            budget=budget, pallas_crop=ev._pallas_crop)
        det_vars = ev.det_state.variables()
        pose_vars = ev.pose_state.variables()

        @jax.jit
        def chained(det_vars, pose_vars, imgs, chain):
            out = inner(det_vars, pose_vars, imgs + chain * 0.0)
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in out.values())

        device, _ = chained_time(
            chained,
            lambda c: (det_vars, pose_vars, imgs_dev, c),
            args.iters, args.warmup)

        # --- fetch_rt: np.array() of an equally-sized packed buffer
        # from a trivial program (RPC round trip + D2H bytes floor)
        m = min(args.dets_per_img, ev.det_cfg.detections_per_img)
        spec = _fused_pack_spec(batch, m, budget,
                                ev.pose_model.config.num_joints)
        n_elems = sum(int(np.prod(shape)) for _, shape, _ in spec)
        seed = jnp.zeros((n_elems,), jnp.float32)
        triv = jax.jit(lambda x: x + 1.0)
        np.array(triv(seed))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            buf_host = np.array(triv(seed))
        fetch_rt = (time.perf_counter() - t0) / args.iters

        # --- host_work: unpack + assembly on a fetched buffer
        f, fspec = ev._get_fused(batch, budget)
        buf = np.array(f(det_vars, pose_vars, imgs_dev), np.float32)
        kpt_thr = ev.kpt_thr
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = _unpack_fused_outputs(buf.copy(), fspec)
            crop_kpts, img_kpts = out["crop_kpts"], out["img_kpts"]
            for arr in (crop_kpts, img_kpts):
                arr[arr[..., 2] < kpt_thr] = 0
            rs = []
            for i in range(batch):
                v = out["sel_valid"][i]
                pick = (out["img_idx"] == i) & out["picked_valid"]
                rs.append({"boxes": out["sel_boxes"][i][v],
                           "scores": out["sel_scores"][i][v],
                           "crop_keypoints": crop_kpts[pick],
                           "image_keypoints": img_kpts[pick]})
            del rs
        host_work = (time.perf_counter() - t0) / args.iters

        ms = lambda s: round(s * 1000, 2)
        entry = {"total": ms(total), "device_chained": ms(device),
                 "fetch_rt_floor": ms(fetch_rt),
                 "host_unpack_assembly": ms(host_work),
                 "residual": ms(total - device - fetch_rt - host_work),
                 "budget": budget,
                 "packed_elems": n_elems,
                 "engine_imgs_per_sec": round(batch / total, 1),
                 "device_imgs_per_sec": round(batch / device, 1)}
        results["phases_ms"][str(batch)] = entry
        print(json.dumps({f"B={batch}": entry}))

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_engine_tax.json")
    with open(out_path, "w") as fo:
        json.dump(results, fo, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
