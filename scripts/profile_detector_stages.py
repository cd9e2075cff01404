"""Faster R-CNN predict stage-level profile.

Times nested prefixes of the predict program at batch 16 so stage costs
fall out as deltas: trunk (backbone+FPN+RPN heads) -> +proposal selection
-> +RoIAlign -> +box head -> full predict (adds per-class NMS + top-k).
The prefix chain keeps the XLA banded-matmul RoIAlign throughout so the
deltas stay comparable; the fused Pallas kernel (ops/pallas_roi.py) is
timed as two counterpart stages (+RoIAlign and full predict) so the
kernel's stage-level win reads directly off the JSON.
Writes PROFILE_detector_stages.json; prose analysis in PROFILE_detector.md.
"""

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from stlpose_tpu.models.faster_rcnn import (FasterRCNN,
                                                FasterRCNNModule,
                                                select_proposals)
    from stlpose_tpu.ops.roi_align import multilevel_roi_align
    from stlpose_tpu.utils.timing import chained_time

    B = args.batch
    det = FasterRCNN(dtype=jnp.dtype(args.dtype), pallas_roi=False)
    det_p = FasterRCNN(dtype=jnp.dtype(args.dtype), pallas_roi=True)
    cfg = det.config
    S = cfg.image_size
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = det.init(jax.random.PRNGKey(0))
    variables = jax.device_put(variables, jax.devices()[0])
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(B, S, S, 3).astype(np.float32),
                            jax.devices()[0])

    def trunk(variables, images):
        return det.module.apply(variables, images, train=False)

    def stage_trunk(variables, images, chain):
        feats, logits, deltas = trunk(variables, images + chain * 0.0)
        return (sum(jnp.sum(l.astype(jnp.float32)) for l in logits) +
                sum(jnp.sum(d.astype(jnp.float32)) for d in deltas))

    def stage_props(variables, images, chain):
        feats, logits, deltas = trunk(variables, images + chain * 0.0)
        anchors_l = det._get_anchors(logits)

        def per_image(lg, dl):
            props, sc = select_proposals(cfg, anchors_l, list(lg),
                                         list(dl), False)
            return jnp.sum(props) + jnp.sum(sc)

        return jnp.sum(jax.vmap(per_image)(tuple(logits), tuple(deltas)))

    def stage_roi(variables, images, chain):
        feats, logits, deltas = trunk(variables, images + chain * 0.0)
        anchors_l = det._get_anchors(logits)

        def per_image(lg, dl, feats_i):
            props, _ = select_proposals(cfg, anchors_l, list(lg),
                                        list(dl), False)
            pooled = multilevel_roi_align(
                [f for f in feats_i], props,
                strides=cfg.strides[:len(feats_i)])
            return jnp.sum(pooled.astype(jnp.float32))

        return jnp.sum(jax.vmap(per_image)(tuple(logits), tuple(deltas),
                                           tuple(feats[:4])))

    def stage_boxhead(variables, images, chain):
        feats, logits, deltas = trunk(variables, images + chain * 0.0)
        anchors_l = det._get_anchors(logits)

        def per_image(lg, dl, feats_i):
            props, _ = select_proposals(cfg, anchors_l, list(lg),
                                        list(dl), False)
            cls_logits, box_deltas = det.module.apply(
                variables, list(feats_i), props,
                method=FasterRCNNModule.roi)
            return (jnp.sum(cls_logits.astype(jnp.float32)) +
                    jnp.sum(box_deltas.astype(jnp.float32)))

        return jnp.sum(jax.vmap(per_image)(tuple(logits), tuple(deltas),
                                           tuple(feats[:4])))

    def stage_full(variables, images, chain):
        out = det.predict(variables, images + chain * 0.0)
        return jnp.sum(out["boxes"]) + jnp.sum(out["scores"])

    # Pallas counterparts: one fused kernel over ALL B*P boxes (the
    # roi_batched path serving predict uses on TPU)
    from stlpose_tpu.ops.pallas_roi import (
        multilevel_roi_align_pallas_batched, use_pallas_roi)

    def stage_roi_pallas(variables, images, chain):
        feats, logits, deltas = trunk(variables, images + chain * 0.0)
        anchors_l = det._get_anchors(logits)
        props = jax.vmap(
            lambda lg, dl: select_proposals(cfg, anchors_l, list(lg),
                                            list(dl), False)[0])(
            tuple(logits), tuple(deltas))
        pooled = multilevel_roi_align_pallas_batched(
            [f for f in feats[:4]], props,
            strides=cfg.strides[:4])
        return jnp.sum(pooled.astype(jnp.float32))

    def stage_full_pallas(variables, images, chain):
        out = det_p.predict(variables, images + chain * 0.0)
        return jnp.sum(out["boxes"]) + jnp.sum(out["scores"])

    stages = [("trunk", stage_trunk), ("plus_proposals", stage_props),
              ("plus_roialign", stage_roi), ("plus_boxhead", stage_boxhead),
              ("full_predict", stage_full)]
    results = {}
    prev = 0.0
    for name, fn in stages:
        per_iter, _ = chained_time(
            jax.jit(fn), lambda c: (variables, images, c),
            args.iters, args.warmup)
        ms = per_iter * 1000.0
        results[name] = {"ms": round(ms, 2),
                         "delta_ms": round(ms - prev, 2)}
        print(f"{name:15s} {ms:8.2f} ms  (+{ms - prev:6.2f})", flush=True)
        prev = ms

    if use_pallas_roi():
        base = results["plus_proposals"]["ms"]
        for name, fn in [("plus_roialign_pallas", stage_roi_pallas),
                         ("full_predict_pallas", stage_full_pallas)]:
            per_iter, _ = chained_time(
                jax.jit(fn), lambda c: (variables, images, c),
                args.iters, args.warmup)
            ms = per_iter * 1000.0
            results[name] = {"ms": round(ms, 2)}
            print(f"{name:22s} {ms:8.2f} ms", flush=True)
        results["plus_roialign_pallas"]["delta_vs_proposals_ms"] = round(
            results["plus_roialign_pallas"]["ms"] - base, 2)

    out = {"metric": "faster_rcnn_stage_profile", "batch": B,
           "dtype": args.dtype, "image_size": S, "stages": results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_detector_stages.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
