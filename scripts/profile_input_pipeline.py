"""Host input-pipeline throughput: can datagen feed the train step?

Measures PoseDataPipeline's HOST stage (threaded JPEG decode + cv2 warp +
collate; the reference does all of this single-threaded per sample,
CONFIG.py:18 num_workers=0) in samples/sec for both modes:

  host-warp    decode + per-crop cv2 warp on host, device does
               normalize+targets (the parity-default path)
  device-warp  decode + letterbox only on host; crop warp + targets run in
               the Pallas kernel on device (BASELINE config #2)

Run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu for a host-only number
(device work then runs on the CPU backend and is reported separately), or
against the TPU to include the real device stage.

Writes PROFILE_input_pipeline.json and prints one JSON line.
"""

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = ap.parse_args()

    import cv2
    import jax

    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from stlpose_tpu.data.pipeline import PoseDataPipeline
    from stlpose_tpu.data.pose_dataset import PoseRecord

    H, W = args.hw
    rng = np.random.RandomState(0)
    td = tempfile.mkdtemp(prefix="pipe_bench_")
    paths = []
    for i in range(16):                 # 16 distinct JPEGs, cycled
        p = os.path.join(td, f"im{i}.jpg")
        cv2.imwrite(p, rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
        paths.append(p)

    records = []
    for i in range(args.n_images):
        records.append(PoseRecord(
            image=paths[i % len(paths)], original_image=paths[i % len(paths)],
            image_id=i,
            center=np.array([W / 2, H / 2], np.float32) +
            rng.uniform(-40, 40, 2).astype(np.float32),
            scale=np.array([1.2, 1.2], np.float32),
            joints=rng.uniform(50, 250, (17, 2)).astype(np.float32),
            joints_vis=np.ones(17, np.float32)))

    exp = {"dataset": {"scale_factor": 0.35, "rot_factor": 45.0,
                       "flip": True, "num_joints_half_body": 8,
                       "prob_half_body": 0.3}}

    out = {"metric": "input_pipeline_throughput", "unit": "samples/sec",
           "detail": {"n_images": args.n_images, "batch": args.batch,
                      "workers": args.workers, "image_hw": [H, W],
                      "backend": jax.default_backend(),
                      "host_cpus": os.cpu_count(),
                      "note": "threaded host stage scales with cores; this "
                              "container exposes a single vCPU (real v5e "
                              "hosts have ~112), so treat these as "
                              "per-core lower bounds"}}
    for mode, device_warp in (("host_warp", False), ("device_warp", True)):
        pipe = PoseDataPipeline(records, batch_size=args.batch,
                                is_train=True, exp_data=exp, shuffle=True,
                                num_workers=args.workers,
                                device_warp=device_warp)
        n = 0
        last = None
        t0 = time.perf_counter()
        for b in pipe:
            n += b["n_valid"]
            last = b["image"]
        _ = np.asarray(last[0, 0, 0])   # drain the last device batch
        dt = time.perf_counter() - t0
        out["detail"][mode] = {"samples_per_sec": round(n / dt, 1),
                               "wall_s": round(dt, 2)}
    out["value"] = out["detail"]["host_warp"]["samples_per_sec"]

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_input_pipeline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
