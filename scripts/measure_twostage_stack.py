"""Follow-up one-process TPU batch: two-stage compact A/B at the B=128
knee — fresh post-pp baseline vs the full quantized stack (int8 RoI patch
pyramid + int8 PTQ ResNet trunk). Complements measure_trunk_quant.py;
same archiving contract."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B
from scripts.measure_trunk_quant import archive, run


def main():
    iters = int(os.environ.get("ITERS", "30"))
    warmup = int(os.environ.get("WARMUP", "5"))
    ts_batch = int(os.environ.get("TS_BATCH", "128"))

    # 1. fresh baseline (pp RoIAlign default, no quant) — the r4 379
    #    entry predates the per-point DMA mode
    run("ts-base", B.bench_two_stage_compact, ts_batch, iters, warmup,
        dtype="bfloat16")
    # 2. the full stack
    run("ts-full", B.bench_two_stage_compact, ts_batch, iters, warmup,
        dtype="bfloat16", trunk_quant="int8", roi_patch_quant=True)
    # 3. full stack at B=64 (the engine-relevant batch)
    run("ts-full-64", B.bench_two_stage_compact, 64, iters, warmup,
        dtype="bfloat16", trunk_quant="int8", roi_patch_quant=True)


if __name__ == "__main__":
    main()
