"""One-process TPU measurement batch: ResNet-trunk serving flavors + the
two-stage latency leg.

VERDICT r4 next-item 1(b): extend the PTQ machinery to the detector's
fat-conv ResNet trunk and measure whether the v5e int8 MXU path pays
there (it did NOT pay on HRNet's thin branches — README int8 row). Also
refreshes the serving latency profile so it carries the fused two-stage
leg (VERDICT r4 #6). All legs share ONE process (CLAUDE.md
one-JAX-process rule; chained-dependency timing throughout via bench.py's
helpers). Results are archived into BENCH_extra.json exactly the way
bench.py main() archives non-headline runs.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B


def archive(result):
    # one shared archival path (tiny smoke runs print but never pollute
    # the measurement archive — bench.archive_extra guards that)
    B.archive_extra(result)
    print(json.dumps(result), flush=True)


def run(leg, fn, *a, **kw):
    """One leg; a failure is reported but never loses the others'
    already-archived results (each leg archives on completion)."""
    import traceback
    try:
        archive(fn(*a, **kw))
    except Exception:
        print(f"LEG FAILED: {leg}", flush=True)
        traceback.print_exc()


def main():
    iters = int(os.environ.get("ITERS", "30"))
    warmup = int(os.environ.get("WARMUP", "5"))
    batch = int(os.environ.get("BATCH", "16"))

    # -- detector flavors, same process so A/B deltas are honest ---------
    # 1. bf16 baseline (current default: pp RoI mode)
    run("base", B.bench_detector, batch, iters, warmup, dtype="bfloat16")
    # 2. BN-folded trunk
    run("folded", B.bench_detector, batch, iters, warmup, dtype="bfloat16",
        trunk_quant="folded")
    # 3. int8 PTQ trunk (signed, the throughput flavor)
    run("int8", B.bench_detector, batch, iters, warmup, dtype="bfloat16",
        trunk_quant="int8")
    # 4. int8u PTQ trunk (unsigned, the accuracy flavor)
    run("int8u", B.bench_detector, batch, iters, warmup, dtype="bfloat16",
        trunk_quant="int8u")
    # 5. current headline combo re-measure (int8 RoI patch pyramid)
    run("roi8", B.bench_detector, batch, iters, warmup, dtype="bfloat16",
        roi_patch_quant=True)
    # 6. the full stack: int8 trunk + int8 RoI patches
    run("int8+roi8", B.bench_detector, batch, iters, warmup,
        dtype="bfloat16", roi_patch_quant=True, trunk_quant="int8")

    # -- two-stage compact with the best trunk flavor at the B=128 knee --
    if os.environ.get("SKIP_TWOSTAGE", "0") != "1":
        ts_batch = int(os.environ.get("TS_BATCH", "128"))
        run("twostage", B.bench_two_stage_compact, ts_batch, iters, warmup,
            dtype="bfloat16", trunk_quant="int8")

    # -- serving latency profile incl. the fused two-stage leg -----------
    if os.environ.get("SKIP_LATENCY", "0") != "1":
        run("latency", B.bench_latency, 40, warmup)


if __name__ == "__main__":
    main()
