"""Bench bookkeeping regressions: env-selected serving flavors must be
reflected in the archived metric name (an env-set flavor must never be
recorded under the baseline metric or time a zero-weight int8 module),
the engine bench must restore its env writes even when a leg fails
mid-construction, and tiny CPU smokes must never write BENCH_extra.json.

These pin the round-5 review fixes in bench.py (the mislabeling class:
the FasterRCNN facade resolves STLPOSE_FRCNN_TRUNK_QUANT /
STLPOSE_PALLAS_ROI_INT8 at construction, so the bench must resolve them
identically BEFORE naming the metric).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


@pytest.fixture(autouse=True)
def _tiny_bench(monkeypatch):
    # tiny config: CPU smoke of the bench plumbing itself
    monkeypatch.setenv("STLPOSE_BENCH_TINY", "1")


def test_env_selected_trunk_flavor_is_named(monkeypatch):
    monkeypatch.setenv("STLPOSE_FRCNN_TRUNK_QUANT", "folded")
    r = bench.bench_detector(2, 1, 1, dtype="float32")
    assert r["metric"].endswith("_trunk_folded"), r["metric"]
    assert r["detail"]["trunk_quant"] == "folded"


def test_baseline_metric_unsuffixed(monkeypatch):
    monkeypatch.delenv("STLPOSE_FRCNN_TRUNK_QUANT", raising=False)
    monkeypatch.delenv("STLPOSE_PALLAS_ROI_INT8", raising=False)
    r = bench.bench_detector(2, 1, 1, dtype="float32")
    assert r["metric"] == "faster_rcnn_inference_throughput", r["metric"]
    assert r["detail"]["trunk_quant"] == "none"
    assert r["detail"]["roi_patch_quant"] is False


def test_archive_extra_tiny_guard(tmp_path):
    # BENCH_TINY is set (autouse fixture): archive_extra must refuse
    before = os.path.getmtime(os.path.join(
        os.path.dirname(bench.__file__), "BENCH_extra.json"))
    assert bench.archive_extra({"metric": "smoke", "value": 0}) is False
    after = os.path.getmtime(os.path.join(
        os.path.dirname(bench.__file__), "BENCH_extra.json"))
    assert before == after


def test_engine_bench_restores_env_on_failure(monkeypatch):
    """An exception between the engine bench's env writes and its model
    construction must not leak STLPOSE_DTYPE / flavor env into later
    legs of a one-process measurement batch."""
    import stlpose_tpu.utils.experiment as expmod

    keys = ("STLPOSE_DTYPE", "STLPOSE_FRCNN_TRUNK_QUANT",
            "STLPOSE_PALLAS_ROI_INT8")
    for k in keys:
        monkeypatch.delenv(k, raising=False)

    def boom(*a, **kw):
        raise RuntimeError("synthetic failure")

    monkeypatch.setattr(expmod, "create_experiment", boom)
    with pytest.raises(RuntimeError, match="synthetic"):
        bench.bench_two_stage_engine(2, 1, 1, dtype="bfloat16",
                                     trunk_quant="int8", roi_quant=True)
    for k in keys:
        assert os.environ.get(k) is None, k
