"""Multi-host plumbing (parallel/distributed.py): a REAL 2-process CPU
``jax.distributed`` run exercising initialize + the cross-host prediction
gather (the working version of the reference's dead ``CocoEvaluator.merge``,
lib/detection_coco_eval.py:165-196), plus the loud-failure policy for
explicitly requested coordinators (VERDICT r1 item 7)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.pop("XLA_FLAGS", None)   # no virtual devices: real 2-proc setup
sys.path.insert(0, {repo!r})
import numpy as np
from stlpose_tpu.parallel.distributed import (initialize_distributed,
                                              all_gather_host,
                                              process_count, process_index,
                                              host_slice)
initialize_distributed(f"127.0.0.1:{{port}}", 2, pid)
assert process_count() == 2 and process_index() == pid
sl = host_slice(10)
assert (sl.start, sl.stop) == (5 * pid, 5 * (pid + 1))
out = all_gather_host({{"preds": np.full((3, 2), pid, np.float32)}})
assert out["preds"].shape == (6, 2), out["preds"].shape
assert float(out["preds"].sum()) == 6.0
print(f"proc{{pid}} OK")
""".format(repo=REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_initialize_and_allgather(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": ""}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK" in out


def test_explicit_coordinator_failure_raises(monkeypatch):
    import jax
    from stlpose_tpu.parallel import distributed

    def boom(*a, **k):
        raise ConnectionError("no coordinator there")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="refusing to silently"):
        distributed.initialize_distributed("127.0.0.1:1", 2, 0)

    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:1")
    with pytest.raises(RuntimeError, match="refusing to silently"):
        distributed.initialize_distributed()


def test_no_coordinator_is_noop(monkeypatch):
    import jax
    from stlpose_tpu.parallel import distributed

    def boom(*a, **k):  # must never be called
        raise AssertionError("initialize called without a coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    distributed.initialize_distributed()   # single host: no-op
