"""
Multi-host (pod-scale) utilities.

The reference never scales past one process (SURVEY.md §2.9 — its
multi-process eval hooks are dead code). These are the working TPU-native
equivalents: ``jax.distributed.initialize`` bootstrap, per-host batch
slicing for the input pipeline, and the cross-host prediction gather that
replaces the reference's commented-out ``CocoEvaluator.merge``
(lib/detection_coco_eval.py:165-196).

On a single host every helper degrades to a no-op, so engines call them
unconditionally.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Bring up the JAX distributed runtime when running multi-host.

    With no arguments, relies on TPU pod environment auto-detection; on a
    single host (no coordinator found) it is a no-op.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address,
                                       num_processes, process_id)
        elif any(k in __import__("os").environ
                 for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                           "TPU_WORKER_HOSTNAMES")):
            jax.distributed.initialize()
    except Exception:
        pass  # single host


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def host_slice(n_total: int) -> slice:
    """Contiguous shard of a dataset for this host (multi-host input
    pipelines feed only their slice of the global batch)."""
    per = (n_total + process_count() - 1) // process_count()
    start = process_index() * per
    return slice(start, min(start + per, n_total))


def all_gather_host(arrays):
    """Gather per-host numpy arrays (concatenated on axis 0) onto every
    host — the working version of the reference's dead ``merge()``.

    Single-host: identity.
    """
    if process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(
            multihost_utils.process_allgather(np.asarray(x))
        ).reshape((-1,) + np.asarray(x).shape[1:]),
        arrays)
