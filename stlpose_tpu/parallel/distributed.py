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
    single host (no coordinator env present) it is a no-op.

    Failure policy (VERDICT r1): when a coordinator was EXPLICITLY
    requested — via argument or via a coordinator env var — initialization
    errors re-raise, so a misconfigured pod run fails loudly instead of
    silently degrading to single-host training.
    """
    import os

    # NB: must not touch the backend (jax.process_count/jax.devices) before
    # jax.distributed.initialize — backend init forecloses distributed init.
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # already initialized
    env_coord = next((k for k in ("COORDINATOR_ADDRESS",
                                  "MEGASCALE_COORDINATOR_ADDRESS",
                                  "TPU_WORKER_HOSTNAMES")
                      if k in os.environ), None)
    if coordinator_address is None and env_coord is None:
        return  # single host: nothing requested, nothing to do
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address,
                                       num_processes, process_id)
        else:
            jax.distributed.initialize()
    except Exception as e:
        src = (f"coordinator_address={coordinator_address!r}"
               if coordinator_address is not None else f"env {env_coord}")
        raise RuntimeError(
            f"jax.distributed.initialize failed for explicitly requested "
            f"multi-host setup ({src}); refusing to silently fall back to "
            f"single-host training") from e


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
