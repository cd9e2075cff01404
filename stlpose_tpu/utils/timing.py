"""Chained-dependency device timing (the only honest protocol under this
environment's TPU tunnel — CLAUDE.md: ``block_until_ready`` returns at
enqueue, so naive timers measure dispatch, not execution).

Protocol: every timed iteration's input depends on a scalar produced by
the previous iteration, the warmup chain is drained BEFORE starting the
clock, and exactly ONE host fetch after the timed loop drains the whole
chain. Per-call RPC latency amortizes over ``iters``; it is not
subtracted. Used by bench.py and the scripts/profile_*.py tools.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple


def chained_time(fn: Callable, args_fn: Callable, iters: int,
                 warmup: int) -> Tuple[float, float]:
    """Time ``fn(*args_fn(chain))`` over ``iters`` chained executions.

    Args:
      fn: jitted callable returning a float scalar (the chain link).
      args_fn: chain-scalar -> argument tuple for ``fn``.
      iters/warmup: timed / untimed iteration counts.

    Returns:
      (seconds_per_iter, final_chain_value).
    """
    import jax.numpy as jnp

    chain = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        chain = fn(*args_fn(chain))
    float(chain)                        # drain warmup before timing
    t0 = time.perf_counter()
    for _ in range(iters):
        chain = fn(*args_fn(chain))
    chk = float(chain)                  # one fetch drains the whole chain
    total = time.perf_counter() - t0
    return total / iters, chk
