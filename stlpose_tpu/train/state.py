"""
Train state: the single PyTree holding params, BN statistics, optimizer
state, and step counter.

This is the TPU-native unit of checkpointing and sharding — the reference's
``{epoch, model/optimizer/scheduler state_dict}`` bundle
(reference: lib/model_setup.py:162-207) becomes one donated PyTree flowing
through the compiled train step; Orbax serializes it (utils/checkpoint.py).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class PoseTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(model, exp_data: dict, rng, input_shape,
                       variables=None) -> tuple[PoseTrainState, optax.GradientTransformation]:
    """Initialize (or adopt) model variables and build the optimizer.

    Args:
      model: a Flax module with ``__call__(x, train)``.
      exp_data: experiment parameters (training group drives the optimizer).
      rng: PRNGKey for init.
      input_shape: e.g. (1, 256, 192, 3).
      variables: optional pre-loaded {"params", "batch_stats"} (e.g. from a
        converted torch checkpoint) to adopt instead of random init.
    """
    from stlpose_tpu.train.optim import build_optimizer

    if variables is None:
        variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                               train=False)
    tx = build_optimizer(exp_data)
    params = variables["params"]
    state = PoseTrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def param_count(state: PoseTrainState) -> int:
    import numpy as np
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(state.params))
