"""
Compiled data-parallel steps for the detector stage.

The reference trains its detector with torchvision's loss dict summed and a
non-finite-loss skip (reference: 02_train_faster_rcnn.py:205-223). Here the
whole step — backbone/FPN/RPN/RoI forward, target assignment, sampling,
losses, backward, update — is one XLA program; the non-finite guard becomes
a ``where`` that keeps the old state when the loss is bad (no host sync).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stlpose_tpu.train.state import PoseTrainState


def make_detector_train_step(detector, tx, mesh,
                             perceptual_cfg: dict | None = None,
                             donate: bool = True) -> Callable:
    """step(state, batch, rng) -> (state, metrics).

    batch: {image (N,S,S,3), boxes (N,K,4), labels (N,K), box_mask (N,K),
    perceptual_loss (N,)}.
    """
    from stlpose_tpu.train.loss import apply_perceptual_loss

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        total, (loss_dict, new_stats) = detector.loss_fn(variables, batch,
                                                         rng, train=True)
        if perceptual_cfg is not None:
            total = apply_perceptual_loss(
                perceptual_cfg, total, batch.get("perceptual_loss", 0.0))
        return total, (loss_dict, new_stats)

    def step(state: PoseTrainState, batch, rng):
        (loss, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + jnp.where(finite, u, 0.0)).astype(p.dtype),
            state.params, updates)
        metrics = {"loss": loss, "finite": finite.astype(jnp.float32),
                   **loss_dict}
        return PoseTrainState(params=params, batch_stats=new_stats,
                              opt_state=opt_state,
                              step=state.step + 1), metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def make_detector_predict(detector, mesh,
                          use_shard_map: bool | None = None) -> Callable:
    """predict(state, images) -> padded {boxes, scores, labels, valid}.

    On a multi-device mesh with the fused Pallas RoIAlign enabled, the
    whole predict runs under ``shard_map`` over the data axis: GSPMD has
    no partitioning rule for the Mosaic custom call, but per-device the
    program is purely local (no collectives in predict), so each device
    simply runs the kernel on its batch shard. ``use_shard_map`` forces
    the path either way (tests exercise the plumbing on the virtual CPU
    mesh with the XLA RoIAlign)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    if use_shard_map is None:
        use_shard_map = (mesh.devices.size > 1 and
                         getattr(detector.module, "pallas_roi", False))
    if use_shard_map:
        from jax import shard_map

        local = shard_map(
            lambda v, imgs: detector.predict(v, imgs), mesh=mesh,
            in_specs=(P(), P("data")), out_specs=P("data"),
            check_vma=False)

        def predict(state: PoseTrainState, images):
            return local(state.variables(), images)
    else:
        def predict(state: PoseTrainState, images):
            return detector.predict(state.variables(), images)

    return jax.jit(predict, in_shardings=(repl, data), out_shardings=data)
