"""
Compiled data-parallel train/eval/inference steps.

The reference's hot loop (reference: 02_train.py:195-239) does
host-augmented batches -> DataParallel forward -> loss -> backward -> step,
with a D2H sync every batch for the PCK metric. Here the WHOLE step —
augmentation warps already done device-side upstream, forward, masked MSE,
backward, optimizer update, BN stat update, and the PCK metric — is one XLA
program under ``jit`` with sharding annotations: batch sharded over the
mesh's data axis, state replicated, gradient psum inserted by the compiler.
The step donates the train state so parameters update in place in HBM.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P, NamedSharding

from stlpose_tpu.ops.decode import heatmap_argmax
from stlpose_tpu.ops.flip import average_flip_tta
from stlpose_tpu.train.loss import person_mse_loss
from stlpose_tpu.train.state import PoseTrainState


def _nhwc_to_njhw(hm):
    """(N, H, W, J) model output -> (N, J, H, W) metric/decode layout."""
    return jnp.transpose(hm, (0, 3, 1, 2))


def _pck_from_heatmaps(pred_njhw, target_njhw, thr=0.5):
    """PCK with the reference's normalization quirks (see ops/pck.py),
    reduced to scalars that average correctly across devices."""
    H, W = pred_njhw.shape[2], pred_njhw.shape[3]
    pred, _ = heatmap_argmax(pred_njhw)
    gt, _ = heatmap_argmax(target_njhw)
    norm = jnp.array([H, W], jnp.float32) / 10.0
    valid = (gt[..., 0] > 1) & (gt[..., 1] > 1)
    dist = jnp.linalg.norm((pred - gt) / norm, axis=-1)
    hit = ((dist < thr) & valid).sum()
    cnt = valid.sum()
    return hit, cnt


@jax.jit
def _accum_metrics(sums, metrics):
    """One fused device-side add of a step's metric scalars into running
    sums. Keys present in ``sums`` as ``_<k>_finite`` get a non-finite
    guard (non-finite values are skipped and the finite count tracked),
    mirroring the reference's skip-batch-on-nan behavior
    (02_train_faster_rcnn.py:221-223) without a host sync."""
    out = {"_n": sums["_n"] + 1.0}
    for k, v in metrics.items():
        v = jnp.asarray(v, jnp.float32)
        fk = f"_{k}_finite"
        if fk in sums:
            ok = jnp.isfinite(v)
            out[k] = sums[k] + jnp.where(ok, v, 0.0)
            out[fk] = sums[fk] + ok.astype(jnp.float32)
        else:
            out[k] = sums[k] + v
    return out


class MetricAccumulator:
    """Device-side metric accumulation for engine hot loops.

    The reference fetches loss/PCK to the host every batch
    (02_train.py:223); under an RPC-tunneled TPU each fetch is a ~30 ms
    blocking round trip. Here ``update`` enqueues ONE tiny jitted add per
    step (no host sync) and ``fetch`` transfers the handful of running sums
    exactly once — per epoch or per logging window.

    ``fetch`` returns ``{"n": steps, "<k>_sum": float, "<k>_mean": float}``
    per metric key; for keys named in ``finite_only`` the mean is over
    finite steps only.
    """

    def __init__(self, finite_only: tuple = ()):
        self._sums = None
        self._finite_only = tuple(finite_only)

    def update(self, metrics: dict) -> None:
        if self._sums is None:
            z = jnp.zeros((), jnp.float32)
            self._sums = {"_n": z}
            for k in metrics:
                self._sums[k] = z
                if k in self._finite_only:
                    self._sums[f"_{k}_finite"] = z
        self._sums = _accum_metrics(self._sums, metrics)

    @property
    def empty(self) -> bool:
        return self._sums is None

    def fetch(self) -> dict:
        """ONE host transfer of the running sums."""
        if self._sums is None:
            return {"n": 0.0}
        host = jax.device_get(self._sums)
        n = float(host["_n"])
        out = {"n": n}
        for k, v in host.items():
            if k.startswith("_"):
                continue
            denom = float(host.get(f"_{k}_finite", n))
            out[f"{k}_sum"] = float(v)
            out[f"{k}_n"] = denom
            out[f"{k}_mean"] = float(v) / denom if denom else 0.0
        return out


def make_train_step(model, tx, mesh, perceptual_cfg: dict | None = None,
                    donate: bool = True) -> Callable:
    """Build the compiled train step.

    Args:
      model: Flax module (NHWC in, NHWC heatmaps out).
      tx: optax optimizer.
      mesh: jax Mesh with a "data" axis.
      perceptual_cfg: experiment dict for perceptual-loss weighting (None to
        disable; see train/loss.py).
    Returns:
      step(state, batch) -> (state, metrics) compiled under jit; ``batch``
      is {"image": (N,256,192,3), "target": (N,J,Hh,Hw),
      "target_weight": (N,J), "perceptual_loss": (N,)}.
    """
    from stlpose_tpu.train.loss import apply_perceptual_loss

    def loss_fn(params, batch_stats, batch):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])
        pred = _nhwc_to_njhw(out)
        loss = person_mse_loss(pred, batch["target"],
                               batch["target_weight"])
        if perceptual_cfg is not None:
            loss = apply_perceptual_loss(
                perceptual_cfg, loss, batch.get("perceptual_loss", 0.0))
        return loss, (updates["batch_stats"], pred)

    def step(state: PoseTrainState, batch):
        (loss, (new_stats, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        hit, cnt = _pck_from_heatmaps(pred, batch["target"])
        metrics = {"loss": loss, "pck_hit": hit, "pck_cnt": cnt}
        return PoseTrainState(params=params, batch_stats=new_stats,
                              opt_state=opt_state, step=state.step + 1), metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step,
                   in_shardings=(repl, data),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh, flip_tta: bool = False) -> Callable:
    """Build the compiled eval step: forward (optionally with flip-TTA as a
    single doubled-batch forward), loss, PCK, and heatmaps for decode.

    The reference runs two sequential forwards for flip-TTA
    (lib/inference.py:16-27); here the flipped copies are concatenated into
    the same batch so the MXU sees one 2N matmul stream.
    """

    def step(state: PoseTrainState, batch):
        imgs = batch["image"]
        if flip_tta:
            both = jnp.concatenate([imgs, imgs[:, :, ::-1, :]], axis=0)
            out = model.apply(state.variables(), both, train=False)
            n = imgs.shape[0]
            direct = _nhwc_to_njhw(out[:n])
            flipped = _nhwc_to_njhw(out[n:])
            pred = average_flip_tta(direct, flipped)
        else:
            out = model.apply(state.variables(), imgs, train=False)
            pred = _nhwc_to_njhw(out)
        loss = person_mse_loss(pred, batch["target"],
                               batch["target_weight"])
        hit, cnt = _pck_from_heatmaps(pred, batch["target"])
        return pred, {"loss": loss, "pck_hit": hit, "pck_cnt": cnt}

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data),
                   out_shardings=(data, repl))


def make_infer_fn(model, mesh, flip_tta: bool = True,
                  decode: bool = True) -> Callable:
    """Build the compiled inference function: crops -> heatmaps -> decoded
    keypoints in source-image coordinates, all in one XLA program
    (SURVEY.md §7 "decode on device"). Flip-TTA and decode run in the
    model's native NHWC layout — no transpose copies.

    Returns fn(state, images, centers, scales) -> (preds (N,J,3),
    heatmaps NJHW) when decode, else heatmaps NJHW.
    """
    from stlpose_tpu.ops.decode import decode_heatmaps_nhwc
    from stlpose_tpu.ops.flip import average_flip_tta_nhwc

    def forward_hm(state, images):
        if flip_tta:
            n = images.shape[0]
            both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
            out = model.apply(state.variables(), both, train=False)
            return average_flip_tta_nhwc(out[:n], out[n:])
        return model.apply(state.variables(), images, train=False)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    if not decode:
        def infer_hm(state: PoseTrainState, images):
            return _nhwc_to_njhw(forward_hm(state, images))

        return jax.jit(infer_hm, in_shardings=(repl, data),
                       out_shardings=data)

    def infer(state: PoseTrainState, images, centers, scales):
        hm = forward_hm(state, images)
        preds, maxvals, _ = decode_heatmaps_nhwc(hm, centers, scales)
        return (jnp.concatenate([preds, maxvals[..., None]], axis=-1),
                _nhwc_to_njhw(hm))

    return jax.jit(infer,
                   in_shardings=(repl, data, data, data),
                   out_shardings=(data, data))


def make_eval_decode_step(model, mesh, flip_tta: bool = True) -> Callable:
    """One fused eval program: flip-TTA forward + loss + PCK + decoded
    keypoints — the evaluator's whole per-batch work in a single forward
    (the reference runs separate loss and decode passes,
    03_evaluate.py:131-155).

    Returns fn(state, batch) -> (preds (N, J, 3), metrics dict); ``batch``
    needs image/target/target_weight/center/scale.
    """
    from stlpose_tpu.ops.decode import decode_heatmaps_nhwc
    from stlpose_tpu.ops.flip import average_flip_tta_nhwc

    def step(state: PoseTrainState, batch):
        images = batch["image"]
        if flip_tta:
            n = images.shape[0]
            both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
            out = model.apply(state.variables(), both, train=False)
            hm = average_flip_tta_nhwc(out[:n], out[n:])
        else:
            hm = model.apply(state.variables(), images, train=False)
        pred_njhw = _nhwc_to_njhw(hm)
        loss = person_mse_loss(pred_njhw, batch["target"],
                               batch["target_weight"])
        hit, cnt = _pck_from_heatmaps(pred_njhw, batch["target"])
        preds, maxvals, _ = decode_heatmaps_nhwc(
            hm, batch["center"], batch["scale"])
        kpts = jnp.concatenate([preds, maxvals[..., None]], axis=-1)
        return kpts, {"loss": loss, "pck_hit": hit, "pck_cnt": cnt}

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data),
                   out_shardings=(data, repl))
