"""Data-parallel train/eval/infer steps on the 8-device virtual CPU mesh
(SURVEY.md §4: this is how multi-chip is tested without a pod)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.config import get_hrnet_config
from stlpose_tpu.models import PoseHighResolutionNet
from stlpose_tpu.parallel import (get_mesh, shard_batch, make_train_step,
                                  make_eval_step, make_infer_fn)
from stlpose_tpu.train import create_train_state
from stlpose_tpu.train.optim import get_current_lr, set_current_lr
from stlpose_tpu.config import default_experiment_args


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = get_mesh(8)
    model = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
    exp = default_experiment_args()
    state, tx = create_train_state(model, exp, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3))
    return mesh, model, exp, state, tx


def _batch(rng, n, hw=(64, 64), heat=(16, 16)):
    return {
        "image": rng.randn(n, hw[0], hw[1], 3).astype(np.float32),
        "target": rng.rand(n, 17, heat[0], heat[1]).astype(np.float32),
        "target_weight": np.ones((n, 17), np.float32),
        "perceptual_loss": np.zeros((n,), np.float32),
    }


class TestTrainStep:
    def test_loss_decreases_over_steps(self, setup, rng):
        mesh, model, exp, state, tx = setup
        step = make_train_step(model, tx, mesh, donate=False)
        batch = shard_batch(mesh, _batch(rng, 16))
        losses = []
        for _ in range(4):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 4

    def test_batch_is_sharded_over_mesh(self, setup, rng):
        mesh, *_ = setup
        batch = shard_batch(mesh, _batch(rng, 16))
        assert len(batch["image"].sharding.device_set) == 8

    def test_lr_injection_no_recompile(self, setup, rng):
        mesh, model, exp, state, tx = setup
        step = make_train_step(model, tx, mesh, donate=False)
        batch = shard_batch(mesh, _batch(rng, 8))
        state, _ = step(state, batch)
        assert get_current_lr(state.opt_state) == pytest.approx(1e-3)
        state = state.replace(
            opt_state=set_current_lr(state.opt_state, 1e-4))
        state, _ = step(state, batch)   # same compiled fn, new lr
        assert get_current_lr(state.opt_state) == pytest.approx(1e-4)


class TestEvalInfer:
    def test_eval_step_shapes(self, setup, rng):
        mesh, model, exp, state, tx = setup
        ev = make_eval_step(model, mesh, flip_tta=True)
        batch = shard_batch(mesh, _batch(rng, 8))
        pred, metrics = ev(state, batch)
        assert pred.shape == (8, 17, 16, 16)
        assert np.isfinite(float(metrics["loss"]))

    def test_infer_decodes_on_device(self, setup, rng):
        mesh, model, exp, state, tx = setup
        infer = make_infer_fn(model, mesh, flip_tta=True)
        imgs = rng.randn(8, 64, 64, 3).astype(np.float32)
        centers = rng.uniform(100, 200, (8, 2)).astype(np.float32)
        scales = np.ones((8, 2), np.float32)
        preds, hm = infer(state, jnp.asarray(imgs), jnp.asarray(centers),
                          jnp.asarray(scales))
        assert preds.shape == (8, 17, 3)
        assert hm.shape == (8, 17, 16, 16)
        assert np.isfinite(np.asarray(preds)).all()
