"""Orbax checkpoint bundle modes: full resume, weights-only, drop-head
transfer, listing, LR/scheduler metadata (reference contract:
lib/model_setup.py:162-252)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.config import default_experiment_args, get_hrnet_config
from stlpose_tpu.models import PoseHighResolutionNet
from stlpose_tpu.train import create_train_state
from stlpose_tpu.train.optim import (get_current_lr, set_current_lr,
                                     PlateauScheduler)
from stlpose_tpu.utils.checkpoint import (save_checkpoint, load_checkpoint,
                                          list_checkpoints)


@pytest.fixture(scope="module")
def state_and_exp(tmp_path_factory):
    exp_path = str(tmp_path_factory.mktemp("ckpt"))
    os.makedirs(os.path.join(exp_path, "models"), exist_ok=True)
    model = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
    exp = default_experiment_args()
    state, tx = create_train_state(model, exp, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3))
    return exp_path, model, exp, state, tx


class TestCheckpointModes:
    def test_full_resume_restores_everything(self, state_and_exp):
        exp_path, model, exp, state, tx = state_and_exp
        sched = PlateauScheduler(factor=0.5, patience=2)
        sched.best = 0.7
        sched.num_bad = 1
        state = state.replace(step=jnp.asarray(42, jnp.int32),
                              opt_state=set_current_lr(state.opt_state,
                                                       3e-4))
        save_checkpoint(state, exp_path, 7, scheduler=sched)

        model2 = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
        fresh, _ = create_train_state(model2, exp, jax.random.PRNGKey(9),
                                      (1, 64, 64, 3))
        sched2 = PlateauScheduler(factor=0.5, patience=2)
        restored, epoch = load_checkpoint(fresh, exp_path, 7,
                                          scheduler=sched2)
        assert epoch == 7
        assert int(restored.step) == 42
        assert get_current_lr(restored.opt_state) == pytest.approx(3e-4)
        assert sched2.best == 0.7 and sched2.num_bad == 1
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_only_model_keeps_fresh_optimizer(self, state_and_exp):
        exp_path, model, exp, state, tx = state_and_exp
        fresh, _ = create_train_state(model, exp, jax.random.PRNGKey(9),
                                      (1, 64, 64, 3))
        restored, epoch = load_checkpoint(fresh, exp_path, 7,
                                          only_model=True)
        assert epoch == 0
        assert int(restored.step) == 0                 # template's step kept
        assert get_current_lr(restored.opt_state) == pytest.approx(1e-3)

    def test_drop_head_reinitializes_final_layer(self, state_and_exp):
        exp_path, model, exp, state, tx = state_and_exp
        fresh, _ = create_train_state(model, exp, jax.random.PRNGKey(9),
                                      (1, 64, 64, 3))
        restored, _ = load_checkpoint(fresh, exp_path, 7, only_model=True,
                                      drop_head=True)
        # head equals the fresh template, trunk equals the checkpoint
        np.testing.assert_allclose(
            np.asarray(restored.params["final_layer"]["kernel"]),
            np.asarray(fresh.params["final_layer"]["kernel"]))
        assert not np.allclose(
            np.asarray(restored.params["stem1"]["conv"]["kernel"]),
            np.asarray(fresh.params["stem1"]["conv"]["kernel"]))

    def test_list_checkpoints(self, state_and_exp):
        exp_path, model, exp, state, tx = state_and_exp
        save_checkpoint(state, exp_path, 9, finished=True)
        names = list_checkpoints(exp_path)
        assert "7" in names and "final" in names
