"""
Optimizers and LR schedulers.

Equivalent of the reference's ``setup_optimizer``
(reference: lib/model_setup.py:109-159): Adam(lr) or SGD(momentum, nesterov,
weight_decay 5e-4), with a ReduceLROnPlateau(mode="max", factor, patience,
min_lr 1e-8) or StepLR(gamma, step_size) schedule.

TPU-native shape: the optimizer is an optax chain built once with
``inject_hyperparams`` so the learning rate is a *runtime scalar* inside the
compiled train step — the host-side scheduler objects below mutate it between
epochs without triggering recompilation.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax


def build_optimizer(exp_data: dict) -> optax.GradientTransformation:
    """Optax optimizer matching the reference's choices; LR is injected."""
    t = exp_data["training"]
    lr = float(t["learning_rate"])
    name = t.get("optimizer", "adam")
    if name == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr)

    def sgd_wd(learning_rate, momentum, nesterov):
        return optax.chain(
            optax.add_decayed_weights(5e-4),
            optax.sgd(learning_rate=learning_rate, momentum=momentum,
                      nesterov=nesterov),
        )

    return optax.inject_hyperparams(sgd_wd)(
        learning_rate=lr, momentum=float(t.get("momentum", 0.9)),
        nesterov=bool(t.get("nesterov", False)))


def get_current_lr(opt_state) -> float:
    """Read the injected learning rate out of an optimizer state."""
    return float(opt_state.hyperparams["learning_rate"])


def set_current_lr(opt_state, lr: float):
    """Write a new learning rate into an optimizer state (host-side; the
    value is a 0-d array so no recompilation happens)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau(mode="max") with torch semantics
    (factor, patience, min_lr; reference: lib/model_setup.py:141-149)."""
    factor: float
    patience: int
    min_lr: float = 1e-8
    mode: str = "max"
    best: float = None
    num_bad: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed the epoch validation metric; returns the (possibly reduced)
        learning rate."""
        better = (self.best is None or
                  (metric > self.best if self.mode == "max"
                   else metric < self.best))
        if better:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.num_bad = 0
        return lr

    def state_dict(self):
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d):
        self.best = d.get("best")
        self.num_bad = int(d.get("num_bad", 0))


@dataclasses.dataclass
class StepScheduler:
    """StepLR(gamma=lr_factor, step_size=patience)
    (reference: lib/model_setup.py:150-155)."""
    gamma: float
    step_size: int
    epoch: int = 0

    def step(self, metric: float, lr: float) -> float:
        self.epoch += 1
        if self.epoch % self.step_size == 0:
            lr = lr * self.gamma
        return lr

    def state_dict(self):
        return {"epoch": self.epoch}

    def load_state_dict(self, d):
        self.epoch = int(d.get("epoch", 0))


def build_scheduler(exp_data: dict):
    """Scheduler factory mirroring the reference's plateau/step/None."""
    t = exp_data["training"]
    kind = t.get("scheduler", "plateau")
    if kind == "plateau":
        return PlateauScheduler(factor=float(t["learning_rate_factor"]),
                                patience=int(t["patience"]))
    if kind == "step":
        return StepScheduler(gamma=float(t["learning_rate_factor"]),
                             step_size=int(t["patience"]))
    return None
