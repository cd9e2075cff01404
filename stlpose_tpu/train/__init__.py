"""Training subsystem: losses, optimizers/schedulers, train state, and the
pjit-compiled data-parallel train/eval steps."""

from stlpose_tpu.train.loss import (person_mse_loss, apply_perceptual_loss,
                                    load_perceptual_loss_dict)
from stlpose_tpu.train.state import PoseTrainState, create_train_state
from stlpose_tpu.train.optim import build_optimizer, PlateauScheduler, StepScheduler
