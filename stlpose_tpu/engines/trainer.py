"""
HRNet fine-tuning engine.

Behavioral parity with the reference trainer (reference: 02_train.py):
validation runs BEFORE training every epoch on 1/5 of the val loader,
plateau/step scheduling on the validation loss, training_logs.json +
loss/acc plots + TensorBoard scalars each epoch, checkpoints every
``save_frequency`` epochs and at the end.

TPU-native loop: one compiled pjit train step (forward+backward+update+PCK
fused, batch sharded over the mesh, state donated), LR injected as a runtime
scalar so scheduler updates don't recompile, metrics reduced on device and
fetched once per epoch-window instead of per batch.
"""

from __future__ import annotations

import os

import jax

from stlpose_tpu.config import CONFIG, get_hrnet_config
from stlpose_tpu.data.loaders import load_dataset
from stlpose_tpu.models import PoseHighResolutionNet
from stlpose_tpu.parallel import (get_mesh, shard_batch, make_train_step,
                                  make_eval_step, MetricAccumulator)
from stlpose_tpu.train import create_train_state, load_perceptual_loss_dict
from stlpose_tpu.train.optim import (build_scheduler, get_current_lr,
                                     set_current_lr, PlateauScheduler,
                                     StepScheduler)
from stlpose_tpu.utils import (load_experiment_parameters, create_train_logs,
                               load_train_logs, update_train_logs, Logger,
                               print_)
from stlpose_tpu.utils.checkpoint import (save_checkpoint, load_checkpoint,
                                          load_pretrained_variables)


class PoseTrainer:
    """Engine behind 02_train.py."""

    def __init__(self, exp_path: str, checkpoint=None,
                 resume_training: bool = False, dataset_name=None,
                 data_path=None, num_workers=None, use_perceptual_loss=False,
                 make_plots: bool = True):
        self.exp_path = exp_path
        self.exp_data = load_experiment_parameters(exp_path)
        if dataset_name:
            self.exp_data["dataset"]["dataset_name"] = dataset_name
        self.checkpoint = checkpoint
        self.resume_training = resume_training
        self.data_path = data_path
        self.num_workers = num_workers
        self.use_perceptual_loss = use_perceptual_loss
        self.make_plots = make_plots
        self.cur_epoch = 0
        self.iterations = 0
        self.writer = self._make_writer()

    def _make_writer(self):
        try:
            from tensorboardX import SummaryWriter
            return SummaryWriter(os.path.join(self.exp_path, "tboard_logs"))
        except Exception:
            return None

    # ------------------------------------------------------------- setup
    def load_dataset(self):
        ploss = None
        try:
            ploss = load_perceptual_loss_dict(
                self.exp_data, CONFIG["paths"]["dict_path"],
                self.use_perceptual_loss)
        except FileNotFoundError as e:
            print_(str(e), type="warning")
        self.mesh = get_mesh()
        n_dev = self.mesh.devices.size
        self.train_pipe, self.valid_pipe = load_dataset(
            self.exp_data,
            shuffle_train=self.exp_data["dataset"].get("shuffle_train", False),
            perceptual_loss_dict=ploss, data_path=self.data_path,
            num_workers=self.num_workers, pad_multiple=n_dev)

    def setup_model(self, config_name: str = "w32_256x192",
                    pretrained: str | None = "default"):
        model = PoseHighResolutionNet(config=get_hrnet_config(config_name),
                              dtype=_model_dtype())
        self.model = model
        variables = None
        if pretrained == "default":
            pretrained = os.path.join(CONFIG["paths"]["pretrained_path"],
                                      "HRnet", "pose_hrnet_w32_256x192.pth")
        if pretrained:
            variables = load_pretrained_variables(model, pretrained)
            if variables is not None:
                print_(f"Loaded pretrained weights from {pretrained}")
        hw = get_hrnet_config(config_name).image_size
        self.state, self.tx = create_train_state(
            model, self.exp_data, jax.random.PRNGKey(CONFIG["random_seed"]),
            (1, hw[1], hw[0], 3), variables=variables)
        self.scheduler = build_scheduler(self.exp_data)

        if self.checkpoint is not None:
            self.state, epoch = load_checkpoint(
                self.state, self.exp_path, self.checkpoint,
                scheduler=self.scheduler if self.resume_training else None,
                only_model=not self.resume_training)
            if self.resume_training:
                self.cur_epoch = epoch
                print_(f"Resuming training from epoch {epoch}")

        perceptual_cfg = None
        if (self.exp_data["dataset"]["dataset_name"] == "styled_coco"
                and (self.use_perceptual_loss
                     or self.exp_data["training"].get("perceptual_loss"))):
            cfg = dict(self.exp_data)
            cfg["training"] = {**cfg["training"], "perceptual_loss": True}
            perceptual_cfg = cfg
        self.train_step = make_train_step(self.model, self.tx, self.mesh,
                                          perceptual_cfg=perceptual_cfg)
        self.eval_step = make_eval_step(self.model, self.mesh)

    # ------------------------------------------------------------ epochs
    def _run_valid_epoch(self, epoch: int) -> tuple[float, float]:
        acc = MetricAccumulator()
        limit = max(1, len(self.valid_pipe) // 5)   # 1/5 of val loader
        for i, batch in enumerate(self.valid_pipe):
            if i >= limit:
                break
            dev = shard_batch(self.mesh, self._step_view(batch))
            _, metrics = self.eval_step(self.state, dev)
            acc.update(metrics)                 # device-side; no host sync
        stats = acc.fetch()                     # ONE fetch per valid epoch
        loss = stats.get("loss_mean", 0.0)
        pck = (stats.get("pck_hit_sum", 0.0) / stats["pck_cnt_sum"]
               if stats.get("pck_cnt_sum") else 0.0)
        print_(f"Valid Loss: {loss}")
        print_(f"Valid Accuracy: {pck}")
        return loss, pck

    def _run_train_epoch(self, epoch: int) -> tuple[float, float]:
        from stlpose_tpu.utils.profiling import StepTimer, save_timing

        acc = MetricAccumulator()
        timer = StepTimer()
        log_freq = self.exp_data["training"].get("log_frequency", 100)
        prev = {"n": 0.0, "loss_sum": 0.0}       # last fetched window
        for batch in self.train_pipe:
            dev = shard_batch(self.mesh, self._step_view(batch))
            self.state, metrics = self.train_step(self.state, dev)
            timer.tick(batch["image"].shape[0])
            acc.update(metrics)                 # device-side; no host sync
            self.iterations += 1
            if self.writer is not None and self.iterations % log_freq == 0:
                # one fetch per logging window: windowed mean from the
                # accumulator delta
                snap = acc.fetch()
                dn = snap["n"] - prev["n"]
                if dn > 0:
                    self.writer.add_scalar(
                        "pose_train/loss",
                        (snap["loss_sum"] - prev["loss_sum"]) / dn,
                        global_step=self.iterations)
                prev = snap
        stats = acc.fetch()                     # ONE fetch per train epoch
        loss = stats.get("loss_mean", 0.0)
        pck = (stats.get("pck_hit_sum", 0.0) / stats["pck_cnt_sum"]
               if stats.get("pck_cnt_sum") else 0.0)
        save_timing(self.exp_path, "train_epoch", timer.stats())
        print_(f"Train Loss: {loss}  "
               f"({timer.stats()['examples_per_sec']} ex/s)")
        print_(f"Train Accuracy: {pck}")
        return loss, pck

    @staticmethod
    def _step_view(batch):
        return {"image": batch["image"], "target": batch["target"],
                "target_weight": batch["target_weight"],
                "perceptual_loss": batch["perceptual_loss"]}

    # -------------------------------------------------------------- loop
    def training_loop(self):
        exp = self.exp_data
        num_epochs = exp["training"]["num_epochs"]
        save_freq = exp["training"]["save_frequency"]

        if self.checkpoint is None or not self.resume_training:
            self.logs = create_train_logs(self.exp_path)
        else:
            self.logs = load_train_logs(self.exp_path)

        profile_dir = os.environ.get("STLPOSE_PROFILE")
        for epoch in range(self.cur_epoch, num_epochs):
            valid_loss, valid_acc = self._run_valid_epoch(epoch)
            if profile_dir and epoch == self.cur_epoch:
                # capture a jax.profiler trace of the first train epoch
                from stlpose_tpu.utils.profiling import trace
                with trace(profile_dir):
                    train_loss, train_acc = self._run_train_epoch(epoch)
            else:
                train_loss, train_acc = self._run_train_epoch(epoch)

            if self.scheduler is not None:
                lr = get_current_lr(self.state.opt_state)
                new_lr = self.scheduler.step(valid_loss, lr)
                if new_lr != lr:
                    print_(f"LR {lr} -> {new_lr}")
                    self.state = self.state.replace(
                        opt_state=set_current_lr(self.state.opt_state, new_lr))

            update_train_logs(self.exp_path, self.logs, self.iterations,
                              train_loss=train_loss, valid_loss=valid_loss,
                              train_acc=train_acc, valid_acc=valid_acc,
                              make_plots=self.make_plots)
            if epoch % save_freq == 0:
                print_("Saving model checkpoint")
                save_checkpoint(self.state, self.exp_path, epoch,
                                scheduler=self.scheduler)
            if self.writer is not None:
                self.writer.add_scalars("pose_results/COMB_loss", {
                    "train_loss": train_loss, "eval_loss": valid_loss},
                    epoch + 1)
                self.writer.add_scalars("pose_results/COMB_acc", {
                    "train_acc": train_acc, "eval_acc": valid_acc},
                    epoch + 1)

        print_("Finished training procedure")
        save_checkpoint(self.state, self.exp_path, num_epochs,
                        scheduler=self.scheduler, finished=True)


def _model_dtype():
    """Compute dtype for the pose model: f32 default, bf16 via
    STLPOSE_DTYPE=bfloat16 (BN statistics and the loss stay f32)."""
    import os
    import jax.numpy as jnp
    return jnp.bfloat16 if os.environ.get("STLPOSE_DTYPE") == "bfloat16" \
        else jnp.float32
