"""
Person-detector training and evaluation engines.

Behavioral parity with the reference's detector engines (reference:
02_train_faster_rcnn.py, 03_evaluate_faster_rcnn.py): loss = summed
torchvision-style loss dict with optional perceptual weighting and a
non-finite guard, validation = COCO bbox AP over the val loader with a
plateau-on-AP (mode max) scheduler, detector_logs.json +
detector checkpoints under models/detector/.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from stlpose_tpu.config import CONFIG
from stlpose_tpu.data.loaders import get_detection_dataset
from stlpose_tpu.models.faster_rcnn import (FasterRCNN, FasterRCNNConfig,
                                            FASTER_RCNN_TINY,
                                            FASTER_RCNN_TORCHVISION_PARITY)
from stlpose_tpu.parallel import get_mesh, shard_batch
from stlpose_tpu.parallel.detector_steps import (make_detector_train_step,
                                                 make_detector_predict)
from stlpose_tpu.train import create_train_state, load_perceptual_loss_dict
from stlpose_tpu.train.optim import (build_scheduler, get_current_lr,
                                     set_current_lr)
from stlpose_tpu.eval.submission import compute_detection_ap
from stlpose_tpu.data.coco_api import coco_from_dataset
from stlpose_tpu.utils import (load_experiment_parameters,
                               create_detector_logs, print_)
from stlpose_tpu.utils.experiment import (load_detector_logs,
                                          update_detector_logs,
                                          save_evaluation_stats)
from stlpose_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

def _detector_dtype():
    """Compute dtype for detectors: f32 default, bf16 via
    STLPOSE_DTYPE=bfloat16 (same knob as the pose engines; ~2x detector
    inference on TPU — PROFILE_detector.md)."""
    import jax.numpy as jnp
    return jnp.bfloat16 if os.environ.get("STLPOSE_DTYPE") == "bfloat16" \
        else jnp.float32


def _efficientdet_factory(cfg_name):
    def make():
        from stlpose_tpu.models.efficientdet import (
            EfficientDet, EFFICIENTDET_D0, EFFICIENTDET_D3,
            EFFICIENTDET_TINY)
        cfg = {"d0": EFFICIENTDET_D0, "d3": EFFICIENTDET_D3,
               "tiny": EFFICIENTDET_TINY}[cfg_name]
        return EfficientDet(cfg, dtype=_detector_dtype()), cfg
    return make


DETECTOR_CONFIGS = {
    # the reference's detector vocabulary: faster_rcnn default,
    # efficientdet d0/d3 via detector_type (lib/model_setup.py:50-95)
    "faster_rcnn": lambda: (FasterRCNN(FasterRCNNConfig(),
                                       dtype=_detector_dtype()),
                            FasterRCNNConfig()),
    "faster_rcnn_tiny": lambda: (FasterRCNN(FASTER_RCNN_TINY,
                                            dtype=_detector_dtype()),
                                 FASTER_RCNN_TINY),
    # torchvision-default budgets (pre/post-NMS 1000/1000 test, 100 dets/
    # img) for AP-parity evaluation; the bare "faster_rcnn" keeps the
    # tighter serving budgets (see models/faster_rcnn.py preset docstring)
    "faster_rcnn_torchvision_parity": lambda: (
        FasterRCNN(FASTER_RCNN_TORCHVISION_PARITY,
                   dtype=_detector_dtype()),
        FASTER_RCNN_TORCHVISION_PARITY),
    "efficientdet": _efficientdet_factory("d0"),
    "efficientdet_d0": _efficientdet_factory("d0"),
    "efficientdet_d3": _efficientdet_factory("d3"),
    "efficientdet_tiny": _efficientdet_factory("tiny"),
}


def build_detector(exp_data: dict, config_name: str | None = None):
    name = config_name or exp_data["model"].get("detector_name",
                                                "faster_rcnn")
    det_type = exp_data["model"].get("detector_type", "")
    if name == "efficientdet" and det_type in ("d0", "d3"):
        name = f"efficientdet_{det_type}"
    if name not in DETECTOR_CONFIGS:
        raise ValueError(f"Detector '{name}' not supported; "
                         f"available: {list(DETECTOR_CONFIGS)}")
    return DETECTOR_CONFIGS[name]()


class _DetectorModelShim:
    """Adapts FasterRCNN.init to the create_train_state model protocol."""

    def __init__(self, detector):
        self.detector = detector

    def init(self, rng, x, train=False):
        return self.detector.init(rng, batch_size=1)


def live_template_detector(exp_data: dict, detector_config=None):
    """The same factory as ``build_detector`` — same ``(detector,
    config)`` return — with the trunk-flavor env stripped: checkpoints
    hold LIVE-BN variables, so restore templates must come from a
    live-BN facade even when serving wants a folded/quantized trunk
    (STLPOSE_FRCNN_TRUNK_QUANT)."""
    old = os.environ.pop("STLPOSE_FRCNN_TRUNK_QUANT", None)
    try:
        return build_detector(exp_data, detector_config)
    finally:
        if old is not None:
            os.environ["STLPOSE_FRCNN_TRUNK_QUANT"] = old


def apply_trunk_flavor(detector, det_cfg, state, calib_batch_fn=None):
    """Transform a live-BN detector state for ``detector.trunk_quant``
    ("folded" folds the ResNet BNs; "int8"/"int8u" additionally bake the
    PTQ bottlenecks, calibrating on ``calib_batch_fn()`` — real images in
    the exact predict convention). No-op for the live flavor.
    Calibration runs in the detector's SERVING dtype (bf16 engines
    calibrate a bf16 trunk), matching the serving exports."""
    tq = getattr(detector, "trunk_quant", "none")
    if tq == "none":
        return state
    from stlpose_tpu.models.quantize import apply_trunk_flavor_variables
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    calib = ([np.asarray(calib_batch_fn())]
             if calib_batch_fn is not None and tq in ("int8", "int8u")
             else None)
    variables = apply_trunk_flavor_variables(
        det_cfg, variables, tq, calib_batches=calib,
        dtype=getattr(detector.module, "dtype", jnp.float32))
    return state.replace(params=variables["params"],
                         batch_stats=variables.get("batch_stats", {}))


class DetectorTrainer:
    """Engine behind 02_train_faster_rcnn.py."""

    def __init__(self, exp_path: str, checkpoint=None,
                 resume_training: bool = False, dataset_name=None,
                 data_path=None, num_workers=None,
                 use_perceptual_loss: bool = False,
                 detector_config: str | None = None):
        self.exp_path = exp_path
        self.exp_data = load_experiment_parameters(exp_path)
        if dataset_name:
            self.exp_data["dataset"]["dataset_name"] = dataset_name
        self.checkpoint = checkpoint
        self.resume_training = resume_training
        self.data_path = data_path
        self.num_workers = num_workers
        self.use_perceptual_loss = use_perceptual_loss
        self.detector_config = detector_config
        self.cur_epoch = 0

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
        self.detector, self.det_cfg = build_detector(self.exp_data,
                                                     self.detector_config)
        exp = dict(self.exp_data)
        exp["dataset"] = {**exp["dataset"],
                          "image_size": self.det_cfg.image_size}
        self.train_pipe = get_detection_dataset(
            exp, "train", shuffle=exp["dataset"].get("shuffle_train", False),
            num_workers=self.num_workers, pad_multiple=n_dev,
            data_path=self.data_path, perceptual_loss_dict=ploss)
        self.valid_pipe = get_detection_dataset(
            exp, "valid", num_workers=self.num_workers,
            pad_multiple=n_dev, data_path=self.data_path)

    def setup_model(self, pretrained: str | None = None):
        shim = _DetectorModelShim(self.detector)
        variables = load_detector_pretrained(self.detector, pretrained)
        self.state, self.tx = create_train_state(
            shim, self.exp_data, jax.random.PRNGKey(CONFIG["random_seed"]),
            (1,), variables=variables)
        self.scheduler = build_scheduler(self.exp_data)
        if self.checkpoint is not None:
            self.state, epoch = load_checkpoint(
                self.state, self.exp_path, self.checkpoint,
                scheduler=self.scheduler if self.resume_training else None,
                detector=True, only_model=not self.resume_training)
            if self.resume_training:
                self.cur_epoch = epoch

        perceptual_cfg = None
        if (self.exp_data["dataset"]["dataset_name"] == "styled_coco"
                and (self.use_perceptual_loss
                     or self.exp_data["training"].get("perceptual_loss"))):
            cfg = dict(self.exp_data)
            cfg["training"] = {**cfg["training"], "perceptual_loss": True}
            perceptual_cfg = cfg
        self.train_step = make_detector_train_step(
            self.detector, self.tx, self.mesh, perceptual_cfg=perceptual_cfg)
        self.predict = make_detector_predict(self.detector, self.mesh)
        self._rng = jax.random.PRNGKey(CONFIG["random_seed"] + 1)

    # ------------------------------------------------------------- epochs
    def train_epoch(self, epoch: int) -> float:
        from stlpose_tpu.parallel import MetricAccumulator

        acc = MetricAccumulator(finite_only=("loss",))
        for batch in self.train_pipe:
            self._rng, step_rng = jax.random.split(self._rng)
            dev = shard_batch(self.mesh, {
                "image": batch["image"], "boxes": batch["boxes"],
                "labels": batch["labels"], "box_mask": batch["box_mask"],
                "perceptual_loss": batch["perceptual_loss"]})
            self.state, metrics = self.train_step(self.state, dev, step_rng)
            acc.update(metrics)                 # device-side; no host sync
        stats = acc.fetch()                     # ONE fetch per train epoch
        # nan when no batch produced a finite loss (reference returns nan
        # after skipping every batch, 02_train_faster_rcnn.py:221-223)
        loss = stats["loss_mean"] if stats.get("loss_n") else float("nan")
        print_(f"Detector train loss: {loss}")
        return loss

    def validation_epoch(self, epoch: int, limit: int | None = None) -> float:
        """COCO bbox AP over the val pipeline (the reference's
        CocoEvaluator-based validation, 02_train_faster_rcnn.py:241-280)."""
        ap = evaluate_detector(self.detector, self.state, self.predict,
                               self.valid_pipe, self.mesh, limit=limit)
        print_(f"Detector valid AP: {ap[0]:.4f}")
        return float(ap[0])

    def training_loop(self):
        exp = self.exp_data
        num_epochs = exp["training"]["num_epochs"]
        save_freq = exp["training"]["save_frequency"]
        if self.checkpoint is None or not self.resume_training:
            self.logs = create_detector_logs(self.exp_path)
        else:
            self.logs = load_detector_logs(self.exp_path)

        for epoch in range(self.cur_epoch, num_epochs):
            valid_ap = self.validation_epoch(epoch)
            train_loss = self.train_epoch(epoch)
            if self.scheduler is not None:
                lr = get_current_lr(self.state.opt_state)
                new_lr = self.scheduler.step(valid_ap, lr)  # mode max on AP
                if new_lr != lr:
                    self.state = self.state.replace(
                        opt_state=set_current_lr(self.state.opt_state,
                                                 new_lr))
            update_detector_logs(self.exp_path, self.logs, train_loss,
                                 valid_ap)
            if epoch % save_freq == 0:
                save_checkpoint(self.state, self.exp_path, epoch,
                                scheduler=self.scheduler, detector=True)
        save_checkpoint(self.state, self.exp_path, num_epochs,
                        scheduler=self.scheduler, detector=True,
                        finished=True)


def load_detector_pretrained(detector, pth_path: str | None):
    """Convert a pretrained detector .pth into detector variables, by
    family: torchvision fasterrcnn state_dicts (reference seeds from
    torchvision's COCO-pretrained model, lib/model_setup.py:70-73) or
    zylo117-layout efficientdet-d{0,3} state_dicts (reference:
    models/EfficientDet.py:127-133). Returns None when no path given."""
    import os
    if not pth_path or not os.path.isfile(pth_path):
        return None
    from stlpose_tpu.models.convert import load_torch_statedict
    from stlpose_tpu.models.efficientdet import EfficientDet
    state = load_torch_statedict(pth_path)
    if isinstance(detector, EfficientDet):
        from stlpose_tpu.models.convert_detector import (
            torch_efficientdet_to_flax)
        return torch_efficientdet_to_flax(
            state, num_classes=detector.config.num_classes)
    from stlpose_tpu.models.convert_detector import torch_fasterrcnn_to_flax
    return torch_fasterrcnn_to_flax(
        state, roi_channels=detector.config.fpn_channels)


def evaluate_detector(detector, state, predict, pipe, mesh,
                      limit: int | None = None, score_thr: float = 0.0):
    """Run detection over a pipeline and compute COCO bbox AP against the
    pipeline's own GT (built in memory, the reference's
    get_coco_api_from_dataset path)."""
    gt_samples, results = [], []
    for bi, batch in enumerate(pipe):
        if limit is not None and bi >= limit:
            break
        dets = predict(state, shard_batch(mesh, batch["image"]))
        dets = {k: np.asarray(v) for k, v in dets.items()}
        n = batch["n_valid"]
        for i in range(n):
            img_id = int(batch["image_id"][i])
            scale = float(batch["scale"][i])
            m = batch["box_mask"][i].astype(bool)
            gt_samples.append({
                "image_id": img_id,
                "boxes": batch["boxes"][i][m] / scale,
                "labels": batch["labels"][i][m].tolist(),
            })
            valid = dets["valid"][i] & (dets["scores"][i] > score_thr)
            for j in np.nonzero(valid)[0]:
                x1, y1, x2, y2 = dets["boxes"][i, j] / scale
                results.append({
                    "image_id": img_id,
                    "category_id": int(dets["labels"][i, j]),
                    "bbox": [float(x1), float(y1), float(x2 - x1),
                             float(y2 - y1)],
                    "score": float(dets["scores"][i, j]),
                })
    if not results:
        return np.full(12, -1.0)
    gt = coco_from_dataset(gt_samples,
                           categories=[{"id": 1, "name": "person"}])
    return compute_detection_ap(results, gt)


class DetectorEvaluator:
    """Engine behind 03_evaluate_faster_rcnn.py."""

    def __init__(self, exp_path: str, checkpoint=None, dataset_name=None,
                 data_path=None, num_workers=None,
                 detector_config: str | None = None):
        self.exp_path = exp_path
        self.exp_data = load_experiment_parameters(exp_path)
        if dataset_name:
            self.exp_data["dataset"]["dataset_name"] = dataset_name
        self.checkpoint = checkpoint
        self.data_path = data_path
        self.num_workers = num_workers
        self.detector_config = detector_config

    def setup(self):
        self.mesh = get_mesh()
        self.detector, self.det_cfg = build_detector(self.exp_data,
                                                     self.detector_config)
        exp = dict(self.exp_data)
        exp["dataset"] = {**exp["dataset"],
                          "image_size": self.det_cfg.image_size}
        self.pipe = get_detection_dataset(
            exp, "valid", num_workers=self.num_workers,
            pad_multiple=self.mesh.devices.size, data_path=self.data_path)
        # trunk serving flavors (STLPOSE_FRCNN_TRUNK_QUANT, resolved by the
        # FasterRCNN facade at construction): restore through a live-BN
        # template, then transform for the serving graph; int8/int8u
        # calibrate on the first validation batch. This is the AP-parity
        # runbook's trunk-quant leg (RUNBOOK_AP_PARITY.md §3c).
        tq = getattr(self.detector, "trunk_quant", "none")
        shim = _DetectorModelShim(
            live_template_detector(self.exp_data, self.detector_config)[0]
            if tq != "none" else self.detector)
        self.state, _ = create_train_state(
            shim, self.exp_data, jax.random.PRNGKey(CONFIG["random_seed"]),
            (1,))
        if self.checkpoint is not None:
            self.state, _ = load_checkpoint(self.state, self.exp_path,
                                            self.checkpoint, detector=True,
                                            only_model=True)
        self.state = apply_trunk_flavor(
            self.detector, self.det_cfg, self.state,
            calib_batch_fn=lambda: next(iter(self.pipe))["image"])
        self.predict = make_detector_predict(self.detector, self.mesh)

    def evaluate(self, save_stats: bool = True):
        stats = evaluate_detector(self.detector, self.state, self.predict,
                                  self.pipe, self.mesh)
        if save_stats:
            save_evaluation_stats(
                self.exp_path, stats, detector=True,
                dataset_name=self.exp_data["dataset"]["dataset_name"],
                checkpoint=str(self.checkpoint),
                alpha=self.exp_data["dataset"].get("alpha"),
                styles=self.exp_data["dataset"].get("styles"))
        return stats
