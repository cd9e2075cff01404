"""
HRNet COCO evaluation engine.

Behavioral parity with the reference evaluator (reference: 03_evaluate.py):
flip-TTA forward, loss + PCK per batch, decode to image coordinates,
accumulate (preds, boxes, image ids), periodic + final submission-file write
with rescoring + OKS-NMS, COCO keypoint AP restricted to evaluated images,
stats JSON keyed by checkpoint.

TPU-native loop: flip-TTA runs as a doubled batch in ONE forward, decode
(argmax + sub-pixel + inverse affine) happens on device inside the same
compiled program, and only final (N, 17, 3) keypoints come back to the host.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from stlpose_tpu.config import CONFIG, get_hrnet_config
from stlpose_tpu.data.loaders import load_dataset
from stlpose_tpu.eval.submission import generate_submission, compute_precision
from stlpose_tpu.models import PoseHighResolutionNet
from stlpose_tpu.parallel import get_mesh, shard_batch
from stlpose_tpu.train import create_train_state
from stlpose_tpu.utils import (load_experiment_parameters, print_,
                               save_evaluation_stats, reset_predictions_file)
from stlpose_tpu.utils.checkpoint import (load_checkpoint,
                                          load_pretrained_variables)


def records_to_coco_gt(records):
    """Build an in-memory COCO keypoint GT from pose records (for datasets
    without an annotation file in COCO layout, e.g. ClassArch)."""
    from stlpose_tpu.data.coco_api import COCO

    images, anns = [], []
    seen = set()
    for i, rec in enumerate(records):
        if rec.image_id not in seen:
            seen.add(rec.image_id)
            images.append({"id": int(rec.image_id), "height": 10000,
                           "width": 10000})
        kp = np.concatenate(
            [rec.joints,
             np.where(rec.joints_vis[:, None] > 0, 2.0, 0.0)], axis=1)
        # box from the crop geometry (center/scale in pixel-std units)
        w = rec.scale[0] * 200.0
        h = rec.scale[1] * 200.0
        x, y = rec.center[0] - w / 2, rec.center[1] - h / 2
        anns.append({"id": i + 1, "image_id": int(rec.image_id),
                     "category_id": 1,
                     "keypoints": kp.reshape(-1).tolist(),
                     "num_keypoints": int((rec.joints_vis > 0).sum()),
                     "bbox": [float(x), float(y), float(w), float(h)],
                     "area": float(w * h), "iscrowd": 0})
    return COCO({"images": images, "annotations": anns,
                 "categories": [{"id": 1, "name": "person"}]})


class PoseEvaluator:
    """Engine behind 03_evaluate.py."""

    def __init__(self, exp_path: str, checkpoint=None, dataset_name=None,
                 data_path=None, num_workers=None, flip: bool = True,
                 save_results: bool = True, save_visualizations: bool = False,
                 max_visualizations: int = 16):
        self.exp_path = exp_path
        self.exp_data = load_experiment_parameters(exp_path)
        if dataset_name:
            self.exp_data["dataset"]["dataset_name"] = dataset_name
        self.checkpoint = checkpoint
        self.data_path = data_path
        self.num_workers = num_workers
        self.flip = flip
        self.save_results = save_results
        self.save_visualizations = save_visualizations
        self.max_visualizations = max_visualizations
        self._n_vis = 0
        self.preds_file = os.path.join(exp_path,
                                       CONFIG["paths"]["submission"])

    def setup_model_dataset(self, config_name: str = "w32_256x192",
                            pretrained: str | None = "default"):
        self.mesh = get_mesh()
        n_dev = self.mesh.devices.size
        _, self.valid_pipe = load_dataset(
            self.exp_data, train=False, data_path=self.data_path,
            num_workers=self.num_workers, pad_multiple=n_dev)
        model = PoseHighResolutionNet(config=get_hrnet_config(config_name),
                              dtype=_model_dtype())
        self.model = model
        variables = None
        if pretrained == "default":
            pretrained = os.path.join(CONFIG["paths"]["pretrained_path"],
                                      "HRnet", "pose_hrnet_w32_256x192.pth")
        if pretrained:
            variables = load_pretrained_variables(model, pretrained)
        hw = get_hrnet_config(config_name).image_size
        self.state, _ = create_train_state(
            model, self.exp_data, jax.random.PRNGKey(CONFIG["random_seed"]),
            (1, hw[1], hw[0], 3), variables=variables)
        if self.checkpoint is not None:
            self.state, _ = load_checkpoint(self.state, self.exp_path,
                                            self.checkpoint, only_model=True)
        from stlpose_tpu.parallel.steps import make_eval_decode_step
        self.eval_decode = make_eval_decode_step(self.model, self.mesh,
                                                 flip_tta=self.flip)

    def evaluate_model(self, labels_file: str | None = None,
                       write_every: int = 2000):
        """Full evaluation pass; returns the 10-stat keypoint AP vector."""
        exp = self.exp_data
        data_path = self.data_path or CONFIG["paths"]["data_path"]
        if labels_file is None:
            if exp["dataset"]["dataset_name"] in ("coco", "styled_coco"):
                labels_file = os.path.join(data_path, "annotations",
                                           "person_keypoints_val.json")
            else:
                # arch_data / combined: fit the GT COCO object in memory
                # from the eval records (the reference's
                # get_coco_api_from_dataset path)
                labels_file = records_to_coco_gt(self.valid_pipe.records)
        reset_predictions_file(self.exp_path)

        from stlpose_tpu.parallel import MetricAccumulator
        acc = MetricAccumulator()
        all_preds, all_boxes, image_ids = [], [], []
        since_write = 0

        def consume(preds_dev, batch):
            """Host-side accumulation of one batch's decoded keypoints.
            Runs AFTER the next batch is already enqueued, so this D2H
            fetch overlaps the next forward (1-deep pipelining)."""
            nonlocal all_preds, all_boxes, image_ids, since_write
            n = batch["n_valid"]
            preds = np.asarray(preds_dev)[:n]
            if self.save_visualizations and self._n_vis < \
                    self.max_visualizations:
                self._dump_visualizations(batch, preds)
            center, scale = batch["center"][:n], batch["scale"][:n]
            area = np.prod(scale * 200.0, axis=1)
            boxes = np.concatenate(
                [center, scale, area[:, None],
                 batch["score"][:n, None]], axis=1)
            all_preds.append(preds)
            all_boxes.append(boxes)
            image_ids.extend(batch["image_id"][:n].tolist())
            since_write += n
            if since_write >= write_every:
                self._flush(all_preds, all_boxes, image_ids)
                all_preds, all_boxes, image_ids = [], [], []
                since_write = 0

        pending = None
        for batch in self.valid_pipe:
            dev = shard_batch(self.mesh, {
                "image": batch["image"], "target": batch["target"],
                "target_weight": batch["target_weight"],
                "center": jnp.asarray(batch["center"]),
                "scale": jnp.asarray(batch["scale"])})
            # ONE fused program: flip-TTA forward + loss + PCK + decode
            preds, metrics = self.eval_decode(self.state, dev)
            acc.update(metrics)                 # device-side; no host sync
            if pending is not None:
                consume(*pending)
            pending = (preds, batch)
        if pending is not None:
            consume(*pending)

        if image_ids:
            self._flush(all_preds, all_boxes, image_ids)

        stats = acc.fetch()                     # ONE metrics fetch total
        self.valid_loss = stats.get("loss_mean", 0.0)
        self.valid_acc = (stats.get("pck_hit_sum", 0.0) /
                          stats["pck_cnt_sum"]
                          if stats.get("pck_cnt_sum") else 0.0)
        print_(f"Eval Loss: {self.valid_loss}  PCK: {self.valid_acc}")

        stats = compute_precision(self.preds_file, labels_file)
        if self.save_results:
            save_evaluation_stats(
                self.exp_path, stats,
                dataset_name=exp["dataset"]["dataset_name"],
                checkpoint=str(self.checkpoint),
                alpha=exp["dataset"].get("alpha"),
                styles=exp["dataset"].get("styles"))
        return stats

    def _dump_visualizations(self, batch, preds):
        """Annotated crop dumps for the reference's ``--save True`` path
        (03_evaluate.py:157-173): predicted skeleton drawn over the
        un-normalized input crop, saved under plots/eval_examples."""
        from stlpose_tpu.ops.pose_entries import unnormalize
        from stlpose_tpu.ops.affine import get_affine_matrix_np
        from stlpose_tpu.utils.visualization import draw_pose

        out_dir = os.path.join(self.exp_path, "plots", "eval_examples")
        os.makedirs(out_dir, exist_ok=True)
        imgs = np.asarray(batch["image"])
        for i in range(len(preds)):
            if self._n_vis >= self.max_visualizations:
                break
            # map image-space predictions into the crop for overlay
            mat = get_affine_matrix_np(batch["center"][i],
                                       batch["scale"][i], 0.0, (192, 256))
            pts = np.concatenate([preds[i, :, :2],
                                  np.ones((preds.shape[1], 1))], 1) @ mat.T
            pose = np.concatenate([pts, preds[i, :, 2:3]], axis=1)
            draw_pose(unnormalize(imgs[i]), pose,
                      savepath=os.path.join(
                          out_dir,
                          f"eval_{int(batch['image_id'][i])}_{i}.png"))
            self._n_vis += 1

    def _flush(self, all_preds, all_boxes, image_ids):
        ev = self.exp_data["evaluation"]
        generate_submission(
            np.concatenate(all_preds), np.concatenate(all_boxes), image_ids,
            self.preds_file, in_vis_thr=ev.get("in_vis_thr", 0.2),
            oks_thr=ev.get("oks_thr", 0.9))


def _model_dtype():
    """Compute dtype for the pose model: f32 default, bf16 via
    STLPOSE_DTYPE=bfloat16 (BN statistics and the loss stay f32)."""
    import os
    import jax.numpy as jnp
    return jnp.bfloat16 if os.environ.get("STLPOSE_DTYPE") == "bfloat16" \
        else jnp.float32
