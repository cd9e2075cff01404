"""
Host -> device input pipeline.

The reference trains with a single-threaded DataLoader (num_workers=0,
reference: CONFIG.py:18) doing cv2 warps + Gaussian rendering per sample in
the training process. Here the pipeline is split TPU-first:

  host (thread pool): image decode + augmentation sampling + per-crop warp
      (cv2 releases the GIL, so threads scale),
  device (one jit program, amortized over the batch): ImageNet
      normalization + Gaussian heatmap target rendering, fused by XLA into
      the same program as the train step's first ops.

Batches are padded to a multiple of the mesh size with a validity mask so
shapes stay static under pjit; iteration order and augmentation
distributions match the reference.
"""

from __future__ import annotations

import concurrent.futures as cf
import functools
import threading
from typing import Iterator, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stlpose_tpu.data.pose_dataset import (AugmentationParams, PoseRecord,
                                           process_sample, read_image,
                                           IMAGE_SIZE, HEATMAP_SIZE)
from stlpose_tpu.ops.heatmap import generate_targets

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@jax.jit
def _device_finalize(crops, joints, vis):
    """Batched on-device tail of the input pipeline: normalize + targets.

    ``crops`` arrive as uint8 (the host's cv2.warpAffine on uint8 images is
    integer-valued, so the uint8 wire format is bit-exact and cuts H2D
    transfer 4x) and are cast to f32 on device.
    """
    crops = crops.astype(jnp.float32)
    x = (crops / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    target, weight = generate_targets(joints, vis,
                                      heatmap_size=HEATMAP_SIZE,
                                      image_size=IMAGE_SIZE)
    return x, target, weight


def _device_warp_finalize(canvases, centers, scales, rots, joints, vis,
                          may_rotate: bool = True):
    """Fully device-side geometry: batched affine crop warp + joint
    transform + normalize + Gaussian targets in ONE XLA program.

    The host only decodes images onto fixed letterbox canvases (uint8 wire
    format — cv2.resize on uint8 is integer-valued, so this is bit-exact);
    centers / scales / joints arrive pre-scaled to canvas coordinates
    (BASELINE config #2 — 'batched affine-warp + heatmap-target datagen').
    On TPU the crop warp runs as the Pallas two-pass kernel
    (ops/pallas_warp.py); on CPU it stays the XLA direct-bilinear gather.
    The Pallas/XLA choice is made HERE, per call (the gate must not be
    frozen into the jitted program — STLPOSE_PALLAS_WARP would stop
    working mid-process), and passed down as a static arg.
    """
    from stlpose_tpu.ops.pallas_warp import use_pallas_warp

    use_pallas = use_pallas_warp() and canvases.shape[1] % 128 == 0
    return _device_warp_finalize_impl(canvases, centers, scales, rots,
                                      joints, vis, use_pallas=use_pallas,
                                      may_rotate=may_rotate)


@functools.partial(jax.jit, static_argnames=("use_pallas", "may_rotate"))
def _device_warp_finalize_impl(canvases, centers, scales, rots, joints, vis,
                               *, use_pallas, may_rotate):
    from stlpose_tpu.ops.affine import get_affine_matrix, apply_affine
    from stlpose_tpu.ops.pallas_warp import affine_warp_pallas
    from stlpose_tpu.ops.warp import affine_warp

    canvases = canvases.astype(jnp.float32)
    if use_pallas:
        crops = affine_warp_pallas(canvases, centers, scales, rots,
                                   IMAGE_SIZE, may_rotate=may_rotate)
    else:
        crops = affine_warp(canvases, centers, scales, rots, IMAGE_SIZE)
    x = (crops / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    mats = get_affine_matrix(centers, scales, rots, IMAGE_SIZE)
    joints_crop = apply_affine(joints, mats)
    joints_crop = jnp.where(vis[..., None] > 0, joints_crop, joints)
    target, weight = generate_targets(joints_crop, vis,
                                      heatmap_size=HEATMAP_SIZE,
                                      image_size=IMAGE_SIZE)
    return x, target, weight, joints_crop


class PoseDataPipeline:
    """Iterable over device-ready batches of pose crops.

    Args:
      records: list of PoseRecord.
      batch_size: global batch size.
      is_train: enables augmentation + (optional) shuffling.
      exp_data: experiment params (augmentation knobs read from
        exp_data["dataset"], reference: JointsDataset.py:51-55).
      shuffle: shuffle each epoch.
      num_workers: host decode/warp threads.
      pad_multiple: pad final batch to a multiple (mesh size) with repeated
        samples; "n_valid" in the batch marks real entries.
      drop_last: drop the final partial batch (train loops).
    """

    def __init__(self, records: Sequence[PoseRecord], batch_size: int,
                 is_train: bool, exp_data: dict | None = None,
                 shuffle: bool = False, num_workers: int = 8,
                 pad_multiple: int = 1, drop_last: bool = False,
                 seed: int = 13, device_warp: bool = False,
                 canvas_size: int = 640, stylizer=None, style_bank=None,
                 style_alpha=1.0):
        self.records = list(records)
        self.batch_size = batch_size
        self.is_train = is_train
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.pad_multiple = pad_multiple
        self.drop_last = drop_last
        self.device_warp = device_warp
        self.canvas_size = canvas_size
        # inline AdaIN stylization (BASELINE config #4): crops are stylized
        # on device before normalization, replacing the reference's offline
        # Styled-COCO generation with an XLA stage in the input pipeline
        self.stylizer = stylizer
        self.style_bank = (np.asarray(style_bank, np.float32)
                           if style_bank is not None else None)
        self.style_alpha = style_alpha
        if device_warp and stylizer is not None:
            # the device-warp collate normalizes inside its fused program;
            # silently skipping stylization there would be a wrong result,
            # not a slow one
            raise ValueError("inline stylization is not supported with "
                             "device_warp=True; use the host-warp pipeline")
        self.rng = np.random.RandomState(seed)
        self.aug = None
        if is_train and exp_data is not None:
            d = exp_data["dataset"]
            self.aug = AugmentationParams(
                scale_factor=d.get("scale_factor", 0.0),
                rotation_factor=d.get("rot_factor", 0.0),
                flip=d.get("flip", False),
                num_joints_half_body=d.get("num_joints_half_body", 8),
                prob_half_body=d.get("prob_half_body", 0.0),
                seed=seed)
        self._aug_lock = threading.Lock()

    def __len__(self):
        n = len(self.records)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _load_one(self, rec: PoseRecord):
        img = read_image(rec.image)
        if self.aug is not None:
            with self._aug_lock:      # RNG draw must be serialized
                c, s, r, f = self.aug.sample(rec.center, rec.scale,
                                             rec.joints, rec.joints_vis)
            frozen = _FrozenAug(c, s, r, f)
            return process_sample(rec, img, frozen)
        return process_sample(rec, img, None)

    def _load_one_raw(self, rec: PoseRecord):
        """device_warp host stage: decode + letterbox only; geometry params
        travel to the device in canvas coordinates."""
        import cv2

        img = read_image(rec.image)
        joints = rec.joints.copy()
        vis = rec.joints_vis.copy()
        c, s, r = rec.center.copy(), rec.scale.copy(), 0.0
        if self.aug is not None:
            with self._aug_lock:
                c, s, r, do_flip = self.aug.sample(c, s, joints, vis)
            if do_flip:
                img = img[:, ::-1, :]
                from stlpose_tpu.data.pose_dataset import _flip_perm
                perm = _flip_perm(len(joints))
                joints[:, 0] = img.shape[1] - joints[:, 0] - 1
                joints = joints[perm] * vis[perm][:, None]
                vis = vis[perm]
                c[0] = img.shape[1] - c[0] - 1

        S = self.canvas_size
        lam = min(S / img.shape[0], S / img.shape[1])
        nh, nw = int(round(img.shape[0] * lam)), int(round(img.shape[1] * lam))
        # uint8 canvas: cv2.resize on a uint8 image is uint8, so shipping
        # bytes instead of f32 is bit-exact and cuts H2D transfer 4x
        canvas = np.zeros((S, S, 3), np.uint8)
        canvas[:nh, :nw] = cv2.resize(img, (nw, nh),
                                      interpolation=cv2.INTER_LINEAR)
        meta = {"center": c.astype(np.float32), "scale": s.astype(np.float32),
                "rotation": np.float32(r), "score": np.float32(rec.score),
                "image_id": np.int64(rec.image_id),
                "perceptual_loss": np.float32(rec.perceptual_loss)}
        return (canvas, (c * lam).astype(np.float32),
                (s * lam).astype(np.float32), np.float32(r),
                (joints * lam).astype(np.float32), vis.astype(np.float32),
                meta)

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.records))
        if self.shuffle:
            self.rng.shuffle(order)
        loader = self._load_one_raw if self.device_warp else self._load_one
        collate = (self._collate_device_warp if self.device_warp
                   else self._collate)
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(order), self.batch_size):
                idx = order[start:start + self.batch_size]
                if self.drop_last and len(idx) < self.batch_size:
                    break
                samples = list(pool.map(
                    lambda i: loader(self.records[i]), idx))
                yield collate(samples, [self.records[i] for i in idx])

    def _collate(self, samples: List, recs: List[PoseRecord]) -> dict:
        crops = np.stack([s[0] for s in samples])
        joints = np.stack([s[1] for s in samples])
        vis = np.stack([s[2] for s in samples])
        metas = [s[3] for s in samples]
        n_valid = len(samples)

        pad = (-n_valid) % self.pad_multiple if self.pad_multiple > 1 else 0
        if pad:
            sel = np.arange(pad) % n_valid
            crops = np.concatenate([crops, crops[sel]])
            joints = np.concatenate([joints, joints[sel]])
            vis = np.concatenate([vis, vis[sel]])
            metas = metas + [metas[i] for i in sel]

        # cv2.warpAffine on uint8 images yields integer values, so the uint8
        # wire format is bit-exact (4x less H2D than f32)
        crops_dev = jnp.asarray(crops.astype(np.uint8))
        if self.stylizer is not None and self.style_bank is not None:
            sidx = self.rng.randint(0, len(self.style_bank), len(crops))
            styled = self.stylizer(crops_dev.astype(jnp.float32) / 255.0,
                                   jnp.asarray(self.style_bank[sidx]),
                                   alpha=self.style_alpha)
            crops_dev = styled * 255.0
        x, target, weight = _device_finalize(
            crops_dev, jnp.asarray(joints), jnp.asarray(vis))
        batch = {
            "image": x, "target": target, "target_weight": weight,
            "joints": joints, "joints_vis": vis,
            "center": np.stack([m["center"] for m in metas]),
            "scale": np.stack([m["scale"] for m in metas]),
            "score": np.array([m["score"] for m in metas], np.float32),
            "image_id": np.array([m["image_id"] for m in metas], np.int64),
            "perceptual_loss": np.array(
                [m["perceptual_loss"] for m in metas], np.float32),
            "n_valid": n_valid,
        }
        return batch


    def _collate_device_warp(self, samples: List, recs: List[PoseRecord]
                             ) -> dict:
        canvases = np.stack([s[0] for s in samples])
        centers = np.stack([s[1] for s in samples])
        scales = np.stack([s[2] for s in samples])
        rots = np.asarray([s[3] for s in samples], np.float32)
        joints = np.stack([s[4] for s in samples])
        vis = np.stack([s[5] for s in samples])
        metas = [s[6] for s in samples]
        n_valid = len(samples)

        pad = (-n_valid) % self.pad_multiple if self.pad_multiple > 1 else 0
        if pad:
            sel = np.arange(pad) % n_valid
            canvases = np.concatenate([canvases, canvases[sel]])
            centers = np.concatenate([centers, centers[sel]])
            scales = np.concatenate([scales, scales[sel]])
            rots = np.concatenate([rots, rots[sel]])
            joints = np.concatenate([joints, joints[sel]])
            vis = np.concatenate([vis, vis[sel]])
            metas = metas + [metas[i] for i in sel]

        x, target, weight, joints_crop = _device_warp_finalize(
            jnp.asarray(canvases), jnp.asarray(centers),
            jnp.asarray(scales), jnp.asarray(rots), jnp.asarray(joints),
            jnp.asarray(vis),
            # no augmentation -> rot is identically 0; skip the kernel's
            # conditioning pre-rotation pass (a full canvas copy)
            may_rotate=self.aug is not None)
        return {
            "image": x, "target": target, "target_weight": weight,
            "joints": np.asarray(joints_crop), "joints_vis": vis,
            # decode metadata stays in ORIGINAL image coordinates
            "center": np.stack([m["center"] for m in metas]),
            "scale": np.stack([m["scale"] for m in metas]),
            "score": np.array([m["score"] for m in metas], np.float32),
            "image_id": np.array([m["image_id"] for m in metas], np.int64),
            "perceptual_loss": np.array(
                [m["perceptual_loss"] for m in metas], np.float32),
            "n_valid": n_valid,
        }


class _FrozenAug:
    """Pre-drawn augmentation params (thread-safe handoff into
    process_sample)."""

    def __init__(self, c, s, r, f):
        self._vals = (c, s, r, f)

    def sample(self, *args):
        return self._vals
