"""
Two-stage detect->pose qualitative evaluation engine.

Behavioral parity with the reference's VaseEvaluator
(reference: 04_evaluate_vases_qualitatively.py:76-263): person detector ->
score filtering -> per-detection 192x256 affine crops -> HRNet -> per-crop
and full-image keypoint decode -> rendered detections/instances/poses.

TPU-native pipeline: the detector batch, the crop warps
(ops.warp.crop_from_center_scale), the HRNet flip-TTA forward, and the
decode all run on device; only rendering is host matplotlib. This is the
BASELINE "two-stage" configuration.

Default execution is the FUSED path (``build_fused_two_stage``): the
entire pass — including bbox filtering and cross-batch crop compaction —
is one jit program (shard_map form on multi-device meshes), the same
program bench.py's twostage modes time and ``serving.export.
export_two_stage_server`` serializes; the host-filtering path remains as
the ragged-batch fallback and equality oracle.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from stlpose_tpu.config import CONFIG, get_hrnet_config
from stlpose_tpu.data.loaders import get_vase_subset
from stlpose_tpu.engines.detector_trainer import build_detector
from stlpose_tpu.models import PoseHighResolutionNet
from stlpose_tpu.ops.affine import coords_to_center_scale
from stlpose_tpu.ops.bbox_utils import bbox_filtering
from stlpose_tpu.ops.decode import decode_heatmaps, heatmap_argmax
from stlpose_tpu.ops.warp import crop_from_center_scale_batched
from stlpose_tpu.parallel import get_mesh
from stlpose_tpu.parallel.detector_steps import make_detector_predict
from stlpose_tpu.parallel.steps import make_infer_fn
from stlpose_tpu.train import create_train_state
from stlpose_tpu.utils import load_experiment_parameters
from stlpose_tpu.utils.checkpoint import (load_checkpoint,
                                          load_pretrained_variables)
from stlpose_tpu.utils.visualization import draw_pose, visualize_bbox

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _fused_pack_spec(B: int, m: int, budget: int, J: int = 17):
    """Static (key, shape, dtype) layout of the fused program's outputs
    when flattened into ONE f32 buffer. Serving hosts fetch the whole
    result in a single D2H transfer instead of one per output array —
    under an RPC-attached device (this container's tunnel, or any
    networked serving topology) each fetch pays a full round trip, so 7
    fetches -> 1 is the difference between ~294 ms and ~double-digit ms
    per engine call at B=8 (BENCH_extra.json::two_stage_engine_*).
    ``J`` is the pose config's joint count (17 for every COCO config)."""
    return (("sel_boxes", (B, m, 4), np.float32),
            ("sel_scores", (B, m), np.float32),
            ("sel_valid", (B, m), np.bool_),
            ("img_idx", (budget,), np.int32),
            ("picked_valid", (budget,), np.bool_),
            ("crop_kpts", (budget, J, 3), np.float32),
            ("img_kpts", (budget, J, 3), np.float32))


def _pack_fused_outputs(out, spec):
    """In-jit: flatten + cast every fused output to f32 and concatenate.
    bool -> {0,1}; int32 image indices are exact in f32 (< 2**24)."""
    return jnp.concatenate(
        [out[k].astype(jnp.float32).reshape(-1) for k, _, _ in spec])


def _unpack_fused_outputs(buf: np.ndarray, spec):
    """Host: split the single fetched f32 buffer back into the output
    dict (inverse of :func:`_pack_fused_outputs`). Any pack/spec layout
    drift (stale manifest vs artifact, mismatched joint count) must fail
    loudly here, not mis-split silently."""
    total = sum(int(np.prod(shape)) for _, shape, _ in spec)
    if buf.size != total:
        raise ValueError(
            f"packed buffer has {buf.size} elements but the spec "
            f"describes {total} — pack/spec layout mismatch")
    out, off = {}, 0
    for k, shape, dt in spec:
        n = int(np.prod(shape))
        v = buf[off:off + n].reshape(shape)
        off += n
        if dt == np.bool_:
            v = v > 0.5
        elif dt == np.int32:
            v = np.rint(v).astype(np.int32)
        out[k] = v
    return out


def build_fused_two_stage(detector, pose_model, *, bbox_thr: float,
                          max_dets: int, budget: int, pallas_crop: bool):
    """The whole two-stage pass as ONE pure function
    ``fused(det_vars, pose_vars, images01) -> dict``: detector predict ->
    on-device bbox filtering (class/score/top-max_dets, the device form
    of ops/bbox_utils.bbox_filtering) -> cross-batch crop compaction
    (the bench.py::bench_two_stage_compact program) -> affine crops ->
    pose forward -> per-crop AND full-image decode.

    Shared by ``VaseEvaluator`` (jit per batch shape) and
    ``serving.export.export_two_stage_server`` (AOT artifact).
    Reference flow being served: 04_evaluate_vases_qualitatively.py:
    176-263."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def fused(det_vars, pose_vars, images01):
        # native uint8 ingest: serving clients ship 0-255 pixel bytes
        # (4x fewer H2D bytes than f32); the [0,1] conversion happens on
        # device. dtype is static at trace time.
        if images01.dtype == jnp.uint8:
            images01 = images01.astype(jnp.float32) / 255.0
        dets = detector.predict(det_vars, images01)
        boxes, scores = dets["boxes"], dets["scores"]
        keep = (dets["valid"] & (dets["labels"] == 1) &
                (scores >= bbox_thr))
        masked = jnp.where(keep, scores, -jnp.inf)
        m = min(max_dets, masked.shape[1])
        top_s, top_i = jax.lax.top_k(masked, m)             # (B, m)
        sel_boxes = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
        sel_valid = top_s > -jnp.inf
        # cross-batch compaction: composite key = valid-first, then
        # score (scores live in (0, 1) for both families, so the global
        # ordering restricted to one image is its per-image score
        # ordering — crop k of image i pairs with box k)
        key_flat = (sel_valid.reshape(-1) * 10.0 +
                    jnp.where(sel_valid, top_s, 0.0).reshape(-1))
        _, idx = jax.lax.top_k(key_flat, budget)
        img_idx = (idx // m).astype(jnp.int32)
        flat_boxes = sel_boxes.reshape(-1, 4)[idx]
        picked_valid = sel_valid.reshape(-1)[idx]
        # invalid slots get a unit box: their crops are discarded by the
        # consumer, but degenerate boxes must not poison the warp with
        # non-finite math
        flat_boxes = jnp.where(
            picked_valid[:, None], flat_boxes,
            jnp.asarray([0.0, 0.0, 32.0, 32.0], jnp.float32))
        centers, scales = coords_to_center_scale(flat_boxes, 192.0 / 256.0)
        crops = crop_from_center_scale_batched(
            images01 * 255.0, centers, scales, img_idx, (192, 256),
            use_pallas=pallas_crop)
        x = (crops / 255.0 - mean) / std
        hm = jnp.transpose(
            pose_model.apply(pose_vars, x, train=False), (0, 3, 1, 2))
        coords, maxvals = heatmap_argmax(hm)
        Hh, Hw = hm.shape[2], hm.shape[3]
        coords = coords * jnp.asarray(
            [(192.0 - 1) / (Hw - 1), (256.0 - 1) / (Hh - 1)], jnp.float32)
        crop_kpts = jnp.concatenate([coords, maxvals[..., None]], axis=-1)
        preds, mv, _ = decode_heatmaps(hm, centers, scales)
        img_kpts = jnp.concatenate([preds, mv[..., None]], axis=-1)
        return {"sel_boxes": sel_boxes, "sel_scores": top_s,
                "sel_valid": sel_valid, "img_idx": img_idx,
                "picked_valid": picked_valid, "crop_kpts": crop_kpts,
                "img_kpts": img_kpts}

    return fused


def build_fused_two_stage_sharded(detector, pose_model, mesh, *,
                                  bbox_thr: float, max_dets: int,
                                  budget_per_device: int,
                                  pallas_crop: bool):
    """Multi-device form of :func:`build_fused_two_stage`: the whole
    two-stage program runs under ``shard_map`` over the data axis — each
    device detects, filters, compacts (its OWN ``budget_per_device``
    crop budget), crops, and decodes its batch shard with no
    collectives; per-device ``img_idx`` are offset to global image
    indices before un-sharding. This is also how a Pallas-RoIAlign
    detector serves on a mesh (GSPMD has no partitioning rule for the
    Mosaic custom call; per-device the program is purely local —
    parallel/detector_steps.py::make_detector_predict).

    With ``budget_per_device = local_batch * max_dets`` nothing is
    dropped and results equal the single-device fused program on the
    same inputs."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    inner = build_fused_two_stage(detector, pose_model, bbox_thr=bbox_thr,
                                  max_dets=max_dets,
                                  budget=budget_per_device,
                                  pallas_crop=pallas_crop)

    def local(det_vars, pose_vars, images01):
        out = inner(det_vars, pose_vars, images01)
        offset = jax.lax.axis_index("data") * images01.shape[0]
        out["img_idx"] = out["img_idx"] + offset
        return out

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(), P(), P("data")),
                        out_specs=P("data"), check_vma=False)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(sharded, in_shardings=(repl, repl, data),
                   out_shardings=data)


class VaseEvaluator:
    """Engine behind 04_evaluate_vases_qualitatively.py."""

    def __init__(self, exp_path: str, checkpoint=None,
                 detector_checkpoint=None, dataset_name: str = "red_black",
                 data_path=None, bbox_thr: float = 0.5,
                 kpt_thr: float = 0.1, max_dets: int = 8,
                 detector_config=None, save: bool = True,
                 use_fused: bool | None = None, crop_budget: int | None = None):
        self.exp_path = exp_path
        self.exp_data = load_experiment_parameters(exp_path)
        self.checkpoint = checkpoint
        self.detector_checkpoint = detector_checkpoint
        self.dataset_name = dataset_name
        self.data_path = data_path
        self.bbox_thr = bbox_thr
        self.kpt_thr = kpt_thr
        self.max_dets = max_dets
        self.detector_config = detector_config
        self.save = save
        # fused = the whole two-stage pass (detector -> filtering ->
        # compaction -> crops -> pose -> decode) as ONE jit program, host
        # only for rendering — the same program bench.py's twostage_compact
        # mode times, so the engine's number IS the bench's number.
        # None = auto: fused on a single-device mesh, host path (which
        # routes through make_detector_predict's shard_map handling) on
        # multi-device meshes.
        self.use_fused = use_fused
        # static crop budget of the fused program; None = B * max_dets
        # (exact equality with the host path — nothing dropped). Set lower
        # for dense serving batches: compaction keeps the highest-score
        # detections batch-wide and drops the tail, trading completeness
        # for a smaller pose batch.
        self.crop_budget = crop_budget
        self._fused_cache = {}
        self.plots_path = os.path.join(exp_path, "plots",
                                       f"vases_{dataset_name}")

    def load_vase_subset(self, batch_size: int = 1):
        self.detector, self.det_cfg = build_detector(self.exp_data,
                                                     self.detector_config)
        self.pipe = get_vase_subset(
            img_size=self.det_cfg.image_size,
            dataset_name=self.dataset_name, data_path=self.data_path,
            batch_size=batch_size)

    def setup_models(self, config_name: str = "w32_256x192",
                     pretrained=None):
        self.mesh = get_mesh()
        shim_rng = jax.random.PRNGKey(CONFIG["random_seed"])
        # detector — trunk serving flavors (STLPOSE_FRCNN_TRUNK_QUANT)
        # restore through a live-BN template, then transform for the
        # serving graph; int8/int8u calibrate on the first vase batch
        # (load_vase_subset must have run), so the engine serves the same
        # full quantized stack bench.py measures (--trunk-quant int8)
        from stlpose_tpu.engines.detector_trainer import (
            _DetectorModelShim, apply_trunk_flavor, live_template_detector)
        tq = getattr(self.detector, "trunk_quant", "none")
        shim = _DetectorModelShim(
            live_template_detector(self.exp_data, self.detector_config)[0]
            if tq != "none" else self.detector)
        self.det_state, _ = create_train_state(
            shim, self.exp_data, shim_rng, (1,))
        if self.detector_checkpoint is not None:
            self.det_state, _ = load_checkpoint(
                self.det_state, self.exp_path, self.detector_checkpoint,
                detector=True, only_model=True)
        def _calib_batch():
            pipe = getattr(self, "pipe", None)
            if pipe is None:
                raise RuntimeError(
                    f"trunk_quant={tq!r} calibrates on the first image "
                    "batch: call load_vase_subset() before "
                    "setup_models(), or set ev.pipe = [{'image': batch}] "
                    "with a (N, S, S, 3) 0-1 float batch")
            return next(iter(pipe))["image"]

        self.det_state = apply_trunk_flavor(
            self.detector, self.det_cfg, self.det_state,
            calib_batch_fn=_calib_batch)
        self.det_predict = make_detector_predict(self.detector, self.mesh)
        # pose model
        model = PoseHighResolutionNet(config=get_hrnet_config(config_name),
                              dtype=_model_dtype())
        self.pose_model = model
        variables = load_pretrained_variables(model, pretrained) \
            if pretrained else None
        hw = get_hrnet_config(config_name).image_size
        self.pose_state, _ = create_train_state(
            model, self.exp_data, shim_rng, (1, hw[1], hw[0], 3),
            variables=variables)
        if self.checkpoint is not None:
            self.pose_state, _ = load_checkpoint(
                self.pose_state, self.exp_path, self.checkpoint,
                only_model=True)
        self.pose_infer = make_infer_fn(self.pose_model, self.mesh,
                                        flip_tta=False, decode=False)
        from stlpose_tpu.ops.pallas_warp import use_pallas_warp
        self._pallas_crop = use_pallas_warp()

    def process_image(self, image01):
        """Full two-stage pass on ONE (S, S, 3) [0,1] image (see
        ``process_images``)."""
        return self.process_images(np.asarray(image01)[None])[0]

    # ------------------------------------------------------- fused path
    def _get_fused(self, B: int, budget: int):
        """One jit program for the whole two-stage pass at a (batch,
        crop-budget) shape: detector predict -> on-device bbox filtering
        (class/score/top-max_dets, the device form of
        ops/bbox_utils.bbox_filtering) -> cross-batch compaction (the
        bench.py::bench_two_stage_compact program) -> affine crops ->
        pose forward -> per-crop AND full-image decode. Host touches only
        the final small arrays (rendering)."""
        key = (B, budget)
        if key in self._fused_cache:
            return self._fused_cache[key]
        n_dev = self.mesh.devices.size
        if n_dev > 1:
            if B % n_dev:
                raise ValueError(
                    f"fused two-stage on a {n_dev}-device mesh needs the "
                    f"batch ({B}) divisible by the mesh; use the host "
                    f"path (use_fused=False) for ragged batches")
            f = build_fused_two_stage_sharded(
                self.detector, self.pose_model, self.mesh,
                bbox_thr=self.bbox_thr, max_dets=self.max_dets,
                budget_per_device=-(-budget // n_dev),
                pallas_crop=self._pallas_crop)
        else:
            # single-device: jit the PACKED form — all outputs flattened
            # into one f32 buffer so the host pays ONE D2H fetch per call
            # (see _fused_pack_spec). The sharded form keeps the dict
            # (its leaves carry per-axis shardings a 1-D concat would
            # destroy).
            inner = build_fused_two_stage(
                self.detector, self.pose_model, bbox_thr=self.bbox_thr,
                max_dets=self.max_dets, budget=budget,
                pallas_crop=self._pallas_crop)
            m = min(self.max_dets, self.det_cfg.detections_per_img)
            spec = _fused_pack_spec(B, m, budget,
                                    self.pose_model.config.num_joints)

            def packed(det_vars, pose_vars, images):
                return _pack_fused_outputs(
                    inner(det_vars, pose_vars, images), spec)

            f = (jax.jit(packed), spec)
        self._fused_cache[key] = f
        return f

    def _process_images_fused(self, images01):
        # device-resident inputs pass through without a host round trip;
        # uint8 inputs (0-255) upload as bytes and convert on device
        if isinstance(images01, jnp.ndarray):
            imgs_dev = images01 if images01.dtype == jnp.uint8 \
                else images01.astype(jnp.float32)
        else:
            arr = np.asarray(images01)
            imgs_dev = jnp.asarray(
                arr if arr.dtype == np.uint8 else arr.astype(np.float32))
        B = imgs_dev.shape[0]
        m = min(self.max_dets, self.det_cfg.detections_per_img)
        budget = self.crop_budget or B * m
        budget = min(budget, B * m)
        fused = self._get_fused(B, budget)
        if isinstance(fused, tuple):                 # packed single-device
            f, spec = fused
            buf = np.array(f(self.det_state.variables(),
                             self.pose_state.variables(), imgs_dev),
                           np.float32)               # ONE D2H fetch
            out = _unpack_fused_outputs(buf, spec)
        else:
            out = fused(self.det_state.variables(),
                        self.pose_state.variables(), imgs_dev)
            out = {k: np.array(jnp.asarray(v).astype(jnp.float32))
                   if np.asarray(v).dtype not in (np.bool_, np.int32)
                   else np.asarray(v) for k, v in out.items()}
        crop_kpts, img_kpts = out["crop_kpts"], out["img_kpts"]
        for arr in (crop_kpts, img_kpts):
            arr[arr[..., 2] < self.kpt_thr] = 0
        results = []
        for i in range(B):
            v = out["sel_valid"][i]
            pick = (out["img_idx"] == i) & out["picked_valid"]
            results.append({
                "boxes": out["sel_boxes"][i][v],
                "scores": out["sel_scores"][i][v],
                "crop_keypoints": crop_kpts[pick],
                "image_keypoints": img_kpts[pick]})
        return results

    def process_images(self, images01, use_fused: bool | None = None):
        """Full two-stage pass on a BATCH of (B, S, S, 3) images — [0,1]
        float, or uint8 0-255 (uploaded as bytes, 4x cheaper H2D, and
        converted on device) — with CROSS-BATCH crop compaction: the valid detections of ALL
        images are gathered into one dense crop batch (static bucketed
        budget, mesh-divisible) before a single pose forward — per-image
        detection-count padding becomes throughput on realistic scenes
        (artwork averages 1-3 persons/image; reference per-image flow:
        04_evaluate_vases_qualitatively.py:176-263).

        By default (fused path, single-device mesh) the ENTIRE pass runs
        as one jit program (see ``_get_fused``); the host path below is
        the multi-device/sharded fallback and the equality oracle
        (tests/test_two_stage_and_extractor.py).

        Returns a list of B dicts: boxes/scores after filtering, per-crop
        keypoints (crop space, K x J x 3) and full-image keypoints.
        """
        if use_fused is None:
            use_fused = (self.use_fused if self.use_fused is not None
                         else self.mesh.devices.size == 1)
        if use_fused:
            return self._process_images_fused(images01)
        n_dev = max(self.mesh.devices.size, 1)
        imgs = np.asarray(images01)
        imgs = (imgs.astype(np.float32) / 255.0
                if imgs.dtype == np.uint8 else imgs.astype(np.float32))
        B = imgs.shape[0]
        pad_b = -B % n_dev
        det_in = jnp.asarray(np.concatenate(
            [imgs, np.repeat(imgs[-1:], pad_b, 0)]) if pad_b else imgs)
        dets = self.det_predict(self.det_state, det_in)
        dets = {k: np.asarray(v) for k, v in dets.items()}

        per_image, flat_boxes, flat_idx = [], [], []
        for i in range(B):
            boxes, labels, scores = bbox_filtering(
                {k: v[i] for k, v in dets.items()}, thr=self.bbox_thr)
            order = np.argsort(-scores)[:self.max_dets]
            boxes, scores = boxes[order], scores[order]
            per_image.append((boxes, scores))
            flat_boxes.append(boxes)
            flat_idx.append(np.full(len(boxes), i, np.int32))

        empty = {"boxes": np.zeros((0, 4), np.float32),
                 "scores": np.zeros((0,), np.float32),
                 "crop_keypoints": np.zeros((0, 17, 3)),
                 "image_keypoints": np.zeros((0, 17, 3))}
        K = sum(len(b) for b, _ in per_image)
        if K == 0:
            return [dict(empty, boxes=b, scores=s) for b, s in per_image]

        # bucketed static budget: next power-of-two multiple of the mesh
        # size, so the crop/pose program recompiles at most log2 times
        # instead of once per distinct detection count
        per = -(-K // n_dev)
        bucket = 1
        while bucket < per:
            bucket *= 2
        budget = bucket * n_dev
        boxes_cat = np.concatenate(flat_boxes)
        idx_cat = np.concatenate(flat_idx)
        pad = budget - K
        boxes_cat = np.concatenate(
            [boxes_cat, np.tile(boxes_cat[-1:], (pad, 1))])
        idx_cat = np.concatenate(
            [idx_cat, np.full(pad, idx_cat[-1], np.int32)])

        centers, scales = coords_to_center_scale(
            jnp.asarray(boxes_cat, jnp.float32), 192.0 / 256.0)
        crops = crop_from_center_scale_batched(
            jnp.asarray(imgs * 255.0), centers, scales,
            jnp.asarray(idx_cat), (192, 256))
        crops = (crops / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        hm = np.asarray(self.pose_infer(self.pose_state, crops))

        # per-crop decode at 256x192 (reference: 04_...py:217-228)
        coords, maxvals = heatmap_argmax(jnp.asarray(hm))
        coords, maxvals = np.array(coords), np.array(maxvals)
        Hh, Hw = hm.shape[2], hm.shape[3]
        coords[..., 0] *= (192.0 - 1) / (Hw - 1)
        coords[..., 1] *= (256.0 - 1) / (Hh - 1)
        crop_kpts = np.concatenate([coords, maxvals[..., None]], axis=-1)
        # full-image decode via inverse crop transform (04_...py:244-252)
        preds, mv, _ = decode_heatmaps(jnp.asarray(hm), centers, scales)
        img_kpts = np.concatenate(
            [np.asarray(preds), np.asarray(mv)[..., None]], axis=-1)
        # zero out sub-threshold keypoints for rendering parity
        for arr in (crop_kpts, img_kpts):
            arr[arr[..., 2] < self.kpt_thr] = 0

        results = []
        start = 0
        for boxes, scores in per_image:
            k = len(boxes)
            results.append({"boxes": boxes, "scores": scores,
                            "crop_keypoints": crop_kpts[start:start + k],
                            "image_keypoints": img_kpts[start:start + k]})
            start += k
        return results

    def qualitative_comparison(self, limit: int | None = None):
        os.makedirs(self.plots_path, exist_ok=True)
        n_done = 0
        for batch in self.pipe:
            n = batch["n_valid"]
            if limit is not None:
                n = min(n, limit - n_done)
                if n <= 0:
                    return n_done
            # always process the FULL padded batch (constant shapes ->
            # one jit compile) and slice the RESULTS to the valid count;
            # a short tail batch would otherwise retrace the detector,
            # crop, and pose programs for its new batch dimension
            images = np.asarray(batch["image"])
            batch_res = self.process_images(images)[:n]
            images = images[:n]
            for i in range(n):
                img = images[i]
                res = batch_res[i]
                if self.save:
                    name = f"img_{int(batch['image_id'][i]):04d}"
                    visualize_bbox(
                        img, res["boxes"], res["scores"],
                        savepath=os.path.join(self.plots_path,
                                              f"{name}_dets.png"))
                    draw_pose(
                        img, res["image_keypoints"],
                        kpt_thr=self.kpt_thr,
                        savepath=os.path.join(self.plots_path,
                                              f"{name}_poses.png"))
                n_done += 1
        return n_done


def _model_dtype():
    """Compute dtype for the pose model: f32 default, bf16 via
    STLPOSE_DTYPE=bfloat16 (BN statistics and the loss stay f32)."""
    import os
    import jax.numpy as jnp
    return jnp.bfloat16 if os.environ.get("STLPOSE_DTYPE") == "bfloat16" \
        else jnp.float32
