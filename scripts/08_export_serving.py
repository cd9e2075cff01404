#!/usr/bin/env python
"""
AOT serving export CLI (no reference counterpart — the reference serves by
unpickling torch modules, lib/model_setup.py:19-47; this framework ships a
deployable StableHLO artifact instead).

Usage:
  python scripts/08_export_serving.py -d <experiment_dir> [--checkpoint X]
      [--out DIR] [--platforms tpu,cpu] [--flip_tta]
      [--quant int8 --calib_images DIR_OR_NPY]
      [--pipeline two_stage ...]

Loads the experiment's model (optionally a trained checkpoint, or the
published .pth via STLPOSE_PRETRAINED like 03_evaluate.py), folds BN, and
writes <out>/model.stablehlo + manifest.json. The artifact is
batch-polymorphic and loadable with stlpose_tpu.serving.load_pose_server.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from stlpose_tpu.config import CONFIG, get_hrnet_config
    from stlpose_tpu.models import PoseHighResolutionNet
    from stlpose_tpu.serving import export_pose_server
    from stlpose_tpu.train import create_train_state
    from stlpose_tpu.utils import load_experiment_parameters
    from stlpose_tpu.utils.checkpoint import (load_checkpoint,
                                              load_pretrained_variables)

    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--exp_directory", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="experiment checkpoint name to export")
    ap.add_argument("--out", default=None,
                    help="output dir (default <exp>/serving_export)")
    ap.add_argument("--platforms", default="tpu,cpu")
    ap.add_argument("--pipeline", default="pose",
                    choices=["pose", "two_stage", "detector"],
                    help="two_stage additionally loads the experiment's "
                         "detector (STLPOSE_DETECTOR_CONFIG / "
                         "--detector_checkpoint) and exports the fused "
                         "detector->crops->pose program; detector exports "
                         "the detector stage alone (boxes/scores/labels/"
                         "valid), with optional --trunk_quant flavors")
    ap.add_argument("--detector_checkpoint", default=None)
    ap.add_argument("--batch", type=int, default=8,
                    help="static batch of a two_stage export")
    ap.add_argument("--max_dets", type=int, default=16)
    ap.add_argument("--bbox_thr", type=float, default=0.5)
    ap.add_argument("--crop_budget", type=int, default=None)
    ap.add_argument("--image_dtype", default="float32",
                    choices=["float32", "uint8"],
                    help="two_stage image ingest: uint8 ships 0-255 "
                         "bytes (4x cheaper wire) and converts on device")
    ap.add_argument("--packed", action="store_true",
                    help="two_stage: pack all outputs into ONE flat f32 "
                         "buffer (single D2H fetch per call; layout in "
                         "the manifest)")
    ap.add_argument("--flip_tta", action="store_true",
                    help="pose: bake the eval-grade flip-TTA program "
                         "(doubled-batch forward + flip-back averaging)")
    ap.add_argument("--quant", default="none", nargs="?", const="int8u",
                    choices=["none", "int8", "int8u"],
                    help="pose: int8u (the default when --quant is given "
                         "bare) bakes the shifted-unsigned w8a8 accuracy "
                         "flavor; int8 the signed throughput flavor, "
                         "whose AP COLLAPSES on the only available "
                         "accuracy instrument (models/quantize.py; "
                         "bounds tests/test_int8_accuracy.py; caveat "
                         "recorded in the manifest); needs "
                         "--calib_images")
    ap.add_argument("--trunk_quant", default="none", nargs="?",
                    const="int8",
                    choices=["none", "folded", "int8", "int8u"],
                    help="detector (faster_rcnn): ResNet-trunk serving "
                         "flavor — folded bakes BN into the convs; int8 "
                         "(the default when given bare: the trunk's fat "
                         "256..2048-channel convs are the shape where the "
                         "int8 MXU path pays, unlike HRNet) / int8u "
                         "additionally bake the PTQ bottlenecks and need "
                         "--calib_images (models/quantize.py::"
                         "quantize_frcnn_trunk; accuracy bounds "
                         "tests/test_trunk_quant.py)")
    ap.add_argument("--calib_images", default=None,
                    help="directory of images (or a .npy of uint8 "
                         "(N,H,W,3) crops) used to calibrate int8 "
                         "activation scales; images are resized to the "
                         "model input size")
    ap.add_argument("--calib_count", type=int, default=32,
                    help="max calibration images read from --calib_images")
    args = ap.parse_args()

    exp_path = args.exp_directory
    exp_data = load_experiment_parameters(exp_path)
    config_name = os.environ.get("STLPOSE_MODEL_CONFIG", "w32_256x192")
    cfg = get_hrnet_config(config_name)
    model = PoseHighResolutionNet(config=cfg)

    pretrained = os.environ.get("STLPOSE_PRETRAINED", "default")
    if pretrained == "default":
        pretrained = os.path.join(CONFIG["paths"]["pretrained_path"],
                                  "HRnet", "pose_hrnet_w32_256x192.pth")
    variables = None
    if pretrained and os.path.exists(pretrained):
        variables = load_pretrained_variables(model, pretrained)
    hw = cfg.image_size
    state, _ = create_train_state(
        model, exp_data, jax.random.PRNGKey(CONFIG["random_seed"]),
        (1, hw[1], hw[0], 3), variables=variables)
    if args.checkpoint is not None:
        state, _ = load_checkpoint(state, exp_path, args.checkpoint,
                                   only_model=True)

    out_dir = args.out or os.path.join(exp_path, "serving_export")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    platforms = tuple(args.platforms.split(","))
    def _restored_detector_and_calib():
        """Shared by the detector and two_stage pipelines: restore the
        detector checkpoint through a live-BN template (regardless of a
        leaked STLPOSE_FRCNN_TRUNK_QUANT env — checkpoints hold live-BN
        variables; the serving flavor is controlled solely by
        --trunk_quant) and load the PTQ calibration crops once, so the
        two export paths cannot drift in restore or calib conventions."""
        from stlpose_tpu.engines.detector_trainer import (
            live_template_detector, _DetectorModelShim)

        detector, det_cfg = live_template_detector(
            exp_data, os.environ.get("STLPOSE_DETECTOR_CONFIG"))
        det_state, _ = create_train_state(
            _DetectorModelShim(detector), exp_data,
            jax.random.PRNGKey(CONFIG["random_seed"]), (1,))
        if args.detector_checkpoint is not None:
            det_state, _ = load_checkpoint(
                det_state, exp_path, args.detector_checkpoint,
                detector=True, only_model=True)
        family = ("efficientdet" if "efficientdet" in
                  type(detector).__name__.lower() else "faster_rcnn")
        calib = None
        if args.trunk_quant in ("int8", "int8u"):
            if args.calib_images is None:
                ap.error(f"--trunk_quant {args.trunk_quant} requires "
                         "--calib_images")
            S = det_cfg.image_size
            # detector predict convention: 0-1 floats (data/pipeline.py)
            calib = [_load_calib_crops(args.calib_images, (S, S),
                                       args.calib_count)
                     .astype("float32") / 255.0]
        return det_cfg, det_state, family, calib

    if args.pipeline == "detector":
        from stlpose_tpu.serving import export_detector_server

        det_cfg, det_state, family, calib = _restored_detector_and_calib()
        export_detector_server(
            det_state.variables(), out_dir, family=family,
            config=det_cfg, static_batch=args.batch,
            platforms=platforms, image_dtype=args.image_dtype,
            trunk_quant=args.trunk_quant, calib_batches=calib)
    elif args.pipeline == "two_stage":
        from stlpose_tpu.serving.export import export_two_stage_server

        det_cfg, det_state, family, calib = _restored_detector_and_calib()
        export_two_stage_server(
            det_state.variables(), variables, out_dir, family=family,
            det_config=det_cfg, pose_config_name=config_name,
            bbox_thr=args.bbox_thr, max_dets=args.max_dets,
            crop_budget=args.crop_budget, static_batch=args.batch,
            platforms=platforms, image_dtype=args.image_dtype,
            packed_output=args.packed, trunk_quant=args.trunk_quant,
            calib_batches=calib)
    else:
        calib = None
        if args.quant in ("int8", "int8u"):
            if args.calib_images is None:
                ap.error(f"--quant {args.quant} requires --calib_images")
            calib = _load_calib_crops(args.calib_images, (hw[1], hw[0]),
                                      args.calib_count)
        export_pose_server(variables, out_dir, config_name=config_name,
                           input_hw=(hw[1], hw[0]), platforms=platforms,
                           flip_tta=args.flip_tta, quant=args.quant,
                           calib_crops=calib)
    print(f"exported serving artifact -> {out_dir}")


def _load_calib_crops(path, input_hw, count):
    """uint8 (N, H, W, 3) calibration crops from a .npy dump or an image
    directory (resized with the same cv2 interpolation the host pipeline
    uses)."""
    import numpy as np

    H, W = input_hw
    if path.endswith(".npy"):
        crops = np.load(path)[:count]
        if crops.shape[1:] != (H, W, 3):
            raise ValueError(f"calib crops {crops.shape[1:]} != {(H, W, 3)}")
        return crops.astype(np.uint8)
    import cv2
    names = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))[:count]
    if not names:
        raise ValueError(f"no images in {path}")
    crops = [cv2.resize(cv2.cvtColor(cv2.imread(os.path.join(path, f)),
                                     cv2.COLOR_BGR2RGB), (W, H),
                        interpolation=cv2.INTER_LINEAR) for f in names]
    return np.stack(crops).astype(np.uint8)


if __name__ == "__main__":
    main()
