"""Faster R-CNN trunk serving flavors: BN-folded and int8-PTQ ResNet.

VERDICT r4 next-item 1(b): extend the PTQ machinery
(models/quantize.py) to the detector's ResNet trunk — the fat
256..2048-channel convs where the v5e int8 MXU path pays, unlike
HRNet's thin branches. The reference serves the live torch BN graph
(lib/model_setup.py:70-73); folding and trunk PTQ are TPU serving
optimizations with no reference counterpart.

Covers: fold algebra (feature-level equivalence live-BN vs folded, incl.
the stem_conv/stem_bn pair), the quantized param-tree structure (stem &
heads untouched), end-to-end predict on the int8-trunk graph, and the
accuracy instrument (overfit tiny detector -> GT-anchored localization +
bbox-AP delta through eval/cocoeval.py), mirroring
tests/test_detector_bf16_accuracy.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.models.faster_rcnn import (FasterRCNN, FASTER_RCNN_TINY,
                                            FasterRCNNModule)
from stlpose_tpu.models.quantize import fold_frcnn_trunk, quantize_frcnn_trunk


def _features(det, variables, images):
    return det.module.apply(variables, images, train=False,
                            method=FasterRCNNModule.features)


class TestFoldTrunk:
    def test_feature_equivalence(self, rng):
        """Folded trunk == live eval-mode BN trunk on the FPN features
        (exact algebra up to f32 rounding; fold math runs in f64)."""
        S = FASTER_RCNN_TINY.image_size
        live = FasterRCNN(FASTER_RCNN_TINY)
        variables = live.init(jax.random.PRNGKey(0))
        folded_det = FasterRCNN(FASTER_RCNN_TINY, trunk_quant="folded")
        folded = fold_frcnn_trunk(variables)
        assert "batch_stats" not in folded      # trunk was the only BN

        imgs = jnp.asarray(rng.rand(2, S, S, 3).astype(np.float32))
        f_live = _features(live, variables, imgs)
        f_fold = _features(folded_det, folded, imgs)
        for a, b in zip(f_live, f_fold):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)

    def test_folded_predict_runs(self, trained_tiny_frcnn,
                                 detector_scene_batch):
        """Full predict on the folded graph: same confident detections as
        the live graph (continuous path identical; only BN algebra moved
        into the conv weights)."""
        det, trained = trained_tiny_frcnn
        folded_det = FasterRCNN(FASTER_RCNN_TINY, trunk_quant="folded")
        folded = fold_frcnn_trunk(trained)
        d_live = jax.jit(det.predict)(trained,
                                      detector_scene_batch["image"])
        d_fold = jax.jit(folded_det.predict)(folded,
                                             detector_scene_batch["image"])
        n_live = int((np.asarray(d_live["valid"])
                      & (np.asarray(d_live["scores"]) > 0.5)).sum())
        n_fold = int((np.asarray(d_fold["valid"])
                      & (np.asarray(d_fold["scores"]) > 0.5)).sum())
        assert n_live > 0
        assert abs(n_live - n_fold) <= 1


class TestTrunkInt8:
    def test_quantized_tree_structure(self):
        det = FasterRCNN(FASTER_RCNN_TINY)
        variables = det.init(jax.random.PRNGKey(0))
        q = quantize_frcnn_trunk(
            FASTER_RCNN_TINY, variables,
            [np.zeros((1, FASTER_RCNN_TINY.image_size,
                       FASTER_RCNN_TINY.image_size, 3), np.float32)],
            act_scheme="unsigned")
        bb = q["params"]["backbone"]
        # stem: folded plain conv, NOT quantized (3 input channels)
        assert set(bb["stem_conv"].keys()) == {"kernel", "bias"}
        # every bottleneck ConvBN is int8
        cb1 = bb["layer1_0"]["cb1"]
        assert "kernel_i8" in cb1 and cb1["kernel_i8"].dtype == jnp.int8
        assert {"sw", "sx", "bias"} <= set(cb1.keys())
        # heads untouched
        assert "backbone" in q["params"] and "fpn" in q["params"]
        assert "kernel_i8" not in str(
            jax.tree_util.tree_structure(q["params"]["fpn"]))

    @pytest.mark.parametrize("scheme,quant", [("unsigned", "int8u"),
                                              ("signed", "int8")])
    def test_int8_trunk_accuracy(self, trained_tiny_frcnn,
                                 detector_scene_batch, scheme, quant):
        """The bf16-accuracy instrument, int8-trunk edition: GT-anchored
        localization must hold for every object; the bbox-AP delta through
        eval/cocoeval.py is bounded. Bounds are LOOSER than bf16's: this
        tiny width-8 trunk is the worst case for int8 (thin channels,
        coarse scales) — the real ResNet-50's 256..2048 channels average
        the rounding noise far better (same argument, measured, as the
        HRNet int8 README row)."""
        from tests.test_detector_bf16_accuracy import _stats

        det, trained = trained_tiny_frcnn
        qdet = FasterRCNN(FASTER_RCNN_TINY, trunk_quant=quant)
        qvars = quantize_frcnn_trunk(
            FASTER_RCNN_TINY, trained,
            [np.asarray(detector_scene_batch["image"])],
            act_scheme=scheme)

        d32 = {k: np.asarray(v) for k, v in
               jax.jit(det.predict)(trained,
                                    detector_scene_batch["image"]).items()}
        dq = {k: np.asarray(v) for k, v in
              jax.jit(qdet.predict)(qvars,
                                    detector_scene_batch["image"]).items()}
        st = _stats(d32, dq, detector_scene_batch)
        ap32, apq = st["ap32"], st["apq" if "apq" in st else "ap16"]
        print(f"trunk-{quant}: f32 AP {ap32[0]:.4f}/AP50 {ap32[1]:.4f} | "
              f"{quant} AP {apq[0]:.4f}/AP50 {apq[1]:.4f} | "
              f"GT-IoU min {st['gt_iou16'].min():.3f} | "
              f"conf {st['n32']}/{st['n16']}")
        # every GT object still found with a usable box
        assert st["gt_iou16"].min() > 0.5
        assert np.abs(st["gt_iou32"] - st["gt_iou16"]).max() < 0.3
        # confident-detection counts comparable
        assert st["n16"] > 0
        assert abs(st["n32"] - st["n16"]) <= max(3, int(0.5 * st["n32"]))
        # AP stays meaningful and the delta bounded (loose: tiny trunk)
        assert ap32[1] > 0.9
        assert apq[1] > 0.5, f"{quant} AP50 collapsed: {apq[1]:.3f}"
        assert abs(apq[0] - ap32[0]) < 0.25


class TestEvaluatorTrunkQuant:
    @pytest.mark.parametrize("flavor", ["folded", "int8u"])
    def test_detector_evaluator_env_flavor(self, tmp_path, monkeypatch,
                                           flavor):
        """The AP-parity runbook's trunk-quant legs run through the real
        engine: STLPOSE_FRCNN_TRUNK_QUANT transforms the loaded live-BN
        checkpoint inside DetectorEvaluator.setup (int8* calibrates on the
        first validation batch) and the COCO bbox eval completes."""
        from stlpose_tpu.engines.detector_trainer import (DetectorEvaluator,
                                                          DetectorTrainer)
        from stlpose_tpu.utils.experiment import create_experiment
        from tests.fixtures import make_coco_dataset

        data = tmp_path / "data"
        make_coco_dataset(str(data), n_train=2, n_val=2, img_hw=(128, 160))
        exp_path = create_experiment(
            "tq", {"batch_size": 2, "num_epochs": 1, "save_frequency": 1},
            root=str(tmp_path / "exp"))
        tr = DetectorTrainer(exp_path, data_path=str(data), num_workers=0,
                             detector_config="faster_rcnn_tiny")
        tr.load_dataset()
        tr.setup_model()
        tr.training_loop()

        monkeypatch.setenv("STLPOSE_FRCNN_TRUNK_QUANT", flavor)
        ev = DetectorEvaluator(exp_path, checkpoint="final",
                               data_path=str(data), num_workers=0,
                               detector_config="faster_rcnn_tiny")
        ev.setup()
        assert ev.detector.trunk_quant == flavor
        if flavor == "int8u":
            cb1 = ev.state.params["backbone"]["layer1_0"]["cb1"]
            assert "kernel_i8" in cb1
        stats = ev.evaluate(save_stats=False)
        assert np.isfinite(stats[0]) and -1.0 <= stats[0] <= 1.0


def test_engine_trunk_folded_matches_live(tmp_path, trained_tiny_frcnn,
                                          detector_scene_batch):
    """The deployment engine (VaseEvaluator.process_images, the fused
    two-stage program) serves the folded-trunk detector with the SAME
    results as the live-BN graph — the engine-side proof that the
    trunk serving flavors (bench --trunk-quant) compose with the fused
    pipeline. Folded is exact algebra, so equality is tight."""
    from stlpose_tpu.engines.detector_trainer import apply_trunk_flavor
    from stlpose_tpu.engines.vase_evaluator import VaseEvaluator
    from stlpose_tpu.utils.experiment import create_experiment

    det, trained = trained_tiny_frcnn
    exp_path = create_experiment("tqeng", {"batch_size": 2},
                                 root=str(tmp_path / "exp"))

    def build(flavor):
        ev = VaseEvaluator(exp_path, dataset_name="ccoimages_final",
                           bbox_thr=0.5, max_dets=4,
                           detector_config="faster_rcnn_tiny", save=False)
        if flavor == "none":
            ev.detector, ev.det_cfg = det, det.config
        else:
            qdet = FasterRCNN(FASTER_RCNN_TINY, trunk_quant=flavor)
            ev.detector, ev.det_cfg = qdet, qdet.config
        ev.setup_models(config_name="tiny", pretrained=None)
        ev.det_state = ev.det_state.replace(
            params=trained["params"], batch_stats=trained["batch_stats"])
        ev.det_state = apply_trunk_flavor(ev.detector, ev.det_cfg,
                                          ev.det_state)
        return ev

    images = np.asarray(detector_scene_batch["image"])
    live = build("none").process_images(images)
    fold = build("folded").process_images(images)
    assert len(live) == len(fold) == len(images)
    assert sum(len(r["boxes"]) for r in live) > 0
    for a, b in zip(live, fold):
        assert len(a["boxes"]) == len(b["boxes"])
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-3)
        np.testing.assert_allclose(a["image_keypoints"],
                                   b["image_keypoints"], atol=2e-3)
