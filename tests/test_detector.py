"""Detector stage: box ops, RoIAlign, anchors/matching/sampling, Faster
R-CNN train/predict, detector engines, and the two-stage pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.ops.boxes import (box_iou, encode_boxes, decode_boxes,
                                   clip_boxes, smooth_l1)
from stlpose_tpu.ops.roi_align import roi_align_single_level
from stlpose_tpu.models.faster_rcnn import (FasterRCNN, FASTER_RCNN_TINY,
                                            generate_anchors, match_to_gt,
                                            sample_balanced)


class TestBoxOps:
    def test_iou_known_values(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15],
                         [20, 20, 30, 30]], jnp.float32)
        iou = np.asarray(box_iou(a, b))[0]
        assert iou[0] == pytest.approx(1.0)
        assert iou[1] == pytest.approx(25 / 175)
        assert iou[2] == 0.0

    def test_encode_decode_roundtrip(self, rng):
        props = rng.uniform(0, 200, (16, 2))
        props = np.concatenate([props, props + rng.uniform(20, 80, (16, 2))],
                               axis=1).astype(np.float32)
        gts = rng.uniform(0, 200, (16, 2))
        gts = np.concatenate([gts, gts + rng.uniform(20, 80, (16, 2))],
                             axis=1).astype(np.float32)
        deltas = encode_boxes(jnp.asarray(gts), jnp.asarray(props))
        back = decode_boxes(deltas, jnp.asarray(props))
        np.testing.assert_allclose(np.asarray(back), gts, rtol=1e-4,
                                   atol=1e-2)

    def test_smooth_l1_regimes(self):
        beta = 1.0 / 9.0
        small = float(smooth_l1(jnp.asarray(0.05), jnp.asarray(0.0), beta))
        assert small == pytest.approx(0.5 * 0.05 ** 2 / beta)
        big = float(smooth_l1(jnp.asarray(2.0), jnp.asarray(0.0), beta))
        assert big == pytest.approx(2.0 - 0.5 * beta)


class TestRoIAlign:
    def test_constant_map(self):
        feat = jnp.full((16, 16, 4), 3.5)
        boxes = jnp.asarray([[2, 2, 10, 10], [0, 0, 16, 16]], jnp.float32)
        out = roi_align_single_level(feat, boxes, output_size=7)
        assert out.shape == (2, 7, 7, 4)
        np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)

    def test_linear_ramp_center_values(self):
        # feature value = x coordinate; pooled bins should average their
        # bin-center x positions
        xs = jnp.arange(32, dtype=jnp.float32)
        feat = jnp.tile(xs[None, :, None], (32, 1, 1))
        boxes = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
        out = np.asarray(roi_align_single_level(feat, boxes, output_size=4,
                                                sampling_ratio=2))[0, :, :, 0]
        # bin k covers x in [8+4k, 12+4k]; mean sample position = 10+4k;
        # aligned=False samples the array index directly, so value = x
        expected = np.array([10.0, 14.0, 18.0, 22.0])
        np.testing.assert_allclose(out.mean(axis=0), expected, atol=0.1)

    def test_matches_torchvision_semantics_oracle(self, rng):
        from tests.oracle import roi_align_oracle

        H, W, C = 20, 24, 3
        feat = rng.randn(H, W, C).astype(np.float32)
        boxes = np.stack([
            rng.uniform(-2, W - 4, 12), rng.uniform(-2, H - 4, 12),
            rng.uniform(2, W + 2, 12), rng.uniform(2, H + 2, 12)],
            axis=1).astype(np.float32)
        boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 0.5)
        boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 0.5)
        got = np.asarray(roi_align_single_level(
            jnp.asarray(feat), jnp.asarray(boxes), output_size=5,
            sampling_ratio=2, spatial_scale=0.5))
        want = roi_align_oracle(feat, boxes, output_size=5,
                                sampling_ratio=2, spatial_scale=0.5)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestAnchorsMatching:
    def test_anchor_counts(self):
        cfg = FASTER_RCNN_TINY
        shapes = [(32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]
        anchors = generate_anchors(cfg, shapes)
        assert len(anchors) == 5
        assert anchors[0].shape == (32 * 32 * 3, 4)

    def test_match_rules(self):
        anchors = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110],
                               [4, 4, 14, 14]], jnp.float32)
        gts = jnp.asarray([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
        mask = jnp.asarray([1.0, 0.0])
        labels, matched = match_to_gt(anchors, gts, mask, 0.7, 0.3)
        labels = np.asarray(labels)
        assert labels[0] == 1          # exact overlap
        assert labels[1] == 0          # no overlap -> negative
        assert int(matched[0]) == 0    # padded GT never matched

    def test_sample_balanced_caps(self):
        labels = jnp.asarray([1] * 10 + [0] * 500 + [-1] * 10)
        pos, neg = sample_balanced(labels, jax.random.PRNGKey(0), 256, 0.5)
        assert int(pos.sum()) == 10            # fewer positives than cap
        assert int(neg.sum()) == 256 - 10      # negatives fill remainder
        assert not bool((np.asarray(pos) & (np.asarray(labels) != 1)).any())


@pytest.fixture(scope="module")
def tiny_detector():
    det = FasterRCNN(FASTER_RCNN_TINY)
    variables = det.init(jax.random.PRNGKey(0))
    return det, variables


class TestFasterRCNN:
    def test_overfit_single_image(self, tiny_detector, rng):
        import optax

        det, variables = tiny_detector
        S = FASTER_RCNN_TINY.image_size
        img = rng.rand(1, S, S, 3).astype(np.float32) * 0.1
        img[0, 30:90, 20:100] += 0.8            # bright "person"
        batch = {"image": jnp.asarray(img),
                 "boxes": jnp.asarray([[[20, 30, 100, 90]]], jnp.float32),
                 "labels": jnp.ones((1, 1), jnp.int32),
                 "box_mask": jnp.ones((1, 1), jnp.float32)}

        tx = optax.adam(1e-3)
        params = variables["params"]
        stats = variables["batch_stats"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, stats, opt_state, rng):
            def lf(p):
                total, (ld, new_stats) = det.loss_fn(
                    {"params": p, "batch_stats": stats}, batch, rng)
                return total, new_stats
            (loss, new_stats), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), new_stats,
                    opt_state, loss)

        # 150 steps: the 60- and 90-step runs were trajectory-marginal —
        # last-ulp-equivalent RoIAlign/box-head reformulations (and the
        # 1- vs 8-device CPU compile) flipped the post-NMS detection at
        # this seed; by 150 steps the box is found with IoU ~0.9 across
        # every numerically-equivalent formulation probed
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(150):
            key, sub = jax.random.split(key)
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  sub)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

        dets = det.predict({"params": params, "batch_stats": stats},
                           batch["image"])
        boxes = np.asarray(dets["boxes"][0])
        scores = np.asarray(dets["scores"][0])
        valid = np.asarray(dets["valid"][0])
        assert valid.any()
        best = boxes[np.argmax(np.where(valid, scores, -1))]
        iou = np.asarray(box_iou(jnp.asarray(best[None]),
                                 jnp.asarray([[20, 30, 100, 90]],
                                             jnp.float32)))[0, 0]
        assert iou > 0.25, (best, iou)

    def test_predict_shapes_and_padding(self, tiny_detector, rng):
        det, variables = tiny_detector
        S = FASTER_RCNN_TINY.image_size
        imgs = jnp.asarray(rng.rand(2, S, S, 3), jnp.float32)
        out = det.predict(variables, imgs)
        D = FASTER_RCNN_TINY.detections_per_img
        assert out["boxes"].shape == (2, D, 4)
        assert out["scores"].shape == (2, D)
        assert bool((np.asarray(out["scores"]) >= 0).all())


class TestDetectorEngine:
    @pytest.mark.parametrize("family", ["faster_rcnn_tiny",
                                        "efficientdet_tiny"])
    def test_ap_plateau_training_loop(self, tmp_path, rng, family):
        """3-epoch train -> AP-validate -> plateau-on-AP cycle for BOTH
        detector families (VERDICT r1 item 9; reference loop:
        02_train_faster_rcnn.py:153-158,241-280)."""
        from stlpose_tpu.engines.detector_trainer import DetectorTrainer
        from stlpose_tpu.train.optim import (get_current_lr,
                                             PlateauScheduler)
        from stlpose_tpu.utils.experiment import create_experiment
        from tests.fixtures import make_coco_dataset
        import json, os

        data = tmp_path / "data"
        make_coco_dataset(str(data), n_train=4, n_val=2, img_hw=(128, 160))
        exp_path = create_experiment(
            "det", {"batch_size": 2, "num_epochs": 3, "save_frequency": 1,
                    "patience": 0, "learning_rate_factor": 0.5,
                    "learning_rate": 1e-3},
            root=str(tmp_path / "exp"))
        tr = DetectorTrainer(exp_path, data_path=str(data), num_workers=2,
                             detector_config=family)
        tr.load_dataset()
        tr.setup_model()
        tr.training_loop()

        logs = json.load(open(os.path.join(exp_path, "detector_logs.json")))
        assert len(logs["train_loss"]) == 3
        assert all(np.isfinite(v) for v in logs["train_loss"])
        # AP computed every epoch (COCO stat: -1 when undefined, else [0,1])
        assert len(logs["valid_ap"]) == 3
        assert all(-1.0 <= v <= 1.0 for v in logs["valid_ap"])
        det_ckpts = os.listdir(os.path.join(exp_path, "models", "detector"))
        assert any("final" in c for c in det_ckpts)

        # plateau-on-AP (mode max, patience 0): the live LR must equal a
        # replay of the scheduler over the recorded AP trajectory
        sim = PlateauScheduler(factor=0.5, patience=0)
        lr = 1e-3
        for ap in logs["valid_ap"]:
            lr = sim.step(ap, lr)
        assert get_current_lr(tr.state.opt_state) == pytest.approx(lr)


def test_torchvision_parity_preset():
    """The AP-parity eval preset must carry torchvision
    fasterrcnn_resnet50_fpn's proposal/detection budgets exactly
    (reference: lib/model_setup.py:70-73 uses torchvision defaults) while
    the bare config keeps the documented tighter serving budgets."""
    from stlpose_tpu.models.faster_rcnn import (
        FasterRCNNConfig, FASTER_RCNN_TORCHVISION_PARITY)
    from stlpose_tpu.engines.detector_trainer import DETECTOR_CONFIGS

    p = FASTER_RCNN_TORCHVISION_PARITY
    assert (p.pre_nms_top_n_test, p.post_nms_top_n_test) == (1000, 1000)
    assert (p.pre_nms_top_n_train, p.post_nms_top_n_train) == (2000, 2000)
    assert p.detections_per_img == 100
    assert p.score_thresh == 0.05 and p.nms_thresh == 0.5
    # everything not a budget matches the default config (same network)
    d = FasterRCNNConfig()
    for f in ("num_classes", "image_size", "anchor_sizes", "strides",
              "fpn_channels", "box_weights"):
        assert getattr(p, f) == getattr(d, f)
    det, cfg = DETECTOR_CONFIGS["faster_rcnn_torchvision_parity"]()
    assert cfg is FASTER_RCNN_TORCHVISION_PARITY
    assert det.config.detections_per_img == 100
