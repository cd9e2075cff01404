"""EfficientDet detector family: backbone shapes, BiFPN, focal training,
predict protocol compatibility with the detector engines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.models.efficientnet import EfficientNet, round_filters
from stlpose_tpu.models.efficientdet import (EfficientDet, EFFICIENTDET_TINY,
                                             generate_det_anchors,
                                             _focal_loss)


class TestEfficientNet:
    def test_feature_strides(self):
        net = EfficientNet(width_mult=0.35, depth_mult=0.35)
        x = jnp.zeros((1, 128, 128, 3))
        v = net.init(jax.random.PRNGKey(0), x, train=False)
        feats = net.apply(v, x, train=False)
        assert len(feats) == 3
        assert feats[0].shape[1] == 16      # stride 8
        assert feats[1].shape[1] == 8       # stride 16
        assert feats[2].shape[1] == 4       # stride 32

    def test_round_filters(self):
        assert round_filters(32, 1.0) == 32
        assert round_filters(32, 1.2) == 40


class TestAnchors:
    def test_anchor_count(self):
        cfg = EFFICIENTDET_TINY
        shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
        anchors = generate_det_anchors(cfg, shapes)
        total = sum(h * w for h, w in shapes) * 9
        assert anchors.shape == (total, 4)

    def test_focal_loss_extremes(self):
        # confident-correct -> tiny loss; confident-wrong -> large
        good = float(_focal_loss(jnp.asarray(8.0), jnp.asarray(1.0),
                                 0.25, 1.5))
        bad = float(_focal_loss(jnp.asarray(8.0), jnp.asarray(0.0),
                                0.25, 1.5))
        assert good < 1e-3 < bad


@pytest.fixture(scope="module")
def tiny_det():
    det = EfficientDet(EFFICIENTDET_TINY)
    variables = det.init(jax.random.PRNGKey(0))
    return det, variables


class TestEfficientDet:
    def test_loss_and_predict_protocol(self, tiny_det, rng):
        det, variables = tiny_det
        S = EFFICIENTDET_TINY.image_size
        batch = {
            "image": jnp.asarray(rng.rand(2, S, S, 3), jnp.float32),
            "boxes": jnp.asarray([[[10, 10, 70, 90]], [[0, 0, 0, 0]]],
                                 jnp.float32),
            "labels": jnp.ones((2, 1), jnp.int32),
            "box_mask": jnp.asarray([[1.0], [0.0]]),
        }
        total, (ld, stats) = jax.jit(
            lambda v, b: det.loss_fn(v, b, None))(variables, batch)
        assert np.isfinite(float(total))
        assert set(ld) == {"loss_classifier", "loss_box_reg"}

        out = jax.jit(lambda v, im: det.predict(v, im))(
            variables, batch["image"])
        D = EFFICIENTDET_TINY.detections_per_img
        assert out["boxes"].shape == (2, D, 4)
        assert out["labels"].dtype == jnp.int32

    def test_overfit_single_box(self, rng):
        import dataclasses
        import optax
        from stlpose_tpu.ops.boxes import box_iou

        cfg = dataclasses.replace(EFFICIENTDET_TINY, score_thresh=0.01)
        det = EfficientDet(cfg)
        variables = det.init(jax.random.PRNGKey(0))
        S = EFFICIENTDET_TINY.image_size
        img = rng.rand(1, S, S, 3).astype(np.float32) * 0.1
        img[0, 20:100, 30:110] += 0.8
        batch = {"image": jnp.asarray(img),
                 "boxes": jnp.asarray([[[30, 20, 110, 100]]], jnp.float32),
                 "labels": jnp.ones((1, 1), jnp.int32),
                 "box_mask": jnp.ones((1, 1), jnp.float32)}
        tx = optax.adam(1e-3)
        params, stats = variables["params"], variables["batch_stats"]
        opt = tx.init(params)

        @jax.jit
        def step(params, stats, opt):
            def lf(p):
                total, (_, ns) = det.loss_fn(
                    {"params": p, "batch_stats": stats}, batch, None)
                return total, ns
            (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(params)
            u, opt = tx.update(g, opt)
            return optax.apply_updates(params, u), ns, opt, loss

        losses = []
        for _ in range(100):
            params, stats, opt, loss = step(params, stats, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

        out = det.predict({"params": params, "batch_stats": stats},
                          batch["image"])
        scores = np.asarray(out["scores"][0])
        boxes = np.asarray(out["boxes"][0])
        valid = np.asarray(out["valid"][0])
        assert valid.any()
        best = boxes[np.argmax(np.where(valid, scores, -1))]
        iou = float(np.asarray(box_iou(
            jnp.asarray(best[None]),
            jnp.asarray([[30, 20, 110, 100]], jnp.float32)))[0, 0])
        assert iou > 0.25, (best, iou)

    def test_engine_swaps_detector_family(self, tmp_path):
        from stlpose_tpu.engines.detector_trainer import build_detector
        from stlpose_tpu.config import default_experiment_args

        exp = default_experiment_args()
        exp["model"]["detector_name"] = "efficientdet"
        exp["model"]["detector_type"] = "d0"
        det, cfg = build_detector(exp)
        assert cfg.image_size == 512
        det2, cfg2 = build_detector(exp, "efficientdet_tiny")
        assert cfg2.image_size == 128
