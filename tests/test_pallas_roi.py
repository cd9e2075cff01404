"""Fused Pallas RoIAlign kernel vs the XLA formulation (itself pinned to
the all-level+mask reference): interpret-mode equivalence across random
geometry, extreme aspects, edges, and degenerate boxes."""

import numpy as np
import jax.numpy as jnp
import pytest

from stlpose_tpu.ops.roi_align import (multilevel_roi_align,
                                       multilevel_roi_align_reference)
from stlpose_tpu.ops.pallas_roi import multilevel_roi_align_pallas

STRIDES = (4, 8, 16, 32)


def _pyramid(rng, img, C=24):
    return [jnp.asarray(rng.randn(img // s, img // s, C).astype(np.float32))
            for s in STRIDES]


def _random_boxes(rng, P, img):
    x1 = rng.uniform(0, img - 2, P)
    y1 = rng.uniform(0, img - 2, P)
    w = rng.uniform(1, img, P)
    h = rng.uniform(1, img, P)
    x2 = np.minimum(x1 + w, img)
    y2 = np.minimum(y1 + h, img)
    return jnp.asarray(np.stack([x1, y1, x2, y2], -1), jnp.float32)


@pytest.mark.parametrize("mode", ["band", "pp"])
def test_random_boxes_match_xla_and_reference(mode):
    rng = np.random.RandomState(0)
    img = 256
    feats = _pyramid(rng, img)
    boxes = _random_boxes(rng, 40, img)
    out = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                      interpret=True, mode=mode)
    xla = multilevel_roi_align(feats, boxes, STRIDES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla),
                               atol=1e-4, rtol=1e-4)
    ref = multilevel_roi_align_reference(feats, boxes, STRIDES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_extreme_aspect_edge_and_degenerate_boxes():
    rng = np.random.RandomState(1)
    img = 256
    feats = _pyramid(rng, img)
    boxes = jnp.asarray([
        [0.0, 0.0, 255.0, 10.0],
        [240.0, 0.0, 256.0, 256.0],
        [0.0, 0.0, 256.0, 256.0],
        [0.0, 100.0, 256.0, 130.0],
        [10.0, 10.0, 11.0, 11.0],
        [5.0, 5.0, 5.0, 5.0],
        [200.0, 200.0, 256.0, 256.0],
    ], jnp.float32)
    out = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                      interpret=True)
    ref = multilevel_roi_align_reference(feats, boxes, STRIDES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_far_edge_level2_windows():
    """Regression: at the 400px geometry the level-2 map has 100 rows and
    a box whose short-axis window sits past row ~70 has NO 16-aligned
    48-row window inside 104 padded rows — the first hardware run
    silently zeroed those rows for every level-2 edge box. The extra
    ALIGN row padding must make these exact."""
    rng = np.random.RandomState(3)
    img = 400
    feats = [jnp.asarray(
        rng.randn((img + s - 1) // s, (img + s - 1) // s, 16)
        .astype(np.float32)) for s in STRIDES]
    # small (level-2) boxes hugging the bottom/right edges, plus corner
    boxes = jnp.asarray([
        [370.0, 250.0, 400.0, 295.0],
        [170.0, 390.0, 280.0, 400.0],
        [380.0, 295.0, 400.0, 400.0],
        [360.0, 80.0, 400.0, 225.0],
        [390.0, 390.0, 400.0, 400.0],
        [0.0, 370.0, 45.0, 400.0],
    ], jnp.float32)
    out = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                      interpret=True)
    ref = multilevel_roi_align_reference(feats, boxes, STRIDES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_shard_map_predict_matches_gspmd():
    """The shard_map predict path (what a multi-chip Pallas detector
    uses — GSPMD has no rule for the Mosaic call, but predict is purely
    local per shard) must return the same detections as the GSPMD path."""
    import jax
    import pytest
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from stlpose_tpu.parallel import get_mesh
    from stlpose_tpu.parallel.detector_steps import make_detector_predict
    from stlpose_tpu.train import create_train_state
    from stlpose_tpu.engines.detector_trainer import _DetectorModelShim
    from stlpose_tpu.config import default_experiment_args

    mesh = get_mesh()
    if mesh.devices.size <= 1:
        pytest.skip("needs a multi-device mesh")
    det = FasterRCNN(FASTER_RCNN_TINY)
    state, _ = create_train_state(_DetectorModelShim(det),
                                  default_experiment_args(),
                                  jax.random.PRNGKey(0), (1,))
    S = FASTER_RCNN_TINY.image_size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(mesh.devices.size, S, S, 3), jnp.float32)
    p_gspmd = make_detector_predict(det, mesh, use_shard_map=False)
    p_smap = make_detector_predict(det, mesh, use_shard_map=True)
    a = {k: np.asarray(v) for k, v in p_gspmd(state, imgs).items()}
    b = {k: np.asarray(v) for k, v in p_smap(state, imgs).items()}
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)


def _all_regimes(rng, img, C=24):
    """(feats, dict of box regimes) covering random / extreme-aspect /
    far-edge / chunk-boundary — the same adversarial set the hardware
    validation script uses."""
    feats = [jnp.asarray(
        rng.randn((img + s - 1) // s, (img + s - 1) // s, C)
        .astype(np.float32)) for s in STRIDES]
    return feats, {
        "random": _random_boxes(rng, 40, img),
        "extreme": jnp.asarray([
            [0.0, 0.0, img - 1.0, 10.0],
            [img - 20.0, 0.0, float(img), float(img)],
            [0.0, 0.0, float(img), float(img)],
            [0.0, 100.0, float(img), 130.0],
            [10.0, 10.0, 11.0, 11.0],
            [5.0, 5.0, 5.0, 5.0],
        ], jnp.float32),
        "far_edge": jnp.asarray([
            [img - 30.0, img * 0.6, float(img), img * 0.75],
            [img * 0.4, img - 10.0, img * 0.7, float(img)],
            [img - 10.0, img - 10.0, float(img), float(img)],
        ], jnp.float32),
        "chunk_13": _random_boxes(rng, 13, img),
    }


def test_pp_mode_matches_xla():
    """The per-point-DMA formulation ("pp": ns small (SHORT, 2C) copies
    per box + one fused MXU dot) must agree with the XLA formulation on
    every adversarial regime, like the band kernel does."""
    rng = np.random.RandomState(7)
    feats, regimes = _all_regimes(rng, 400)
    for name, boxes in regimes.items():
        out = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                          interpret=True, mode="pp")
        ref = multilevel_roi_align(feats, boxes, STRIDES)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("block", [2, 4])
def test_pp_blocked_matches_unblocked(block):
    """The blocked pp kernel (KB boxes per grid step, round 5b) keeps the
    per-box arithmetic unchanged — outputs must match the KB=1 kernel and
    the XLA formulation on every adversarial regime, with and without the
    int8 patch pyramid."""
    rng = np.random.RandomState(17)
    feats, regimes = _all_regimes(rng, 400)
    for name, boxes in regimes.items():
        blk = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                          interpret=True,
                                          mode=f"pp{block}")
        ref = multilevel_roi_align(feats, boxes, STRIDES)
        np.testing.assert_allclose(np.asarray(blk), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4, err_msg=name)
        bq = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                         interpret=True,
                                         mode=f"pp{block}",
                                         patch_quant=True)
        uq = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                         interpret=True, mode="pp1",
                                         patch_quant=True)
        np.testing.assert_array_equal(np.asarray(bq), np.asarray(uq),
                                      err_msg=name)


@pytest.mark.parametrize("mode", ["band", "pp"])
def test_patch_quant_matches_dequantized_oracle(mode):
    """int8 patch pyramid: the kernel's post-pooling per-channel dequant
    must EXACTLY equal RoIAlign run on host-dequantized features (the
    only error is the int8 rounding of the features themselves, which
    the oracle shares)."""
    rng = np.random.RandomState(11)
    feats, regimes = _all_regimes(rng, 256)
    # host oracle: identical quantize/dequantize, then the exact path
    deq = []
    for f in feats:
        s = jnp.maximum(jnp.abs(f.astype(jnp.float32)).max(axis=(0, 1)),
                        1e-8) / 127.0
        q = jnp.clip(jnp.round(f.astype(jnp.float32) / s), -127, 127)
        deq.append((q * s).astype(f.dtype))
    for name, boxes in regimes.items():
        out = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                          interpret=True, mode=mode,
                                          patch_quant=True)
        ref = multilevel_roi_align(deq, boxes, STRIDES)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_patch_quant_rounding_error_is_bounded():
    """The int8 feature rounding itself must stay within the analytic
    half-step bound relative to the unquantized output."""
    rng = np.random.RandomState(13)
    feats, _ = _all_regimes(rng, 256)
    boxes = _random_boxes(rng, 64, 256)
    out_q = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                        interpret=True, mode="pp",
                                        patch_quant=True)
    out = multilevel_roi_align(feats, boxes, STRIDES)
    # per-channel bound: half an int8 step of that channel's absmax
    half_step = max(float(jnp.abs(f).max()) for f in feats) / 254.0
    err = float(jnp.abs(out_q - out).max())
    assert err <= half_step * 1.01, (err, half_step)


def test_chunk_boundary_padding():
    """P not a multiple of the chunk size exercises the zero-padded tail
    boxes; result rows beyond P must simply be dropped."""
    rng = np.random.RandomState(2)
    img = 128
    feats = [jnp.asarray(
        rng.randn((img + s - 1) // s, (img + s - 1) // s, 16)
        .astype(np.float32)) for s in STRIDES]
    boxes = _random_boxes(rng, 13, img)
    out = multilevel_roi_align_pallas(feats, boxes, STRIDES,
                                      interpret=True)
    ref = multilevel_roi_align_reference(feats, boxes, STRIDES)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
