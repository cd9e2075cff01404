"""Fast (patch + banded-matmul) FPN RoIAlign vs the all-level+mask
reference formulation: must be numerically equivalent for every box the
detector can produce, including extreme aspect ratios, edge-clipped and
degenerate boxes."""

import numpy as np
import jax.numpy as jnp
import pytest

from stlpose_tpu.ops.roi_align import (multilevel_roi_align,
                                       multilevel_roi_align_reference)

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


def test_random_boxes_match_reference():
    rng = np.random.RandomState(0)
    img = 256
    feats = _pyramid(rng, img)
    boxes = _random_boxes(rng, 64, img)
    ref = multilevel_roi_align_reference(feats, boxes, STRIDES)
    out = multilevel_roi_align(feats, boxes, STRIDES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_extreme_aspect_and_edge_boxes():
    rng = np.random.RandomState(1)
    img = 256
    feats = _pyramid(rng, img)
    boxes = jnp.asarray([
        [0.0, 0.0, 255.0, 10.0],        # 25:1 wide, hugging the top edge
        [240.0, 0.0, 256.0, 256.0],     # 16:1 tall at the right edge
        [0.0, 0.0, 256.0, 256.0],       # whole image
        [0.0, 100.0, 256.0, 130.0],     # wide band
        [10.0, 10.0, 11.0, 11.0],       # tiny
        [5.0, 5.0, 5.0, 5.0],           # degenerate (zero area)
        [200.0, 200.0, 256.0, 256.0],   # bottom-right corner
    ], jnp.float32)
    ref = multilevel_roi_align_reference(feats, boxes, STRIDES)
    out = multilevel_roi_align(feats, boxes, STRIDES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("img", [128, 400])
def test_other_image_sizes(img):
    rng = np.random.RandomState(2)
    feats = [jnp.asarray(
        rng.randn((img + s - 1) // s, (img + s - 1) // s, 16)
        .astype(np.float32)) for s in STRIDES]
    boxes = _random_boxes(rng, 32, img)
    ref = multilevel_roi_align_reference(feats, boxes, STRIDES)
    out = multilevel_roi_align(feats, boxes, STRIDES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
