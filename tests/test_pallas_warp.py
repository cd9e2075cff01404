"""Pallas two-pass affine warp kernel (ops/pallas_warp.py), interpret mode.

Pins the kernel's contract (see the module docstring's exactness notes):
  * rot=0 (the entire inference/eval path): mathematically identical to the
    direct-bilinear XLA warp (ops/warp.py) -> f32-roundoff agreement.
  * rot=+-90 deg: the conditioning pre-rotation is a pixel permutation and
    the residual shear is zero -> exact again.
  * rotated (train augmentation): a different member of the bilinear filter
    family; must agree with direct bilinear on in-bounds low-frequency
    content and track the same geometry (checked via a warped coordinate
    ramp, which both schemes interpolate exactly).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stlpose_tpu.ops.warp import affine_warp
from stlpose_tpu.ops.pallas_warp import affine_warp_pallas

OUT = (192, 256)


def _params(n, s, lo=110, hi_margin=110, scale=0.35, seed=0):
    rng = np.random.RandomState(seed)
    cen = jnp.asarray(rng.uniform(lo, s - hi_margin, (n, 2)).astype(np.float32))
    sca = jnp.asarray(np.full((n, 2), scale, np.float32))
    return cen, sca


def test_rot0_matches_direct_bilinear_exactly():
    rng = np.random.RandomState(1)
    n, s = 3, 256
    imgs = jnp.asarray(rng.rand(n, s, s, 3).astype(np.float32) * 255)
    cen, sca = _params(n, s, lo=60, hi_margin=60, scale=0.8)
    zero = jnp.zeros((n,), jnp.float32)
    ref = affine_warp(imgs, cen, sca, zero, OUT)
    out = affine_warp_pallas(imgs, cen, sca, zero, OUT, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=0)


@pytest.mark.parametrize("deg", [90.0, -90.0])
def test_rot90_exact_via_prerotation(deg):
    rng = np.random.RandomState(2)
    n, s = 2, 256
    imgs = jnp.asarray(rng.rand(n, s, s, 3).astype(np.float32) * 255)
    cen, sca = _params(n, s)
    rot = jnp.full((n,), deg, jnp.float32)
    ref = affine_warp(imgs, cen, sca, rot, OUT)
    out = affine_warp_pallas(imgs, cen, sca, rot, OUT, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=0)


@pytest.mark.parametrize("deg", [15.0, 40.0, -60.0, 75.0])
def test_rotated_geometry_exact_on_linear_ramps(deg):
    """Bilinear interpolation (either scheme) reproduces affine-linear
    images exactly, so a coordinate ramp pins the GEOMETRY of the rotated
    path to the direct-bilinear warp without filter-scheme sensitivity."""
    n, s = 2, 256
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    ramp = np.stack([xx, yy, xx + yy], -1)
    imgs = jnp.asarray(np.tile(ramp[None], (n, 1, 1, 1)))
    cen, sca = _params(n, s)
    rot = jnp.full((n,), deg, jnp.float32)
    ref = affine_warp(imgs, cen, sca, rot, OUT)
    out = affine_warp_pallas(imgs, cen, sca, rot, OUT, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=0)


@pytest.mark.parametrize("deg", [15.0, 40.0, -60.0])
def test_rotated_close_on_smooth_content(deg):
    n, s = 2, 256
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    smooth = np.stack([np.sin(xx / 40) * np.cos(yy / 37), xx / s, yy / s],
                      -1) * 100.0
    imgs = jnp.asarray(np.tile(smooth[None], (n, 1, 1, 1)))
    cen, sca = _params(n, s)
    rot = jnp.full((n,), deg, jnp.float32)
    ref = affine_warp(imgs, cen, sca, rot, OUT)
    out = affine_warp_pallas(imgs, cen, sca, rot, OUT, interpret=True)
    d = float(jnp.max(jnp.abs(ref - out)))
    assert d < 0.05, d                      # ~0.01% of the value range


def test_zero_padding_outside_canvas():
    """Crops hanging off the canvas edge must be zero there (cv2
    BORDER_CONSTANT(0) semantics), for both schemes."""
    n, s = 1, 256
    imgs = jnp.ones((n, s, s, 3), jnp.float32) * 7.0
    cen = jnp.asarray([[10.0, 10.0]], jnp.float32)      # far corner
    sca = jnp.asarray([[1.2, 1.2]], jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    ref = affine_warp(imgs, cen, sca, zero, OUT)
    out = affine_warp_pallas(imgs, cen, sca, zero, OUT, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=0)
    assert float(jnp.min(out)) == 0.0


def test_crop_from_center_scale_pallas_exact(monkeypatch):
    """Two-stage crops (rot=0, shared canvas, non-square source) are exact
    vs the XLA direct-bilinear path, including out-of-canvas zero pad."""
    from stlpose_tpu.ops.pallas_warp import crop_from_center_scale_pallas
    from stlpose_tpu.ops.warp import crop_from_center_scale

    rng = np.random.RandomState(3)
    H, W = 300, 420                                # pads to 512x512
    img = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 255)
    boxes_c = jnp.asarray(
        np.stack([rng.uniform(0, W, 6), rng.uniform(0, H, 6)], -1),
        jnp.float32)
    scales = jnp.asarray(rng.uniform(0.3, 1.5, (6, 2)).astype(np.float32))
    out = crop_from_center_scale_pallas(img, boxes_c, scales, OUT,
                                        interpret=True)
    monkeypatch.setenv("STLPOSE_PALLAS_WARP", "0")
    ref = crop_from_center_scale(img, boxes_c, scales, OUT)
    # nested-lerp vs 4-tap-sum f32 rounding only (~3e-5 relative at 255)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=0)


def test_crop_from_center_scale_batched_pallas_exact(monkeypatch):
    """Cross-batch compaction crops (K crops from B canvases, rot=0) are
    exact vs the XLA gather+warp path, and each crop reads the RIGHT
    canvas (index-map canvas selection from the prefetched img_idx)."""
    from stlpose_tpu.ops.pallas_warp import (
        crop_from_center_scale_batched_pallas)
    from stlpose_tpu.ops.warp import crop_from_center_scale_batched

    rng = np.random.RandomState(7)
    B, H, W = 3, 250, 330                          # pads to 384x384
    imgs = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    K = 8
    cen = jnp.asarray(
        np.stack([rng.uniform(0, W, K), rng.uniform(0, H, K)], -1),
        jnp.float32)
    sca = jnp.asarray(rng.uniform(0.3, 1.5, (K, 2)).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, B, K), jnp.int32)
    out = crop_from_center_scale_batched_pallas(imgs, cen, sca, idx, OUT,
                                                interpret=True)
    ref = crop_from_center_scale_batched(imgs, cen, sca, idx, OUT,
                                         use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=0)
    # canvas selection really differs per crop: same geometry on another
    # canvas yields different pixels
    other = crop_from_center_scale_batched_pallas(
        imgs, cen, sca, (idx + 1) % B, OUT, interpret=True)
    assert float(jnp.abs(out - other).max()) > 1.0


@pytest.mark.parametrize("s,c,n", [(128, 1, 1), (512, 3, 2)])
def test_kernel_shape_edges(s, c, n):
    """Minimal canvas (one 128-lane chunk), single channel, batch 1, and a
    larger canvas all go through the chunk/tile decomposition correctly."""
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.rand(n, s, s, c).astype(np.float32) * 255)
    cen = jnp.asarray(rng.uniform(s * 0.3, s * 0.7, (n, 2)).astype(np.float32))
    sca = jnp.asarray(np.full((n, 2), s / 800.0, np.float32))
    rot = jnp.asarray(rng.uniform(-50, 50, (n,)).astype(np.float32))
    zero = jnp.zeros((n,), jnp.float32)
    # rot=0 exact at every geometry
    ref = affine_warp(imgs, cen, sca, zero, OUT)
    out = affine_warp_pallas(imgs, cen, sca, zero, OUT, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=0)
    # rotated: finite and in-range (filter parity pinned elsewhere)
    out = affine_warp_pallas(imgs, cen, sca, rot, OUT, interpret=True)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 255.001


def test_may_rotate_false_matches_default_at_rot0():
    rng = np.random.RandomState(6)
    n, s = 2, 256
    imgs = jnp.asarray(rng.rand(n, s, s, 3).astype(np.float32) * 255)
    cen, sca = _params(n, s)
    zero = jnp.zeros((n,), jnp.float32)
    a = affine_warp_pallas(imgs, cen, sca, zero, OUT, interpret=True)
    b = affine_warp_pallas(imgs, cen, sca, zero, OUT, interpret=True,
                           may_rotate=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
