"""Pallas fused decode kernel vs the XLA decode path (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stlpose_tpu.ops.decode import decode_heatmaps_nhwc, decode_heatmaps
from stlpose_tpu.ops.pallas_decode import (heatmap_peaks_pallas,
                                           decode_heatmaps_pallas)


class TestPallasDecode:
    def test_matches_xla_decode(self, rng):
        hm = rng.uniform(0, 1, (6, 64, 48, 17)).astype(np.float32)
        center = rng.uniform(100, 300, (6, 2)).astype(np.float32)
        scale = rng.uniform(0.8, 2.0, (6, 2)).astype(np.float32)
        p_ref, m_ref, c_ref = decode_heatmaps_nhwc(jnp.asarray(hm),
                                                   center, scale)
        p_pl, m_pl, c_pl = decode_heatmaps_pallas(jnp.asarray(hm),
                                                  center, scale,
                                                  interpret=True)
        np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(p_pl), np.asarray(p_ref),
                                   rtol=1e-5, atol=1e-4)

    def test_negative_peaks_masked(self):
        hm = -np.ones((1, 64, 48, 17), np.float32)
        coords, maxvals = heatmap_peaks_pallas(jnp.asarray(hm),
                                               interpret=True)
        # all peaks <= 0 -> coords zeroed (reference mask semantics)
        np.testing.assert_allclose(np.asarray(coords), 0.0)

    def test_nhwc_layout_matches_njhw_decode(self, rng):
        hm_nhwc = rng.uniform(0, 1, (3, 64, 48, 17)).astype(np.float32)
        center = rng.uniform(100, 300, (3, 2)).astype(np.float32)
        scale = np.ones((3, 2), np.float32)
        hm_njhw = hm_nhwc.transpose(0, 3, 1, 2)
        p1, m1, c1 = decode_heatmaps(jnp.asarray(hm_njhw), center, scale)
        p2, m2, c2 = decode_heatmaps_pallas(jnp.asarray(hm_nhwc), center,
                                            scale, interpret=True)
        np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   rtol=1e-5, atol=1e-4)
