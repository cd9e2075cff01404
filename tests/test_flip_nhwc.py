"""NHWC flip-TTA equals the NJHW reference path."""

import numpy as np

import jax.numpy as jnp

from stlpose_tpu.ops.flip import (average_flip_tta, average_flip_tta_nhwc,
                                  flip_back, flip_back_nhwc)


def test_flip_back_layouts_agree(rng):
    hm = rng.rand(2, 16, 12, 17).astype(np.float32)       # NHWC
    njhw = jnp.transpose(jnp.asarray(hm), (0, 3, 1, 2))
    a = np.asarray(flip_back(njhw))
    b = np.asarray(jnp.transpose(flip_back_nhwc(jnp.asarray(hm)),
                                 (0, 3, 1, 2)))
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_tta_layouts_agree(rng):
    d = rng.rand(2, 16, 12, 17).astype(np.float32)
    f = rng.rand(2, 16, 12, 17).astype(np.float32)
    ref = np.asarray(average_flip_tta(
        jnp.transpose(jnp.asarray(d), (0, 3, 1, 2)),
        jnp.transpose(jnp.asarray(f), (0, 3, 1, 2))))
    got = np.asarray(jnp.transpose(
        average_flip_tta_nhwc(jnp.asarray(d), jnp.asarray(f)),
        (0, 3, 1, 2)))
    np.testing.assert_allclose(got, ref, atol=1e-7)
