"""Style-transfer subsystem: VGG16 features + perceptual loss, AdaIN
stylizer, and the decoder training objective."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.models.vgg import (VGG16Features, torch_vgg16_to_flax,
                                    make_perceptual_loss_fn, VGG16_CONV_IDX,
                                    VGG16_CHANNELS)
from stlpose_tpu.models.adain import (AdaINStylizer, AdaINDecoder, adain,
                                      adain_train_losses,
                                      train_adain_decoder)


@pytest.fixture(scope="module")
def torch_vgg_pair():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    # torchvision vgg16.features layout rebuilt from the public spec
    layers, cin = [], 3
    pool_after = {1, 3, 6, 9, 12}
    for ci, cout in enumerate(VGG16_CHANNELS[:10]):   # up to relu4_3
        layers += [tnn.Conv2d(cin, cout, 3, padding=1), tnn.ReLU()]
        if ci in pool_after and ci != 9:
            layers.append(tnn.MaxPool2d(2, 2))
        cin = cout
    seq = tnn.Sequential(*layers).eval()
    # rename to torchvision's features.{orig_idx} naming
    state = {}
    conv_i = 0
    for m in seq:
        if isinstance(m, tnn.Conv2d):
            ti = VGG16_CONV_IDX[conv_i]
            state[f"features.{ti}.weight"] = m.weight.detach().numpy()
            state[f"features.{ti}.bias"] = m.bias.detach().numpy()
            conv_i += 1
    return seq, state


class TestVGG:
    def test_feature_parity_with_torch(self, torch_vgg_pair, rng):
        import torch
        seq, state = torch_vgg_pair
        vgg = VGG16Features(taps=(1, 3, 6, 9))
        variables = torch_vgg16_to_flax(state, taps=(1, 3, 6, 9))
        x = rng.rand(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref = seq(torch.from_numpy(x)).numpy()    # final tap (relu4_3)
        outs = vgg.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
        got = np.asarray(outs[-1]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        assert len(outs) == 4

    def test_perceptual_loss_zero_for_identical(self, rng):
        vgg = VGG16Features()
        v = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        fn = make_perceptual_loss_fn(vgg, v)
        x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
        out = np.asarray(fn(x, x))
        assert out.shape == (2,)
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_perceptual_loss_orders_corruption(self, rng):
        vgg = VGG16Features()
        v = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        fn = make_perceptual_loss_fn(vgg, v)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        small = np.asarray(fn(x, x + 0.01))[0]
        big = np.asarray(fn(x, x + 0.2))[0]
        assert small < big


class TestAdaIN:
    def test_adain_matches_style_moments(self, rng):
        c = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))
        s = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32) * 3 + 1)
        out = adain(c, s)
        np.testing.assert_allclose(np.asarray(out.mean(axis=(1, 2))),
                                   np.asarray(s.mean(axis=(1, 2))),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.std(axis=(1, 2))),
                                   np.asarray(s.std(axis=(1, 2))),
                                   rtol=2e-2, atol=2e-2)

    def test_stylizer_shapes_and_range(self, rng):
        stylizer = AdaINStylizer()
        content = rng.rand(2, 64, 64, 3).astype(np.float32)
        style = rng.rand(1, 64, 64, 3).astype(np.float32)
        out = np.asarray(stylizer(content, style, alpha=0.7))
        assert out.shape == (2, 64, 64, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_alpha_zero_reconstruction_path(self, rng):
        # alpha=0 feeds the unmodified content features to the decoder; with
        # a random decoder the output won't equal the content, but it must be
        # alpha-dependent and deterministic
        stylizer = AdaINStylizer()
        content = rng.rand(1, 64, 64, 3).astype(np.float32)
        style = rng.rand(1, 64, 64, 3).astype(np.float32)
        out0 = np.asarray(stylizer(content, style, alpha=0.0))
        out0b = np.asarray(stylizer(content, style, alpha=0.0))
        out1 = np.asarray(stylizer(content, style, alpha=1.0))
        np.testing.assert_allclose(out0, out0b)
        assert np.abs(out0 - out1).max() > 1e-5

    def test_decoder_training_objective_decreases(self, rng):
        import optax

        stylizer = AdaINStylizer()
        enc, enc_v = stylizer.encoder, stylizer.enc_variables
        dec = stylizer.decoder
        dec_params = stylizer.dec_variables["params"]
        content = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
        style = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))

        tx = optax.adam(1e-3)
        opt_state = tx.init(dec_params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                total, c, s = adain_train_losses(enc, enc_v, dec, p,
                                                 content, style)
                return total
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(5):
            dec_params, opt_state, loss = step(dec_params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_train_adain_decoder_end_to_end(self):
        """The library trainer (scripts/aux_train_adain_decoder.py wraps
        it): loss falls substantially; the trained decoder's alpha=0
        output reconstructs training content ~2x better than the
        untrained decoder and improves on held-out images too (the
        recon_weight stabilizer pins the decoder toward an encoder
        inverse). Smooth (piecewise-constant) images: uniform noise is
        not representable from stride-4 relu3_3 features, so it cannot
        probe reconstruction."""
        def smooth(r, n, s=32, cells=4):
            base = r.rand(n, cells, cells, 3).astype(np.float32)
            k = s // cells
            return np.kron(base, np.ones((1, k, k, 1), np.float32))

        rng42 = np.random.RandomState(42)
        stylizer = AdaINStylizer()
        dec0 = stylizer.dec_variables["params"]
        content_pool = smooth(rng42, 8)
        style_pool = smooth(rng42, 8) * 0.5 + 0.25

        def batches():
            r = np.random.RandomState(0)
            for _ in range(250):
                yield (content_pool[r.randint(0, 8, 4)],
                       style_pool[r.randint(0, 8, 4)])

        trained, hist = train_adain_decoder(
            stylizer.encoder, stylizer.enc_variables, stylizer.decoder,
            dec0, batches(), lr=5e-3, recon_weight=20.0, style_weight=1.0)
        assert np.mean(hist[-5:]) < 0.7 * np.mean(hist[:5])

        held_out = smooth(np.random.RandomState(7), 2)
        style_h = smooth(np.random.RandomState(8), 2)

        def recon_mse(params, content, style):
            s = AdaINStylizer(enc_variables=stylizer.enc_variables,
                              dec_variables={"params": params})
            out = np.asarray(s(content, style, alpha=0.0))
            return float(np.mean((out - content) ** 2))

        train_c, train_s = content_pool[:2], style_pool[:2]
        assert recon_mse(trained, train_c, train_s) < \
            0.65 * recon_mse(dec0, train_c, train_s)
        assert recon_mse(trained, held_out, style_h) < \
            recon_mse(dec0, held_out, style_h)

    def test_trained_decoder_npz_roundtrip(self, rng, tmp_path):
        """The npz format written by aux_train_adain_decoder.py is the one
        aux_styled_coco_preload.py --decoder_ckpt consumes."""
        stylizer = AdaINStylizer()
        params = jax.tree_util.tree_map(np.asarray,
                                        stylizer.dec_variables["params"])
        path = tmp_path / "dec.npz"
        np.savez(path, params=np.asarray(params, dtype=object))
        blob = np.load(path, allow_pickle=True)
        loaded = blob["params"].item()
        s2 = AdaINStylizer(enc_variables=stylizer.enc_variables,
                           dec_variables={"params": loaded})
        content = rng.rand(1, 32, 32, 3).astype(np.float32)
        style = rng.rand(1, 32, 32, 3).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(stylizer(content, style, 0.6)),
            np.asarray(s2(content, style, 0.6)))
