"""HRNet numerical parity: Flax model + converter vs a torch oracle with the
reference's state_dict naming (SURVEY.md §7 build step 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stlpose_tpu.config import get_hrnet_config
from stlpose_tpu.models import PoseHighResolutionNet
from stlpose_tpu.models.convert import (torch_statedict_to_flax,
                                        flax_params_to_torch_names)


@pytest.fixture(scope="module")
def torch_pair():
    torch = pytest.importorskip("torch")
    from tests.torch_hrnet import TorchHRNet

    cfg = get_hrnet_config("tiny")
    tm = TorchHRNet(cfg).eval()
    # randomize BN stats so parity actually exercises them
    gen = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
                m.weight.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    return cfg, tm, state


class TestHRNetParity:
    def test_converted_forward_matches_torch(self, torch_pair):
        import torch
        cfg, tm, state = torch_pair
        variables = torch_statedict_to_flax(state)
        model = PoseHighResolutionNet(config=cfg)

        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, 64, 64).astype(np.float32)  # small input, NCHW
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()        # (2, 17, 16, 12)

        x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
        out = model.apply({"params": variables["params"],
                           "batch_stats": variables["batch_stats"]},
                          x_nhwc, train=False)
        out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
        assert out_nchw.shape == ref.shape
        np.testing.assert_allclose(out_nchw, ref, rtol=1e-4, atol=1e-4)

    def test_converter_covers_all_params(self, torch_pair):
        cfg, _, state = torch_pair
        variables = torch_statedict_to_flax(state)
        model = PoseHighResolutionNet(config=cfg)
        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), train=False)

        def leaves(tree):
            return {("/".join(p), v.shape)
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)
                    for p in [[str(getattr(k, "key", k)) for k in p]]}

        got_p = leaves(variables["params"])
        exp_p = leaves(init["params"])
        assert got_p == exp_p, (f"missing: {sorted(exp_p - got_p)[:5]} "
                                f"extra: {sorted(got_p - exp_p)[:5]}")
        assert leaves(variables["batch_stats"]) == leaves(init["batch_stats"])

    def test_roundtrip_flax_to_torch_names(self, torch_pair):
        cfg, _, state = torch_pair
        variables = torch_statedict_to_flax(state)
        back = flax_params_to_torch_names(variables)
        torch_keys = {k for k in state if not k.endswith("num_batches_tracked")}
        assert set(back) == torch_keys
        for k in torch_keys:
            np.testing.assert_array_equal(back[k], state[k])


class TestFullW32Parity:
    def test_w32_forward_matches_torch(self):
        torch = pytest.importorskip("torch")
        from tests.torch_hrnet import TorchHRNet

        cfg = get_hrnet_config("w32_256x192")
        tm = TorchHRNet(cfg).eval()
        state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = torch_statedict_to_flax(state)
        model = PoseHighResolutionNet(config=cfg)
        x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
        got = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestHRNetModel:
    def test_full_size_shapes(self):
        model = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3)),
                       train=False)
        out = model.apply(v, jnp.zeros((2, 256, 192, 3)), train=False)
        assert out.shape == (2, 64, 48, 17)

    def test_train_mode_updates_batch_stats(self):
        model = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                       train=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        out, updates = model.apply(v, x, train=True, mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(v["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))

    def test_w32_param_count(self):
        # HRNet-W32 has ~28.5M params (SURVEY.md §2.9)
        model = PoseHighResolutionNet(config=get_hrnet_config("w32_256x192"))
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                       train=False)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(v["params"]))
        assert 28.0e6 < n < 29.0e6, n
