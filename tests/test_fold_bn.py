"""BN->conv folding parity (models/hrnet.py::fold_batchnorms) and the
device-side MetricAccumulator (parallel/steps.py).

The folded model is the serving configuration VERDICT r1 item 3 asked for:
inference graphs with every BatchNorm collapsed into conv weights. These
tests pin (a) numerical parity with the live-BN path, (b) composition with
the input-normalization fold, (c) structural invariants of the folded tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stlpose_tpu.models import (create_hrnet, fold_batchnorms,
                                fold_input_normalization)


def _tree_map_with_key(fn, tree, prefix=()):
    if hasattr(tree, "items"):
        return {k: _tree_map_with_key(fn, v, prefix + (k,))
                for k, v in tree.items()}
    return fn(prefix, tree)


@pytest.fixture(scope="module")
def tiny_variables():
    """Tiny HRNet variables with deliberately non-trivial BN statistics
    (fresh init has mean=0/var=1, which would make folding vacuous)."""
    model = create_hrnet("tiny")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    counter = [0]

    def perturb(path, leaf):
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        if path and path[-1] == "var":
            return jnp.abs(leaf + 0.3 * jax.random.normal(key, leaf.shape)) \
                + 0.05
        return leaf + 0.2 * jax.random.normal(key, leaf.shape)

    return model, {
        "params": _tree_map_with_key(perturb, v["params"]),
        "batch_stats": _tree_map_with_key(perturb, v["batch_stats"])}


def test_fold_batchnorms_parity(tiny_variables):
    model, v = tiny_variables
    x = jax.random.normal(jax.random.PRNGKey(99), (2, 64, 64, 3)) * 1.5
    ref = model.apply(v, x, train=False)

    folded_model = create_hrnet("tiny", folded=True)
    fv = fold_batchnorms(v)
    out = folded_model.apply(fv, x, train=False)
    # relative: perturbed nets have large activation magnitudes
    scale = np.abs(np.asarray(ref)).max()
    assert np.max(np.abs(np.asarray(out - ref))) / scale < 1e-5


def test_fold_composes_with_input_normalization(tiny_variables):
    """fold_batchnorms is exact on top of fold_input_normalization (the
    input fold itself carries a documented zero-padding border deviation
    vs the true normalize-then-conv path, so the reference here is the
    input-folded UNfolded-BN model, not the normalize path)."""
    model, v = tiny_variables
    mean = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
    std = np.array([0.229, 0.224, 0.225], np.float32) * 255.0
    raw = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3),
                             minval=0.0, maxval=255.0)
    v_in = fold_input_normalization(v, mean, std)
    ref = model.apply(v_in, raw, train=False)

    folded_model = create_hrnet("tiny", folded=True)
    out = folded_model.apply(fold_batchnorms(v_in), raw, train=False)
    scale = np.abs(np.asarray(ref)).max()
    assert np.max(np.abs(np.asarray(out - ref))) / scale < 1e-5


def test_folded_tree_structure(tiny_variables):
    _, v = tiny_variables
    fv = fold_batchnorms(v)
    assert set(fv.keys()) == {"params"}

    names = []

    def walk(tree, prefix=()):
        if hasattr(tree, "items"):
            for k, sub in tree.items():
                walk(sub, prefix + (k,))
        else:
            names.append(prefix)

    walk(fv["params"])
    assert not any("bn" in p for p in names), "bn params must be folded away"
    convs = [p for p in names if "conv" in p and p[-1] == "kernel"]
    biases = [p for p in names if "conv" in p and p[-1] == "bias"]
    assert len(convs) == len(biases) > 0


def test_metric_accumulator_sums_and_finite_guard():
    from stlpose_tpu.parallel import MetricAccumulator

    acc = MetricAccumulator(finite_only=("loss",))
    losses = [1.0, float("nan"), 3.0]
    for i, l in enumerate(losses):
        acc.update({"loss": jnp.float32(l),
                    "pck_hit": jnp.int32(i + 1),
                    "pck_cnt": jnp.int32(10)})
    out = acc.fetch()
    assert out["n"] == 3.0
    assert out["loss_n"] == 2.0                 # nan step skipped
    assert out["loss_sum"] == pytest.approx(4.0)
    assert out["loss_mean"] == pytest.approx(2.0)
    assert out["pck_hit_sum"] == pytest.approx(6.0)
    assert out["pck_cnt_sum"] == pytest.approx(30.0)


def test_metric_accumulator_empty():
    from stlpose_tpu.parallel import MetricAccumulator

    acc = MetricAccumulator()
    assert acc.empty
    assert acc.fetch() == {"n": 0.0}
