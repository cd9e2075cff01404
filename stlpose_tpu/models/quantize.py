"""Post-training int8 quantization (PTQ) for the HRNet serving graph.

TPU-native serving optimization with no reference counterpart (the
reference serves the live torch f32 module, model_setup.py:19-47): the
v5e MXU executes int8×int8→int32 at twice the bf16 MAC rate, and the
measured win through XLA (requantization included) is ~1.3× on the thin
32-channel HRNet branch convs and ~1.9× on fat 256-channel convs — see
README "Measured performance".

Scheme: w8a8, symmetric weights, two activation flavors.

  * Weights: per-output-channel scales ``sw[o] = max|W[..., o]| / 127``,
    quantized once on host at export time (exact, data-free).
  * Activations: per-tensor scales from calibration — the FOLDED serving
    graph runs in ``quant="calib"`` mode over a calibration stream and
    records per-conv input absmax / q999 / min (``calib_stats``,
    max/min-reduced across batches).
  * ``act_scheme="signed"`` (``quant="int8"``, the throughput flavor):
    symmetric ``sx = absmax/127`` everywhere; the conv is the vanilla
    zero-padded int8 MXU program.
  * ``act_scheme="unsigned"`` (``quant="int8u"``, the accuracy flavor):
    post-ReLU inputs (detected by calibrated ``in_min >= 0``) are
    promoted to a shifted-unsigned scheme — ``sx = absmax/255``,
    zero-point 128, implemented exactly by padding the shifted int8
    input with ``-zp`` and folding the uniform ``zp*sum(w8)`` term into
    the bias. The extra bit of resolution cut dominant-peak drift ~3× on
    the overfit-tiny instrument (p95 2.9 -> 0.95 heatmap px), but the
    non-zero-value pad cannot fold into the TPU conv: hardware-measured
    -16% vs "signed" (an epilogue formulation that kept the conv
    zero-padded and added the ``zp*(in-bounds tap sum)`` correction
    measured worse still, -23%: the (H,W,O) correction tensor is
    recomputed and round-tripped through HBM every call).
  * The int32 accumulator is dequantized as ``y = acc * (sx * sw) + b``
    with the folded-BN bias in f32; ReLU and residual adds stay in the
    compute dtype. The final 1×1 heatmap head remains un-quantized
    (17 thin output channels — negligible FLOPs, and it sets the decode
    precision).

The quantized param pytree intentionally mirrors the module tree of a
``quant="int8"`` model (each ConvBN scope carries ``kernel_i8``, ``sw``,
``sx``, ``bias`` in place of the folded ``conv/{kernel,bias}``), so
``model.apply`` works directly with the returned variables.

Accuracy: bounded in-suite by tests/test_int8_accuracy.py (the overfit
tiny-model instrument mirroring the bf16 bound in test_bf16_accuracy.py).
Int8 drift is larger than bf16 drift — it is a serving-throughput
trade-off knob, NOT the AP-parity configuration (that remains bf16 +
folded BN, RUNBOOK_AP_PARITY.md).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


def _to_plain(tree):
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def calibrate_hrnet(model_calib, folded_variables, batches: Iterable,
                    train: bool = False):
    """Run the folded serving graph in calibration mode over ``batches``
    and return the max-reduced ``calib_stats`` tree (host numpy).

    Args:
      model_calib: a ``create_hrnet(..., folded=True, quant="calib")``
        module whose dtype matches the intended serving dtype.
      folded_variables: ``fold_batchnorms`` output for that config.
      batches: iterable of input arrays (N, H, W, 3), already normalized
        exactly as serving will normalize.
    """

    @jax.jit
    def stats_fn(v, x):
        _, upd = model_calib.apply(v, x, train=False,
                                   mutable=["calib_stats"])
        return upd["calib_stats"]

    def merge(a, b, name=None):
        if isinstance(a, dict) or hasattr(a, "items"):
            return {k: merge(a[k], b[k], k) for k in a}
        red = jnp.minimum if name == "in_min" else jnp.maximum
        return jax.tree.map(red, a, b)

    acc = None
    for x in batches:
        s = stats_fn(folded_variables, jnp.asarray(x))
        acc = s if acc is None else merge(acc, s)
    if acc is None:
        raise ValueError("calibration stream was empty")
    return jax.device_get(acc)


def quantize_hrnet(folded_variables, calib_stats, min_scale: float = 1e-8,
                   act_clip: str = "absmax", act_scheme: str = "signed"):
    """Folded f32 variables + calibration stats tree -> int8 variables.

    Walks the folded param tree; every ConvBN scope (``{"conv":
    {"kernel", "bias"}}`` with a matching calibration leaf) is rewritten
    to the int8 param layout. Scopes without calibration stats (the
    un-quantized ``final_layer`` head) pass through unchanged.

    ``act_scheme`` picks the serving flavor (must match the model's
    ``quant`` string): ``"signed"`` -> ``quant="int8"`` (symmetric,
    vanilla zero-padded int8 conv — the throughput flavor);
    ``"unsigned"`` -> ``quant="int8u"`` (post-ReLU inputs, detected by
    calibrated ``in_min >= 0``, get zero-point 128 and ``sx =
    absmax/255`` — an extra bit of activation resolution, ~3× less
    dominant-peak drift, at a hardware-measured -16% throughput because
    the exact ``-zp`` padding cannot fold into the TPU conv).

    ``act_clip`` selects the activation-scale basis. ``"absmax"``
    (default) never clips. ``"q999"`` clips at the calibrated 99.9%
    quantile of |x| — the textbook PTQ trick for heavy-tailed post-ReLU
    activations, but measured WRONG for this model family: a heatmap
    regressor's signal IS the activation outliers (the peaks), and
    clipping them moved dominant-peak p95 drift from ~1 to ~35 heatmap px
    on the overfit-tiny instrument. Kept as an option because it is the
    right knob for classification-style backbones; do not use it for
    peaked-regression heads.
    """
    params = _to_plain(folded_variables["params"])
    stats = _to_plain(calib_stats)
    key = {"q999": "in_q999", "absmax": "in_absmax"}[act_clip]
    if act_scheme not in ("signed", "unsigned"):
        raise ValueError(f"unknown act_scheme {act_scheme!r}")

    def walk(p, s):
        if (isinstance(p, dict) and set(p.keys()) == {"conv"}
                and isinstance(s, dict) and "in_absmax" in s):
            W = np.asarray(p["conv"]["kernel"], np.float64)   # (k,k,I,O)
            bias = np.asarray(p["conv"]["bias"], np.float32)
            sw = np.maximum(np.abs(W).max(axis=(0, 1, 2)) / 127.0,
                            min_scale)
            w8 = np.clip(np.rint(W / sw), -127, 127).astype(np.int8)
            basis = float(np.asarray(s.get(key, s["in_absmax"])).ravel()[0])
            xmin = (float(np.asarray(s["in_min"]).ravel()[0])
                    if "in_min" in s else -np.inf)
            out = {"kernel_i8": jnp.asarray(w8),
                   "sw": jnp.asarray(sw.astype(np.float32))}
            if act_scheme == "signed":
                out["sx"] = jnp.asarray(np.float32(
                    max(basis / 127.0, min_scale)))
                out["bias"] = jnp.asarray(bias)
                return out
            if xmin >= -1e-6:
                # post-ReLU input: shifted-unsigned (zp=128, [0,255]).
                # The conv pads with -zp (hrnet.py), which uniformly
                # subtracts zp*sum(w8) vs the true result — fold it back
                # into the bias here.
                zp, qlo, qhi = 128.0, 0.0, 255.0
                sx = max(basis / 255.0, min_scale)
            else:
                zp, qlo, qhi = 0.0, -127.0, 127.0
                sx = max(basis / 127.0, min_scale)
            bias = (bias + np.float32(zp * sx)
                    * w8.sum(axis=(0, 1, 2)).astype(np.float32)
                    * sw.astype(np.float32))
            out.update({
                "sx": jnp.asarray(np.float32(sx)),
                "zp": jnp.asarray(np.float32(zp)),
                "qlo": jnp.asarray(np.float32(qlo)),
                "qhi": jnp.asarray(np.float32(qhi)),
                "bias": jnp.asarray(bias.astype(np.float32))})
            return out
        if isinstance(p, dict):
            return {k: walk(v, s.get(k, {}) if isinstance(s, dict) else {})
                    for k, v in p.items()}
        return p

    return {"params": walk(params, stats)}


def fold_frcnn_trunk(variables):
    """Fold the Faster R-CNN ResNet trunk's BatchNorms into its convs.

    Takes live-BN detector variables ({"params", "batch_stats"}) and
    returns variables for a ``FasterRCNN(trunk_quant="folded")`` model:
    the ``backbone`` subtree is BN-folded (including the
    ``stem_conv``/``stem_bn`` pair — see ``hrnet.fold_batchnorms``); FPN /
    RPN / box head pass through unchanged (they carry no BN). The
    reference serves the live torch BN graph
    (lib/model_setup.py:70-73); folding is the TPU serving optimization.
    """
    from stlpose_tpu.models.hrnet import fold_batchnorms

    params = _to_plain(variables["params"])
    stats = _to_plain(variables.get("batch_stats", {}))
    bb = fold_batchnorms({"params": params["backbone"],
                          "batch_stats": stats.get("backbone", {})})
    params = dict(params)
    params["backbone"] = bb["params"]
    rest = {k: v for k, v in stats.items() if k != "backbone"}
    out = {"params": params}
    if rest:
        out["batch_stats"] = rest
    return out


def quantize_frcnn_trunk(config, variables, batches, dtype=jnp.float32,
                         act_scheme: str = "signed"):
    """Fold + calibrate + int8-quantize the detector's ResNet trunk.

    The trunk's fat 256..2048-channel convs are exactly the shape where
    the v5e int8 MXU path pays (~1.9x measured on 256-channel convs —
    PROFILE_thin_conv_experiment.json), unlike HRNet's thin branches. The
    7x7 stem stays a folded f32/bf16 conv (3 input channels, negligible
    FLOPs); FPN / RPN / box head are untouched.

    Args:
      config: the detector's ``FasterRCNNConfig`` (trunk geometry).
      variables: live-BN detector variables ({"params", "batch_stats"}).
      batches: iterable of image batches (N, S, S, 3), preprocessed
        exactly as ``FasterRCNN.predict`` will see them (calibration runs
        the folded trunk over them).
      act_scheme: "signed" (``trunk_quant="int8"``, throughput flavor) or
        "unsigned" (``trunk_quant="int8u"``, accuracy flavor) — same
        semantics as the HRNet flavors above.
    Returns:
      variables for a ``FasterRCNN(trunk_quant="int8"|"int8u")`` model.
    """
    from stlpose_tpu.models.resnet import ResNet

    folded = fold_frcnn_trunk(variables)
    bb_folded = {"params": folded["params"]["backbone"]}
    calib = ResNet(stage_sizes=config.stage_sizes, width=config.width,
                   dtype=dtype, folded=True, quant="calib")
    stats = calibrate_hrnet(calib, bb_folded, batches)
    qbb = quantize_hrnet(bb_folded, stats, act_scheme=act_scheme)
    params = dict(folded["params"])
    params["backbone"] = qbb["params"]
    out = {"params": params}
    if "batch_stats" in folded:
        out["batch_stats"] = folded["batch_stats"]
    return out


def apply_trunk_flavor_variables(config, variables, trunk_quant,
                                 calib_batches=None, dtype=jnp.float32):
    """The single variables-level entry point for the detector trunk
    serving flavors: transform live-BN Faster R-CNN variables for a
    ``FasterRCNN(trunk_quant=...)`` facade. Every consumer (the
    evaluator engines, both serving exports, bench.py's detector and
    two-stage modes) routes through here so flavor semantics — the
    fold, the act scheme per flavor, the calibration dtype — cannot
    drift between call sites.

    Args:
      config: the detector's ``FasterRCNNConfig``.
      variables: live-BN detector variables ({"params", "batch_stats"}).
      trunk_quant: "none" (no-op) / "folded" / "int8" / "int8u".
      calib_batches: iterable of image batches in the exact predict
        convention (0-1 floats) — required for the int8 flavors.
      dtype: the SERVING compute dtype; calibration must run the folded
        trunk in the same dtype the served graph uses, or activation
        scales derive from a different compute path than serving.
    """
    if trunk_quant in (None, "none"):
        return variables
    if trunk_quant == "folded":
        return fold_frcnn_trunk(variables)
    if trunk_quant in ("int8", "int8u"):
        if not calib_batches:
            raise ValueError(
                f"trunk_quant={trunk_quant!r} requires calibration "
                f"images (calib_batches)")
        return quantize_frcnn_trunk(
            config, variables, calib_batches, dtype=dtype,
            act_scheme=("signed" if trunk_quant == "int8"
                        else "unsigned"))
    raise ValueError(f"unknown trunk_quant {trunk_quant!r}")


def quantize_hrnet_from_batches(config_name, variables, batches,
                                dtype=jnp.float32,
                                act_scheme: str = "signed"):
    """Convenience one-shot: fold -> calibrate -> quantize.

    Args:
      config_name: HRNet config name (``"w32_256x192"``, ``"tiny"``...).
      variables: UNfolded train-format variables ({params, batch_stats}).
      batches: normalized input batches for calibration.
      act_scheme: ``"signed"`` (throughput flavor, ``quant="int8"``) or
        ``"unsigned"`` (accuracy flavor, ``quant="int8u"``).
    Returns:
      (int8 variables, int8 model) ready for ``model.apply``.
    """
    from stlpose_tpu.models.hrnet import create_hrnet, fold_batchnorms

    folded = fold_batchnorms(variables)
    calib_model = create_hrnet(config_name, dtype=dtype, folded=True,
                               quant="calib")
    stats = calibrate_hrnet(calib_model, folded, batches)
    qvars = quantize_hrnet(folded, stats, act_scheme=act_scheme)
    model = create_hrnet(config_name, dtype=dtype, folded=True,
                         quant="int8" if act_scheme == "signed"
                         else "int8u")
    return qvars, model
