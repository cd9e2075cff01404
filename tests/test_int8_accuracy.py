"""Accuracy bounds for BOTH int8 PTQ serving flavors (models/quantize.py:
w8a8 over the folded graph, per-output-channel weight scales, per-tensor
calibrated activation scales; "signed" = vanilla symmetric throughput
flavor, "unsigned" = zero-point-128 accuracy flavor for post-ReLU
inputs).

Same instrument as the bf16 bound (tests/test_bf16_accuracy.py — overfit
tiny HRNet so heatmaps carry realistic sharp peaks, then compare serving
flavor vs the f32 parity path through decode, submission, and COCO OKS
AP). Int8 drift is LARGER than bf16 drift by construction — the bounds
here are correspondingly looser and document the throughput/accuracy
trade-off; int8 is a serving knob, NOT the AP-parity configuration.
Reference eval path being bounded: 03_evaluate.py:114-218."""

import io
import contextlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stlpose_tpu.eval.submission import generate_submission, compute_precision
from stlpose_tpu.models import create_hrnet, fold_batchnorms
from stlpose_tpu.models.quantize import calibrate_hrnet, quantize_hrnet

# the shared module-scoped overfit fixture (imported so pytest resolves it
# in this module's namespace; builds once per module either way)
from tests.test_bf16_accuracy import overfit_workspace, _decode_all  # noqa: F401


# per-flavor bounds, set just above the deterministically measured values
# on this instrument (signed: p95 2.87 / max 4.03 / mv 0.32 / sup 0.57;
# unsigned: p95 0.95 / max 1.58 / mv 0.13 / sup 0.31): the unsigned
# zero-point flavor ("int8u") buys ~3x less drift for a measured -16%
# throughput vs the vanilla signed conv program ("int8").
#
# ap_min/dap: on this tiny 8-channel instrument the signed flavor's AP50
# collapses to 0.0 — dominant peaks stay sub-3px-stable, but enough WEAK
# joints drift beyond the OKS-0.5 tolerance that every person mismatches.
# That is the measured, documented cost of the fast flavor (per-tensor
# int8 noise on 8-channel activations is proportionally huge; a real
# 32-256-channel model would fare better, unverifiable without real
# weights). The unsigned flavor holds AP through the same pipeline —
# which is why it is the accuracy-recommended int8 despite -16%.
_FLAVORS = {
    "signed": dict(quant="int8", mean=0.05, sup=0.7, mv=0.45,
                   p95=3.5, dmax=5.0, ap_min=None, dap=None),
    "unsigned": dict(quant="int8u", mean=0.05, sup=0.6, mv=0.3,
                     p95=1.5, dmax=3.5, ap_min=0.3, dap=0.30),
}


class TestInt8ServingAccuracy:
    @pytest.mark.parametrize("scheme", ["signed", "unsigned"])
    def test_keypoint_drift_and_ap_delta(self, overfit_workspace, tmp_path,
                                         scheme):
        trained, batches, labels = overfit_workspace
        B = _FLAVORS[scheme]

        f32 = create_hrnet("tiny")
        f32_fn = jax.jit(lambda x: f32.apply(trained, x, train=False))

        folded = fold_batchnorms(trained)
        calib_model = create_hrnet("tiny", folded=True, quant="calib")
        # calibrate on the eval stream itself (what a serving deployment
        # would do with a held-out calibration set)
        stats = calibrate_hrnet(calib_model, folded,
                                [jnp.asarray(b["image"]) for b in batches])
        qvars = quantize_hrnet(folded, stats, act_scheme=scheme)
        q = create_hrnet("tiny", folded=True, quant=B["quant"])
        q_fn = jax.jit(lambda x: q.apply(qvars, x, train=False))

        p32, b32, ids, hm32 = _decode_all(f32_fn, batches)
        pq, bq, idsq, hmq = _decode_all(q_fn, batches)
        assert ids == idsq

        # (1) heatmap-value perturbation: int8 requantization noise
        # accumulates through the stack; mean stays small, sup sits at
        # peak shoulders (same shape as the bf16 bound, looser constants)
        err = np.abs(hmq - hm32)
        hm_err = float(err.max())
        print(f"int8[{scheme}] heatmap err: mean {err.mean():.5f} "
              f"p999 {np.quantile(err, 0.999):.4f} sup {hm_err:.4f}")
        assert float(err.mean()) < B["mean"]
        assert hm_err < B["sup"], f"heatmap sup-error {hm_err:.4f}"
        # peak-confidence drift: int8 perturbs NON-dominant peak values —
        # the score input to the submission keeps ordering but not
        # magnitude for weak joints
        mv32, mvq = p32[..., 2], pq[..., 2]
        assert float(np.abs(mv32 - mvq).max()) < B["mv"]

        # (2) dominant peaks must not jump to a competing peak
        drift = np.linalg.norm(p32[..., :2] - pq[..., :2], axis=-1)
        N, H, W, J = hm32.shape
        dom = np.zeros((N, J), bool)
        for n in range(N):
            for j in range(J):
                m = hm32[n, :, :, j]
                iy, ix = np.unravel_index(np.argmax(m), m.shape)
                peak = m[iy, ix]
                masked = m.copy()
                masked[max(0, iy - 3):iy + 4, max(0, ix - 3):ix + 4] = -1e9
                dom[n, j] = (peak > 0.3) and (peak - masked.max() > 0.2)
        assert dom.sum() >= 5, f"only {dom.sum()} dominant peaks"
        scales = np.concatenate([b["scale"] for b in batches])
        span = np.maximum(scales[:, 0] * 200.0 / W,
                          scales[:, 1] * 200.0 / H)
        d = (drift / span[:, None])[dom]
        print(f"int8[{scheme}] dominant peaks: n={dom.sum()} "
              f"p95={np.quantile(d, 0.95):.3f} max={d.max():.3f} (hm px)")
        assert float(np.quantile(d, 0.95)) < B["p95"], (
            f"dominant-peak p95 drift {np.quantile(d, 0.95):.2f} hm px")
        assert float(d.max()) < B["dmax"], (
            f"dominant-peak max {d.max():.2f} hm px")

        # (3) full oracle pipeline AP delta. Granularity caveat: the
        # fixture carries only 8 annotated people, so AP moves in coarse
        # ~1/8 steps — one weak-joint OKS match flipping costs ~0.1-0.2
        # AP50 even when every dominant peak is sub-pixel-stable (the
        # precise instruments are the drift bounds above). Measured:
        # f32 AP50 0.64 vs signed-int8 0.45 — int8 noise relocates weak
        # non-dominant joints, which is exactly the lossy half of the
        # trade-off this serving knob buys throughput with.
        f32_file = str(tmp_path / "preds_f32.json")
        q_file = str(tmp_path / "preds_int8.json")
        generate_submission(p32, b32, ids, f32_file)
        generate_submission(pq, bq, ids, q_file)
        with contextlib.redirect_stdout(io.StringIO()):
            s32 = compute_precision(f32_file, labels)
            sq = compute_precision(q_file, labels)
        assert s32[1] > 0.5, s32[1]
        if B["ap_min"] is not None:
            assert sq[1] > B["ap_min"], (s32[1], sq[1])
        if B["dap"] is not None:
            assert abs(s32[0] - sq[0]) < B["dap"], (
                f"int8 serving dAP {sq[0] - s32[0]:+.4f} "
                f"(f32 {s32[0]:.4f})")
        print(f"int8[{scheme}] PTQ accuracy: dAP={sq[0] - s32[0]:+.4f} "
              f"(f32 AP {s32[0]:.4f}, AP50 {s32[1]:.3f}->{sq[1]:.3f}), "
              f"dominant-peak drift p95 {np.quantile(d, 0.95):.3f}px / "
              f"max {d.max():.3f}px, heatmap sup-err {hm_err:.4f}")

    def test_quantized_conv_mechanics(self):
        """Unit bound: a single quantized ConvBN tracks its f32 folded
        counterpart within the symmetric-quantization error model."""
        from stlpose_tpu.models.hrnet import ConvBN

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-1.5, 1.5, (2, 16, 16, 8))
                        .astype(np.float32))
        m = ConvBN(features=16, kernel=3, folded=True)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)

        calib = ConvBN(features=16, kernel=3, folded=True, quant="calib")
        out, upd = calib.apply(v, x, mutable=["calib_stats"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        absmax = float(upd["calib_stats"]["in_absmax"])
        assert abs(absmax - float(jnp.abs(x).max())) < 1e-6

        qv = quantize_hrnet(
            {"params": {"body": v["params"]}},
            {"body": {"in_absmax": np.float32(absmax)}})
        qm = ConvBN(features=16, kernel=3, folded=True, quant="int8")
        got = qm.apply({"params": qv["params"]["body"]}, x)
        err = np.abs(np.asarray(got) - np.asarray(ref))
        scale = float(np.abs(np.asarray(ref)).max())
        assert err.max() / scale < 0.02, (err.max(), scale)

    @pytest.mark.parametrize("kernel,stride", [(3, 1), (1, 1), (3, 2)])
    def test_unsigned_conv_mechanics(self, kernel, stride):
        """The shifted-unsigned flavor ("int8u") tracks the f32 folded
        conv for post-ReLU inputs — including at the borders, where the
        -zp padding + bias fold must reproduce zero-padding semantics
        exactly (no systematic border bias)."""
        from stlpose_tpu.models.hrnet import ConvBN

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.uniform(0.0, 3.0, (2, 16, 16, 8))
                        .astype(np.float32))
        m = ConvBN(features=16, kernel=kernel, stride=stride, folded=True)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(m.apply(v, x))

        calib = ConvBN(features=16, kernel=kernel, stride=stride,
                       folded=True, quant="calib")
        _, upd = calib.apply(v, x, mutable=["calib_stats"])
        qv = quantize_hrnet({"params": {"b": v["params"]}},
                            {"b": jax.device_get(upd["calib_stats"])},
                            act_scheme="unsigned")
        assert float(qv["params"]["b"]["zp"]) == 128.0
        qm = ConvBN(features=16, kernel=kernel, stride=stride, folded=True,
                    quant="int8u")
        got = np.asarray(qm.apply({"params": qv["params"]["b"]}, x))
        scale = float(np.abs(ref).max())
        err = np.abs(got - ref)
        assert err.max() / scale < 0.02, (err.max(), scale)
        if kernel > 1:
            # border error must be the same magnitude as interior error
            # (quantization noise), not a systematic pad artifact
            border = max(err[:, 0].max(), err[:, -1].max(),
                         err[:, :, 0].max(), err[:, :, -1].max())
            interior = err[:, 2:-2, 2:-2].max()
            assert border < 3.0 * max(interior, 1e-6) + 0.05 * scale, (
                border, interior)
