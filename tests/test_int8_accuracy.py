"""Accuracy bound for the int8 PTQ serving flavor (models/quantize.py:
symmetric w8a8 over the folded graph, per-output-channel weight scales,
per-tensor calibrated activation scales).

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
import jax
import jax.numpy as jnp

from stlpose_tpu.eval.submission import generate_submission, compute_precision
from stlpose_tpu.models import create_hrnet, fold_batchnorms
from stlpose_tpu.models.quantize import calibrate_hrnet, quantize_hrnet

# the shared module-scoped overfit fixture (imported so pytest resolves it
# in this module's namespace; builds once per module either way)
from tests.test_bf16_accuracy import overfit_workspace, _decode_all  # noqa: F401


class TestInt8ServingAccuracy:
    def test_keypoint_drift_and_ap_delta(self, overfit_workspace, tmp_path):
        trained, batches, labels = overfit_workspace

        f32 = create_hrnet("tiny")
        f32_fn = jax.jit(lambda x: f32.apply(trained, x, train=False))

        folded = fold_batchnorms(trained)
        calib_model = create_hrnet("tiny", folded=True, quant="calib")
        # calibrate on the eval stream itself (what a serving deployment
        # would do with a held-out calibration set)
        stats = calibrate_hrnet(calib_model, folded,
                                [jnp.asarray(b["image"]) for b in batches])
        qvars = quantize_hrnet(folded, stats)
        q = create_hrnet("tiny", folded=True, quant="int8")
        q_fn = jax.jit(lambda x: q.apply(qvars, x, train=False))

        p32, b32, ids, hm32 = _decode_all(f32_fn, batches)
        pq, bq, idsq, hmq = _decode_all(q_fn, batches)
        assert ids == idsq

        # (1) heatmap-value perturbation: int8 requantization noise
        # accumulates through the stack; mean stays small, sup sits at
        # peak shoulders (same shape as the bf16 bound, looser constants)
        err = np.abs(hmq - hm32)
        hm_err = float(err.max())
        print(f"int8 heatmap err: mean {err.mean():.5f} "
              f"p999 {np.quantile(err, 0.999):.4f} sup {hm_err:.4f}")
        assert float(err.mean()) < 0.05
        assert hm_err < 0.6, f"heatmap sup-error {hm_err:.4f}"
        # peak-confidence drift: int8 perturbs NON-dominant peak values by
        # up to ~0.2 on this instrument (bf16: 0.08) — the score input to
        # the submission keeps ordering but not magnitude for weak joints
        mv32, mvq = p32[..., 2], pq[..., 2]
        assert float(np.abs(mv32 - mvq).max()) < 0.3

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
        print(f"int8 dominant peaks: n={dom.sum()} "
              f"p95={np.quantile(d, 0.95):.3f} max={d.max():.3f} (hm px)")
        assert float(np.quantile(d, 0.95)) < 1.5, (
            f"dominant-peak p95 drift {np.quantile(d, 0.95):.2f} hm px")
        assert float(d.max()) < 3.5, f"dominant-peak max {d.max():.2f} hm px"

        # (3) full oracle pipeline AP delta. Granularity caveat: the
        # fixture carries only 8 annotated people, so AP moves in coarse
        # ~1/8 steps — one weak-joint OKS match flipping costs ~0.1-0.2
        # AP50 even when every dominant peak is sub-pixel-stable (the
        # precise instruments are the drift bounds above). Measured here:
        # f32 AP50 0.64 vs int8 0.45 — int8 noise (heatmap p999 ~0.17)
        # relocates weak non-dominant joints, which is exactly the lossy
        # half of the trade-off this serving knob buys throughput with.
        f32_file = str(tmp_path / "preds_f32.json")
        q_file = str(tmp_path / "preds_int8.json")
        generate_submission(p32, b32, ids, f32_file)
        generate_submission(pq, bq, ids, q_file)
        with contextlib.redirect_stdout(io.StringIO()):
            s32 = compute_precision(f32_file, labels)
            sq = compute_precision(q_file, labels)
        assert s32[1] > 0.5 and sq[1] > 0.3, (s32[1], sq[1])
        assert abs(s32[0] - sq[0]) < 0.30, (
            f"int8 serving dAP {sq[0] - s32[0]:+.4f} (f32 {s32[0]:.4f})")
        print(f"int8 PTQ accuracy: dAP={sq[0] - s32[0]:+.4f} "
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
