"""AOT serving export (stlpose_tpu/serving): serialize -> reload -> exact
agreement with the live folded model, batch polymorphism, manifest."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stlpose_tpu.models import create_hrnet, fold_batchnorms
from stlpose_tpu.ops.decode import decode_heatmaps_nhwc
from stlpose_tpu.serving import export_pose_server, load_pose_server

CONFIG = "tiny"
HW = (64, 64)


def _make_variables():
    model = create_hrnet(CONFIG)
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1,) + HW + (3,)), train=False)


def test_export_reload_exact_and_batch_polymorphic(tmp_path):
    variables = _make_variables()
    out = export_pose_server(variables, str(tmp_path / "m"),
                             config_name=CONFIG, input_hw=HW,
                             platforms=("cpu",))
    serve, manifest = load_pose_server(out)
    assert manifest["bn_folded"] and manifest["config"] == CONFIG

    folded = fold_batchnorms(variables)
    model = create_hrnet(CONFIG, dtype=jnp.bfloat16, folded=True)
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0

    rng = np.random.RandomState(0)
    for batch in (2, 5):                 # one artifact, multiple batches
        crops = jnp.asarray(rng.randint(0, 256, (batch,) + HW + (3,),
                                        dtype=np.uint8))
        centers = jnp.asarray(rng.uniform(50, 200, (batch, 2)), jnp.float32)
        scales = jnp.ones((batch, 2), jnp.float32)

        got = serve(folded, crops, centers, scales)
        x = (crops.astype(jnp.float32) - mean) / std
        hm = model.apply(folded, x, train=False)
        preds, maxvals, _ = decode_heatmaps_nhwc(hm, centers, scales)

        assert got["keypoints"].shape == preds.shape
        np.testing.assert_allclose(np.asarray(got["keypoints"]),
                                   np.asarray(preds), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["scores"]),
                                   np.asarray(maxvals), atol=1e-5)


def test_export_int8_round_trip(tmp_path):
    """The int8 PTQ export flavor: the artifact's program must agree with
    the live quant="int8" graph on the quantized weights, and the
    manifest must record the flavor."""
    from stlpose_tpu.models.quantize import quantize_hrnet_from_batches

    variables = _make_variables()
    rng = np.random.RandomState(3)
    calib = rng.randint(0, 256, (4,) + HW + (3,), dtype=np.uint8)
    out = export_pose_server(variables, str(tmp_path / "q"),
                             config_name=CONFIG, input_hw=HW,
                             platforms=("cpu",), quant="int8",
                             calib_crops=calib)
    serve, manifest = load_pose_server(out)
    assert manifest["quant"] == "int8"
    assert manifest["compute_dtype"].startswith("int8")

    # live int8 reference on identically-derived quantized weights
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0
    xc = (jnp.asarray(calib).astype(jnp.float32) - mean) / std
    qvars, _ = quantize_hrnet_from_batches(CONFIG, variables, [xc])
    qmodel = create_hrnet(CONFIG, dtype=jnp.bfloat16, folded=True,
                          quant="int8")

    crops = jnp.asarray(rng.randint(0, 256, (2,) + HW + (3,),
                                    dtype=np.uint8))
    centers = jnp.asarray(rng.uniform(50, 200, (2, 2)), jnp.float32)
    scales = jnp.ones((2, 2), jnp.float32)
    got = serve(qvars, crops, centers, scales)
    x = (crops.astype(jnp.float32) - mean) / std
    hm = qmodel.apply(qvars, x, train=False)
    preds, maxvals, _ = decode_heatmaps_nhwc(hm, centers, scales)
    np.testing.assert_allclose(np.asarray(got["keypoints"]),
                               np.asarray(preds), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["scores"]),
                               np.asarray(maxvals), atol=1e-4)


def test_export_artifact_is_self_contained(tmp_path):
    """The artifact file round-trips through raw bytes (no live objects)."""
    variables = _make_variables()
    out = export_pose_server(variables, str(tmp_path / "m"),
                             config_name=CONFIG, input_hw=HW,
                             platforms=("cpu",))
    blob = (tmp_path / "m" / "model.stablehlo").read_bytes()
    assert len(blob) > 1000
    # byte-identical copy loads and runs
    (tmp_path / "copy").mkdir()
    (tmp_path / "copy" / "model.stablehlo").write_bytes(blob)
    (tmp_path / "copy" / "manifest.json").write_text(
        (tmp_path / "m" / "manifest.json").read_text())
    serve, _ = load_pose_server(str(tmp_path / "copy"))
    folded = fold_batchnorms(variables)
    crops = jnp.zeros((1,) + HW + (3,), jnp.uint8)
    c = jnp.ones((1, 2), jnp.float32) * 50
    got = serve(folded, crops, c, c)
    assert np.isfinite(np.asarray(got["scores"])).all()


def test_detector_export_tpu_exclusive_bakes_pallas(tmp_path):
    """A ``platforms=("tpu",), static_batch=N`` Faster R-CNN export bakes
    the fused Pallas RoIAlign (a Mosaic ``tpu_custom_call``) into the
    artifact; lowering and serialize/deserialize work from any host (no
    TPU needed to produce the artifact). Execution parity of the
    reloaded artifact vs the live jitted model is validated on the real
    chip (see scripts/RUNBOOK_AP_PARITY.md notes); the CPU suite pins
    the serialization path and the routing rules:

      * tpu-exclusive + static batch  -> Mosaic kernel baked in
      * any symbolic-batch export     -> portable XLA RoIAlign (the
        kernel's chunking/grid cannot be shape-polymorphic)

    The 128-channel config matters: the kernel itself routes thin
    (C % 128 != 0) configs to the XLA path, so FASTER_RCNN_TINY would
    never lower the Mosaic call.
    """
    import dataclasses
    from jax import export as jexport
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from stlpose_tpu.serving import export_detector_server

    cfg128 = dataclasses.replace(FASTER_RCNN_TINY, fpn_channels=128)
    det = FasterRCNN(cfg128, pallas_roi=True)
    v = det.init(jax.random.PRNGKey(0))
    out = export_detector_server(v, str(tmp_path / "tpu_only"),
                                 family="faster_rcnn", config=cfg128,
                                 platforms=("tpu",), static_batch=2)
    blob = (tmp_path / "tpu_only" / "model.stablehlo").read_bytes()
    txt = jexport.deserialize(blob).mlir_module()
    assert "tpu_custom_call" in txt        # the Mosaic kernel is baked in
    serve, manifest = load_pose_server(str(tmp_path / "tpu_only"))
    assert manifest["platforms"] == ["tpu"]
    assert manifest["pallas_roi"] and manifest["batch"] == 2

    # symbolic-batch export of the same model: portable path, no kernel
    out2 = export_detector_server(v, str(tmp_path / "poly"),
                                  family="faster_rcnn", config=cfg128,
                                  platforms=("tpu",))
    txt2 = jexport.deserialize(
        (tmp_path / "poly" / "model.stablehlo").read_bytes()).mlir_module()
    assert "tpu_custom_call" not in txt2
    _, mani2 = load_pose_server(str(tmp_path / "poly"))
    assert not mani2["pallas_roi"] and mani2["batch"] == "b"

    # explicit opt-out mirrors the STLPOSE_PALLAS_ROI=0 escape hatch
    export_detector_server(v, str(tmp_path / "optout"),
                           family="faster_rcnn", config=cfg128,
                           platforms=("tpu",), static_batch=2,
                           pallas_roi=False)
    txt3 = jexport.deserialize(
        (tmp_path / "optout" / "model.stablehlo").read_bytes()
    ).mlir_module()
    assert "tpu_custom_call" not in txt3
    _, mani3 = load_pose_server(str(tmp_path / "optout"))
    assert not mani3["pallas_roi"] and mani3["batch"] == 2


def test_detector_export_round_trip(tmp_path):
    """Both detector families export and reload; reloaded predictions
    match the live predict exactly."""
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from stlpose_tpu.models.efficientdet import (EfficientDet,
                                                 EFFICIENTDET_TINY)
    from stlpose_tpu.serving import export_detector_server

    rng = np.random.RandomState(1)
    for family, det in (("faster_rcnn", FasterRCNN(FASTER_RCNN_TINY)),
                        ("efficientdet", EfficientDet(EFFICIENTDET_TINY))):
        v = det.init(jax.random.PRNGKey(0))
        cfg = (FASTER_RCNN_TINY if family == "faster_rcnn"
               else EFFICIENTDET_TINY)
        out = export_detector_server(v, str(tmp_path / family),
                                     family=family, config=cfg,
                                     platforms=("cpu",))
        serve, manifest = load_pose_server(out)
        assert manifest["family"] == family
        S = det.config.image_size
        imgs = jnp.asarray(rng.rand(2, S, S, 3).astype(np.float32))
        got = serve(v, imgs)
        ref = jax.jit(det.predict)(v, imgs)
        np.testing.assert_allclose(np.asarray(got["boxes"]),
                                   np.asarray(ref["boxes"]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got["labels"]),
                                      np.asarray(ref["labels"]))


def test_two_stage_export_round_trip(tmp_path):
    """The fused two-stage pipeline (detector -> filter -> compaction ->
    crops -> pose -> decode) exports as ONE artifact and the reloaded
    program matches the live build_fused_two_stage program exactly."""
    from stlpose_tpu.config import get_hrnet_config
    from stlpose_tpu.engines.vase_evaluator import build_fused_two_stage
    from stlpose_tpu.models import PoseHighResolutionNet, fold_batchnorms
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from stlpose_tpu.serving.export import (export_two_stage_server,
                                            load_pose_server)

    det = FasterRCNN(FASTER_RCNN_TINY)
    dv = det.init(jax.random.PRNGKey(0))
    pose = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
    pv = pose.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 256, 192, 3)), train=False)

    out = export_two_stage_server(
        dv, pv, str(tmp_path / "two_stage"), family="faster_rcnn",
        det_config=FASTER_RCNN_TINY, pose_config_name="tiny",
        bbox_thr=0.0, max_dets=4, static_batch=2, platforms=("cpu",))
    serve, manifest = load_pose_server(out)
    assert manifest["pipeline"] == "two_stage"
    assert manifest["crop_budget"] == 8 and manifest["batch"] == 2

    rng = np.random.RandomState(2)
    S = det.config.image_size
    imgs = jnp.asarray(rng.rand(2, S, S, 3).astype(np.float32))
    pose_folded = PoseHighResolutionNet(config=get_hrnet_config("tiny"),
                                        folded=True)
    live = jax.jit(build_fused_two_stage(
        det, pose_folded, bbox_thr=0.0, max_dets=4, budget=8,
        pallas_crop=False))
    ref = live(dv, fold_batchnorms(pv), imgs)
    got = serve(dv, fold_batchnorms(pv), imgs)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k], np.float32),
                                   np.asarray(ref[k], np.float32),
                                   atol=1e-5, err_msg=k)

    # pallas baking demands a tpu-exclusive export
    with pytest.raises(ValueError, match="tpu"):
        export_two_stage_server(dv, pv, str(tmp_path / "bad"),
                                det_config=FASTER_RCNN_TINY,
                                pose_config_name="tiny",
                                platforms=("cpu",), pallas=True)


def test_two_stage_export_uint8_packed_round_trip(tmp_path):
    """The serving wire-format flavor: uint8 0-255 image ingest (4x
    fewer upload bytes, /255 on device) + packed single-buffer output
    (one D2H fetch per call). The reloaded artifact, driven with uint8
    images and unpacked via the manifest layout, must match the live
    f32 dict program on the equivalent [0,1] images."""
    from stlpose_tpu.config import get_hrnet_config
    from stlpose_tpu.engines.vase_evaluator import build_fused_two_stage
    from stlpose_tpu.models import PoseHighResolutionNet, fold_batchnorms
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from stlpose_tpu.serving.export import (export_two_stage_server,
                                            load_two_stage_server)

    det = FasterRCNN(FASTER_RCNN_TINY)
    dv = det.init(jax.random.PRNGKey(0))
    pose = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
    pv = pose.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 256, 192, 3)), train=False)

    out = export_two_stage_server(
        dv, pv, str(tmp_path / "ts_u8"), family="faster_rcnn",
        det_config=FASTER_RCNN_TINY, pose_config_name="tiny",
        bbox_thr=0.0, max_dets=4, static_batch=2, platforms=("cpu",),
        image_dtype="uint8", packed_output=True)
    serve, manifest = load_two_stage_server(out)
    assert manifest["packed_output"] is True
    assert manifest["input"]["images"][4].startswith("uint8")

    rng = np.random.RandomState(2)
    S = det.config.image_size
    u8 = rng.randint(0, 256, (2, S, S, 3)).astype(np.uint8)
    got = serve(dv, fold_batchnorms(pv), jnp.asarray(u8))

    pose_folded = PoseHighResolutionNet(config=get_hrnet_config("tiny"),
                                        folded=True)
    live = jax.jit(build_fused_two_stage(
        det, pose_folded, bbox_thr=0.0, max_dets=4, budget=8,
        pallas_crop=False))
    ref = live(dv, fold_batchnorms(pv),
               jnp.asarray(u8.astype(np.float32) / 255.0))
    for k in got:
        np.testing.assert_allclose(np.asarray(got[k], np.float32),
                                   np.asarray(ref[k], np.float32),
                                   atol=1e-3, err_msg=k)


def test_detector_export_uint8_ingest(tmp_path):
    """Detector artifact with the uint8 wire format matches f32 predict
    on the equivalent [0,1] images."""
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from stlpose_tpu.serving.export import (export_detector_server,
                                            load_pose_server)

    det = FasterRCNN(FASTER_RCNN_TINY)
    v = det.init(jax.random.PRNGKey(0))
    out = export_detector_server(v, str(tmp_path / "det_u8"),
                                 family="faster_rcnn",
                                 config=FASTER_RCNN_TINY,
                                 platforms=("cpu",), image_dtype="uint8")
    serve, manifest = load_pose_server(out)
    assert manifest["input"]["images"][4].startswith("uint8")
    rng = np.random.RandomState(1)
    S = det.config.image_size
    u8 = rng.randint(0, 256, (2, S, S, 3)).astype(np.uint8)
    got = serve(v, jnp.asarray(u8))
    ref = jax.jit(det.predict)(v, jnp.asarray(u8.astype(np.float32) / 255.0))
    np.testing.assert_allclose(np.asarray(got["boxes"]),
                               np.asarray(ref["boxes"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["scores"]),
                               np.asarray(ref["scores"]), atol=1e-5)


def test_two_stage_export_efficientdet(tmp_path):
    """Family swap: the two-stage artifact with an EfficientDet stage."""
    from stlpose_tpu.config import get_hrnet_config
    from stlpose_tpu.models import PoseHighResolutionNet
    from stlpose_tpu.models.efficientdet import (EfficientDet,
                                                 EFFICIENTDET_TINY)
    from stlpose_tpu.serving.export import (export_two_stage_server,
                                            load_pose_server)

    det = EfficientDet(EFFICIENTDET_TINY)
    dv = det.init(jax.random.PRNGKey(0))
    pose = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
    pv = pose.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 256, 192, 3)), train=False)
    out = export_two_stage_server(
        dv, pv, str(tmp_path / "ts_eff"), family="efficientdet",
        det_config=EFFICIENTDET_TINY, pose_config_name="tiny",
        bbox_thr=0.0, max_dets=4, static_batch=2, platforms=("cpu",))
    serve, manifest = load_pose_server(out)
    assert manifest["family"] == "efficientdet"
    rng = np.random.RandomState(3)
    S = det.config.image_size
    imgs = jnp.asarray(rng.rand(2, S, S, 3).astype(np.float32))
    got = serve(dv, fold_batchnorms(pv), imgs)
    assert np.asarray(got["crop_kpts"]).shape == (8, 17, 3)
    assert np.isfinite(np.asarray(got["img_kpts"])).all()


def test_two_stage_export_tpu_exclusive_bakes_pallas(tmp_path):
    """A platforms=("tpu",) two-stage export bakes the Mosaic kernels
    (crop warp + Faster R-CNN RoIAlign with a 128-channel FPN) into the
    artifact; lowering/serialization need no TPU."""
    import dataclasses
    from jax import export as jexport
    from stlpose_tpu.config import get_hrnet_config
    from stlpose_tpu.models import PoseHighResolutionNet
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from stlpose_tpu.serving.export import (export_two_stage_server,
                                            load_pose_server)

    cfg128 = dataclasses.replace(FASTER_RCNN_TINY, fpn_channels=128)
    det = FasterRCNN(cfg128, pallas_roi=True)
    dv = det.init(jax.random.PRNGKey(0))
    pose = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
    pv = pose.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 256, 192, 3)), train=False)
    out = export_two_stage_server(
        dv, pv, str(tmp_path / "ts_tpu"), family="faster_rcnn",
        det_config=cfg128, pose_config_name="tiny", bbox_thr=0.5,
        max_dets=4, static_batch=2, platforms=("tpu",))
    txt = jexport.deserialize(
        (tmp_path / "ts_tpu" / "model.stablehlo").read_bytes()
    ).mlir_module()
    assert "tpu_custom_call" in txt
    _, manifest = load_pose_server(str(tmp_path / "ts_tpu"))
    assert manifest["pallas"] and manifest["platforms"] == ["tpu"]


def test_pose_export_flip_tta_flavor(tmp_path):
    """flip_tta=True bakes the eval-grade doubled-batch TTA program; the
    artifact matches the live flip-TTA forward exactly and differs from
    the plain artifact."""
    from stlpose_tpu.ops.flip import average_flip_tta_nhwc

    variables = _make_variables()
    out = export_pose_server(variables, str(tmp_path / "tta"),
                             config_name=CONFIG, input_hw=HW,
                             platforms=("cpu",), flip_tta=True)
    serve, manifest = load_pose_server(out)
    assert manifest["flip_tta"]

    folded = fold_batchnorms(variables)
    model = create_hrnet(CONFIG, dtype=jnp.bfloat16, folded=True)
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0

    rng = np.random.RandomState(4)
    crops = jnp.asarray(rng.randint(0, 256, (3,) + HW + (3,),
                                    dtype=np.uint8))
    centers = jnp.asarray(rng.uniform(50, 200, (3, 2)), jnp.float32)
    scales = jnp.ones((3, 2), jnp.float32)
    got = serve(folded, crops, centers, scales)

    x = (crops.astype(jnp.float32) - mean) / std
    both = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
    hm_all = model.apply(folded, both, train=False)
    hm = average_flip_tta_nhwc(hm_all[:3], hm_all[3:])
    preds, maxvals, _ = decode_heatmaps_nhwc(hm, centers, scales)
    np.testing.assert_allclose(np.asarray(got["keypoints"]),
                               np.asarray(preds), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["scores"]),
                               np.asarray(maxvals), atol=1e-5)


def test_two_stage_export_trunk_folded_matches_live_flavor(tmp_path):
    """export_two_stage_server(trunk_quant="folded") transforms the
    live-BN detector variables internally and the artifact matches the
    plain (live-trunk) artifact's outputs — folding is exact algebra, so
    the two serving programs must agree on every output."""
    from stlpose_tpu.config import get_hrnet_config
    from stlpose_tpu.models import PoseHighResolutionNet, fold_batchnorms
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from stlpose_tpu.models.quantize import fold_frcnn_trunk
    from stlpose_tpu.serving.export import (export_two_stage_server,
                                            load_pose_server)

    det = FasterRCNN(FASTER_RCNN_TINY)
    dv = det.init(jax.random.PRNGKey(0))
    pose = PoseHighResolutionNet(config=get_hrnet_config("tiny"))
    pv = pose.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 256, 192, 3)), train=False)

    kw = dict(family="faster_rcnn", det_config=FASTER_RCNN_TINY,
              pose_config_name="tiny", bbox_thr=0.0, max_dets=4,
              static_batch=2, platforms=("cpu",))
    live_dir = export_two_stage_server(dv, pv, str(tmp_path / "live"), **kw)
    fold_dir = export_two_stage_server(dv, pv, str(tmp_path / "folded"),
                                       trunk_quant="folded", **kw)
    serve_live, _ = load_pose_server(live_dir)
    serve_fold, mf = load_pose_server(fold_dir)
    assert mf["trunk_quant"] == "folded"

    rng = np.random.RandomState(2)
    S = det.config.image_size
    imgs = jnp.asarray(rng.rand(2, S, S, 3).astype(np.float32))
    pvf = fold_batchnorms(pv)
    a = serve_live(dv, pvf, imgs)
    # the folded artifact's call convention takes the TRANSFORMED trunk
    # variables (same transform the manifest records, reproducible on
    # the serving host from the live checkpoint)
    b = serve_fold(fold_frcnn_trunk(dv), pvf, imgs)
    assert set(a.keys()) == set(b.keys())
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k], np.float32),
                                   np.asarray(b[k], np.float32),
                                   atol=2e-3, rtol=1e-4, err_msg=k)
