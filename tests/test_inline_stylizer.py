"""Inline AdaIN stylization as an input-pipeline stage (BASELINE config #4:
'style-transfer-augmented training with the VGG stylizer inline')."""

import numpy as np
import pytest

from stlpose_tpu.config import default_experiment_args
from stlpose_tpu.data.loaders import build_pose_records
from stlpose_tpu.data.pipeline import PoseDataPipeline
from stlpose_tpu.models.adain import AdaINStylizer
from tests.fixtures import make_coco_dataset


def test_stylized_pipeline_batches(tmp_path, rng):
    make_coco_dataset(str(tmp_path), n_train=2, n_val=2, img_hw=(200, 260))
    exp = default_experiment_args()
    records = build_pose_records(exp, "train", data_path=str(tmp_path))

    stylizer = AdaINStylizer()
    style_bank = rng.rand(3, 256, 192, 3).astype(np.float32)

    plain = PoseDataPipeline(records, 4, is_train=True, exp_data=exp,
                             num_workers=2)
    styled = PoseDataPipeline(records, 4, is_train=True, exp_data=exp,
                              num_workers=2, stylizer=stylizer,
                              style_bank=style_bank, style_alpha=0.8)
    b0 = next(iter(plain))
    b1 = next(iter(styled))
    assert b1["image"].shape == b0["image"].shape
    assert np.isfinite(np.asarray(b1["image"])).all()
    # stylization must actually change the pixels...
    assert np.abs(np.asarray(b1["image"]) - np.asarray(b0["image"])).mean() \
        > 1e-3
    # ...but not the geometry: targets/weights identical
    np.testing.assert_allclose(np.asarray(b1["target"]),
                               np.asarray(b0["target"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1["target_weight"]),
                               np.asarray(b0["target_weight"]), atol=1e-6)


def _make_style_dir(root, rng, n=2):
    import os
    cv2 = pytest.importorskip("cv2")
    d = os.path.join(str(root), "styles")
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        cv2.imwrite(os.path.join(d, f"s{i}.png"),
                    (rng.rand(64, 48, 3) * 255).astype(np.uint8))
    return d


def test_load_dataset_wires_inline_style(tmp_path, rng):
    """dataset.inline_style reaches the pipeline through load_dataset —
    the CLI contract (02_train constructs nothing by hand)."""
    from stlpose_tpu.data.loaders import load_dataset

    make_coco_dataset(str(tmp_path), n_train=2, n_val=2, img_hw=(200, 260))
    sdir = _make_style_dir(tmp_path, rng)
    exp = default_experiment_args()
    exp["training"]["batch_size"] = 4

    tp_plain, vp_plain = load_dataset(exp, data_path=str(tmp_path),
                                      num_workers=2)
    assert tp_plain.stylizer is None

    exp["dataset"]["inline_style"] = {"style_dir": sdir, "alpha": 0.8}
    tp, vp = load_dataset(exp, data_path=str(tmp_path), num_workers=2)
    assert tp.stylizer is not None and tp.style_bank is not None
    assert tp.style_alpha == 0.8
    # validation stays unstylized unless apply_to_valid
    assert vp.stylizer is None

    b0 = next(iter(tp_plain))
    b1 = next(iter(tp))
    assert np.abs(np.asarray(b1["image"]) -
                  np.asarray(b0["image"])).mean() > 1e-3
    np.testing.assert_allclose(np.asarray(b1["target"]),
                               np.asarray(b0["target"]), atol=1e-5)

    exp["dataset"]["inline_style"]["apply_to_valid"] = True
    _, vp2 = load_dataset(exp, data_path=str(tmp_path), num_workers=2)
    assert vp2.stylizer is not None


def test_build_inline_stylizer_decoder_ckpt(tmp_path, rng):
    """decoder_ckpt npz (aux_train_adain_decoder output format) loads into
    the stylizer; style bank is resized to the crop shape."""
    import jax
    from stlpose_tpu.models.adain import (AdaINStylizer,
                                          build_inline_stylizer)

    sdir = _make_style_dir(tmp_path, rng, n=3)
    ref = AdaINStylizer()
    blob = {"params": np.asarray(
        jax.tree_util.tree_map(np.asarray,
                               ref.dec_variables["params"]), dtype=object)}
    ckpt = str(tmp_path / "dec.npz")
    np.savez(ckpt, **blob)

    stylizer, bank, alpha = build_inline_stylizer(
        {"style_dir": sdir, "decoder_ckpt": ckpt, "alpha": 0.5},
        crop_hw=(256, 192))
    assert bank.shape == (3, 256, 192, 3) and alpha == 0.5
    assert bank.min() >= 0.0 and bank.max() <= 1.0
    # loaded decoder params == the source params (round-trip)
    got = jax.tree_util.tree_leaves(stylizer.dec_variables)
    want = jax.tree_util.tree_leaves(ref.dec_variables)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # off-switch contract
    assert build_inline_stylizer(None) == (None, None, 1.0)
    assert build_inline_stylizer({}) == (None, None, 1.0)


def test_inline_style_rejects_device_warp(tmp_path, rng):
    make_coco_dataset(str(tmp_path), n_train=2, n_val=1, img_hw=(200, 260))
    exp = default_experiment_args()
    records = build_pose_records(exp, "train", data_path=str(tmp_path))
    with pytest.raises(ValueError, match="device_warp"):
        PoseDataPipeline(records, 4, is_train=True, exp_data=exp,
                         num_workers=2, device_warp=True,
                         stylizer=AdaINStylizer(),
                         style_bank=rng.rand(2, 256, 192, 3))


def test_detection_pipeline_inline_style(tmp_path, rng):
    """The detector-side mirror of the inline-style hook: canvases are
    stylized on device, boxes/labels/masks untouched (photometric only),
    reachable through dataset.inline_style like the pose pipeline."""
    from stlpose_tpu.data.loaders import get_detection_dataset
    from tests.fixtures import make_coco_dataset as _mk

    _mk(str(tmp_path), n_train=3, n_val=2, img_hw=(200, 260))
    sdir = _make_style_dir(tmp_path, rng)
    exp = default_experiment_args()
    exp["training"]["batch_size"] = 2
    exp["dataset"]["image_size"] = 128

    plain = get_detection_dataset(exp, "train", num_workers=2,
                                  data_path=str(tmp_path))
    exp["dataset"]["inline_style"] = {"style_dir": sdir, "alpha": 0.8}
    styled = get_detection_dataset(exp, "train", num_workers=2,
                                   data_path=str(tmp_path))
    assert styled.stylizer is not None
    assert styled.style_bank.shape[1:3] == (128, 128)
    b0 = next(iter(plain))
    b1 = next(iter(styled))
    assert np.asarray(b1["image"]).shape == np.asarray(b0["image"]).shape
    assert np.abs(np.asarray(b1["image"]) -
                  np.asarray(b0["image"])).mean() > 1e-3
    np.testing.assert_allclose(b1["boxes"], b0["boxes"], atol=1e-6)
    np.testing.assert_array_equal(b1["labels"], b0["labels"])
    np.testing.assert_allclose(b1["box_mask"], b0["box_mask"], atol=1e-6)
    # valid split stays unstylized unless apply_to_valid
    v = get_detection_dataset(exp, "valid", num_workers=2,
                              data_path=str(tmp_path))
    assert v.stylizer is None
    exp["dataset"]["inline_style"]["apply_to_valid"] = True
    v2 = get_detection_dataset(exp, "valid", num_workers=2,
                               data_path=str(tmp_path))
    assert v2.stylizer is not None
