"""End-to-end slice: 01 create experiment -> 02 train (tiny HRNet, synthetic
COCO) -> 03 evaluate with submission + COCO keypoint AP (SURVEY.md §7 build
step 4/5)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from stlpose_tpu.config import CONFIG
from stlpose_tpu.engines import PoseTrainer, PoseEvaluator
from stlpose_tpu.utils.experiment import create_experiment
from tests.fixtures import make_coco_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    data = root / "data"
    make_coco_dataset(str(data), n_train=6, n_val=4)
    exp_path = create_experiment(
        "e2e", {"batch_size": 4, "num_epochs": 2, "save_frequency": 1,
                "scale_factor": 0.25, "rot_factor": 15, "flip": True},
        root=str(root / "experiments"))
    return str(data), exp_path


class TestTrainEval:
    def test_trainer_two_epochs(self, workspace):
        data, exp_path = workspace
        tr = PoseTrainer(exp_path, data_path=data, num_workers=2,
                         make_plots=False)
        tr.load_dataset()
        tr.setup_model(config_name="tiny", pretrained=None)
        tr.training_loop()

        logs = json.load(open(os.path.join(exp_path, "training_logs.json")))
        assert len(logs["loss"]["training"]) == 2
        assert all(np.isfinite(v) for v in logs["loss"]["training"])
        # checkpoints for epoch 0, 1 and final
        models = os.listdir(os.path.join(exp_path, "models"))
        assert any("epoch_0" in m for m in models)
        assert any("final" in m for m in models)

    def test_evaluator_full_pass(self, workspace):
        data, exp_path = workspace
        ev = PoseEvaluator(exp_path, checkpoint="final", data_path=data,
                           num_workers=2, flip=True)
        ev.setup_model_dataset(config_name="tiny", pretrained=None)
        stats = ev.evaluate_model()
        assert stats.shape == (10,)
        # untrained tiny net: AP in [ -1 (undefined) .. 1 ]
        assert -1 <= stats[0] <= 1
        # submission file exists and is valid COCO results
        preds = json.load(open(ev.preds_file))
        assert len(preds) > 0
        assert all(len(p["keypoints"]) == 51 for p in preds)
        # stats JSON keyed by checkpoint
        stats_files = [f for f in os.listdir(exp_path)
                       if f.startswith("evaluation_stats")]
        assert stats_files
        blob = json.load(open(os.path.join(exp_path, stats_files[0])))
        assert "final" in blob

    def test_evaluator_bf16_knob(self, workspace, monkeypatch):
        """STLPOSE_DTYPE=bfloat16 — the knob every engine honors and the
        dtype the headline bench runs in — drives the full evaluator and
        lands within the serving-accuracy band of the f32 pass
        (tests/test_bf16_accuracy.py pins the tight bound)."""
        data, exp_path = workspace
        monkeypatch.setenv("STLPOSE_DTYPE", "bfloat16")
        ev = PoseEvaluator(exp_path, checkpoint="final", data_path=data,
                           num_workers=2, flip=True)
        ev.setup_model_dataset(config_name="tiny", pretrained=None)
        import jax.numpy as jnp
        assert ev.model.dtype == jnp.bfloat16
        stats16 = ev.evaluate_model()
        assert np.isfinite(stats16).all()
        monkeypatch.delenv("STLPOSE_DTYPE")
        ev32 = PoseEvaluator(exp_path, checkpoint="final", data_path=data,
                             num_workers=2, flip=True)
        ev32.setup_model_dataset(config_name="tiny", pretrained=None)
        stats32 = ev32.evaluate_model()
        # barely-trained tiny model: ties flip freely, so only a sanity
        # band here; the calibrated bound lives in test_bf16_accuracy
        assert abs(float(stats16[0]) - float(stats32[0])) < 0.3

    def test_resume_from_checkpoint(self, workspace):
        data, exp_path = workspace
        tr = PoseTrainer(exp_path, checkpoint="1", resume_training=True,
                         data_path=data, num_workers=2, make_plots=False)
        tr.load_dataset()
        tr.setup_model(config_name="tiny", pretrained=None)
        assert tr.cur_epoch == 1
        assert int(tr.state.step) > 0


class TestCreateExperimentCLI:
    def test_script_creates_contract(self, tmp_path):
        env = dict(os.environ, STLPOSE_EXPERIMENTS_PATH=str(tmp_path),
                   PALLAS_AXON_POOL_IPS="")
        out = subprocess.run(
            [sys.executable, "scripts/01_create_experiment.py",
             "-d", "cli_test", "--batch_size", "16",
             "--dataset_name", "styled_coco"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert out.returncode == 0, out.stderr
        exp_path = out.stdout.strip().splitlines()[-1]
        params = json.load(open(os.path.join(exp_path,
                                             "experiment_parameters.json")))
        assert params["training"]["batch_size"] == 16
        assert params["dataset"]["dataset_name"] == "styled_coco"
        assert params["training"]["num_epochs"] == 100      # default kept
        assert os.path.isdir(os.path.join(exp_path, "models"))
        assert os.path.isdir(os.path.join(exp_path, "plots"))
        assert os.path.exists(os.path.join(exp_path, "logs.txt"))


def test_aux_train_adain_decoder_cli(tmp_path):
    """aux_train_adain_decoder.py argument contract: trains a few steps on
    tiny directories and writes the npz that aux_styled_coco_preload.py
    --decoder_ckpt consumes."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    for d in ("content", "style"):
        os.makedirs(tmp_path / d)
        for i in range(3):
            img = (rng.rand(48, 40, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(tmp_path / d / f"{i}.png"), img)
    out_npz = tmp_path / "decoder.npz"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/aux_train_adain_decoder.py",
         "--content_dir", str(tmp_path / "content"),
         "--style_dir", str(tmp_path / "style"),
         "--out", str(out_npz), "--steps", "3", "--batch_size", "2",
         "--size", "32", "--log_every", "2"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    blob = np.load(out_npz, allow_pickle=True)
    params = blob["params"].item()
    assert "dec0" in params and "dec5" in params


def test_serving_export_cli_from_checkpoint(workspace):
    """08_export_serving exports the trained final checkpoint as a
    loadable StableHLO artifact (depends on test_trainer_two_epochs
    having produced <exp>/models/final)."""
    data, exp_path = workspace
    if not any("final" in m
               for m in os.listdir(os.path.join(exp_path, "models"))):
        pytest.skip("trainer test did not run first")
    env = dict(os.environ, STLPOSE_MODEL_CONFIG="tiny",
               STLPOSE_PRETRAINED="")
    out = subprocess.run(
        [sys.executable, "scripts/08_export_serving.py", "-d", exp_path,
         "--checkpoint", "final", "--platforms", "cpu"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    export_dir = os.path.join(exp_path, "serving_export")
    assert os.path.exists(os.path.join(export_dir, "model.stablehlo"))
    manifest = json.load(open(os.path.join(export_dir, "manifest.json")))
    assert manifest["config"] == "tiny" and manifest["bn_folded"]


def test_inline_style_train_cli(tmp_path):
    """BASELINE config #4 from the CLI alone: 01_create_experiment
    --inline_style_dir ... -> 02_train runs the inline-AdaIN-stylized
    training pipeline end-to-end (the reference's offline styled-dirs
    path, data/data_loaders.py:84-100, upgraded to an in-pipeline stage)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    make_coco_dataset(str(data), n_train=4, n_val=2)
    sdir = tmp_path / "styles"
    os.makedirs(sdir)
    for i in range(2):
        cv2.imwrite(str(sdir / f"s{i}.png"),
                    (rng.rand(64, 48, 3) * 255).astype(np.uint8))

    env = dict(os.environ, STLPOSE_EXPERIMENTS_PATH=str(tmp_path / "exp"),
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               STLPOSE_MODEL_CONFIG="tiny", STLPOSE_PRETRAINED="")
    out = subprocess.run(
        [sys.executable, "scripts/01_create_experiment.py",
         "-d", "inline_style", "--batch_size", "4", "--num_epochs", "1",
         "--save_frequency", "1",
         "--inline_style_dir", str(sdir), "--inline_style_alpha", "0.7"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    exp_path = out.stdout.strip().splitlines()[-1]
    params = json.load(open(os.path.join(exp_path,
                                         "experiment_parameters.json")))
    assert params["dataset"]["inline_style"]["style_dir"] == str(sdir)
    assert params["dataset"]["inline_style"]["alpha"] == 0.7

    out = subprocess.run(
        [sys.executable, "scripts/02_train.py", "-d", exp_path,
         "--data_path", str(data)],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    logs = json.load(open(os.path.join(exp_path, "training_logs.json")))
    assert len(logs["loss"]["training"]) == 1
    assert np.isfinite(logs["loss"]["training"][0])


def test_serving_export_cli_int8(workspace, tmp_path):
    """08_export_serving --quant int8 --calib_images <npy>: the PTQ
    serving flavor is reachable from the CLI contract (library path
    bounded by tests/test_int8_accuracy.py)."""
    data, exp_path = workspace
    rng = np.random.RandomState(1)
    calib = rng.randint(0, 256, (4, 256, 192, 3), dtype=np.uint8)
    calib_npy = str(tmp_path / "calib.npy")
    np.save(calib_npy, calib)
    env = dict(os.environ, STLPOSE_MODEL_CONFIG="tiny",
               STLPOSE_PRETRAINED="", PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    out_dir = os.path.join(exp_path, "int8_export")
    out = subprocess.run(
        [sys.executable, "scripts/08_export_serving.py", "-d", exp_path,
         "--platforms", "cpu", "--quant", "int8",
         "--calib_images", calib_npy, "--out", out_dir],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert manifest["quant"] == "int8"
    assert manifest["compute_dtype"].startswith("int8")
    assert os.path.exists(os.path.join(out_dir, "model.stablehlo"))


def test_two_stage_export_cli(workspace):
    """08_export_serving --pipeline two_stage exports the fused
    detector->crops->pose artifact from the experiment + env config."""
    data, exp_path = workspace
    env = dict(os.environ, STLPOSE_MODEL_CONFIG="tiny",
               STLPOSE_DETECTOR_CONFIG="faster_rcnn_tiny",
               STLPOSE_PRETRAINED="", PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    out_dir = os.path.join(exp_path, "two_stage_export")
    out = subprocess.run(
        [sys.executable, "scripts/08_export_serving.py", "-d", exp_path,
         "--pipeline", "two_stage", "--platforms", "cpu",
         "--batch", "2", "--max_dets", "4", "--out", out_dir],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert manifest["pipeline"] == "two_stage"
    assert manifest["family"] == "faster_rcnn"
    assert manifest["batch"] == 2 and manifest["crop_budget"] == 8
    assert os.path.exists(os.path.join(out_dir, "model.stablehlo"))


def test_detector_export_cli_trunk_int8(workspace, tmp_path):
    """08_export_serving --pipeline detector --trunk_quant int8: the
    detector-stage artifact with the PTQ ResNet trunk is reachable from
    the CLI contract (library path bounded by tests/test_trunk_quant.py)."""
    data, exp_path = workspace
    rng = np.random.RandomState(2)
    S = 128                                     # faster_rcnn_tiny image_size
    calib = rng.randint(0, 256, (2, S, S, 3), dtype=np.uint8)
    calib_npy = str(tmp_path / "det_calib.npy")
    np.save(calib_npy, calib)
    env = dict(os.environ, STLPOSE_MODEL_CONFIG="tiny",
               STLPOSE_DETECTOR_CONFIG="faster_rcnn_tiny",
               STLPOSE_PRETRAINED="", PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    out_dir = os.path.join(exp_path, "detector_trunk_export")
    out = subprocess.run(
        [sys.executable, "scripts/08_export_serving.py", "-d", exp_path,
         "--pipeline", "detector", "--platforms", "cpu", "--batch", "2",
         "--trunk_quant", "int8", "--calib_images", calib_npy,
         "--out", out_dir],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert manifest["pipeline"] == "detector"
    assert manifest["family"] == "faster_rcnn"
    assert manifest["trunk_quant"] == "int8"
    assert os.path.exists(os.path.join(out_dir, "model.stablehlo"))


def test_two_stage_export_cli_trunk_int8(workspace, tmp_path):
    """08_export_serving --pipeline two_stage --trunk_quant int8: the
    FUSED detect->crop->pose artifact with the PTQ ResNet trunk — the
    bench's full-quantized-stack two-stage configuration — is reachable
    from the CLI contract (library path bounded by
    tests/test_serving_export.py's trunk-folded round trip)."""
    data, exp_path = workspace
    rng = np.random.RandomState(3)
    S = 128                                     # faster_rcnn_tiny image_size
    calib = rng.randint(0, 256, (2, S, S, 3), dtype=np.uint8)
    calib_npy = str(tmp_path / "ts_calib.npy")
    np.save(calib_npy, calib)
    env = dict(os.environ, STLPOSE_MODEL_CONFIG="tiny",
               STLPOSE_DETECTOR_CONFIG="faster_rcnn_tiny",
               STLPOSE_PRETRAINED="", PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    out_dir = os.path.join(exp_path, "two_stage_trunk_export")
    out = subprocess.run(
        [sys.executable, "scripts/08_export_serving.py", "-d", exp_path,
         "--pipeline", "two_stage", "--platforms", "cpu", "--batch", "2",
         "--max_dets", "4", "--trunk_quant", "int8",
         "--calib_images", calib_npy, "--out", out_dir],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert manifest["pipeline"] == "two_stage"
    assert manifest["family"] == "faster_rcnn"
    assert manifest["trunk_quant"] == "int8"
    assert os.path.exists(os.path.join(out_dir, "model.stablehlo"))
