"""Real-weights AP parity, one command away (VERDICT r1 item 5).

Synthesizes a genuine full-W32 torch ``.pth`` (the exact on-disk format of
the published ``pose_hrnet_w32_256x192.pth``, reference
lib/model_setup.py:39-42), then proves

  1. the disk-loading path (``load_pretrained_variables``) is bit-identical
     to the in-memory converter path,
  2. the loaded weights reproduce the torch oracle's forward at the real
     256x192 geometry,
  3. ``scripts/03_evaluate.py`` with ``STLPOSE_PRETRAINED=<that file>``
     runs the FULL convert -> flip-TTA eval -> submission -> COCOeval AP
     chain end to end on a synthetic mini-COCO.

After this, the only untested step toward true parity is mounting the
public weights + COCO val (scripts/RUNBOOK_AP_PARITY.md).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from stlpose_tpu.config import get_hrnet_config
from stlpose_tpu.models import PoseHighResolutionNet
from stlpose_tpu.models.convert import (load_torch_statedict,
                                        torch_statedict_to_flax)
from stlpose_tpu.utils.checkpoint import load_pretrained_variables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def w32_pth(tmp_path_factory):
    """A real .pth holding a full-W32 state_dict with non-trivial BN
    statistics, exactly the published checkpoint's layout."""
    torch = pytest.importorskip("torch")
    from tests.torch_hrnet import TorchHRNet

    cfg = get_hrnet_config("w32_256x192")
    tm = TorchHRNet(cfg).eval()
    gen = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.num_features, generator=gen) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.num_features, generator=gen) + 0.5)
    path = str(tmp_path_factory.mktemp("res") / "pose_hrnet_w32_256x192.pth")
    torch.save(tm.state_dict(), path)
    return cfg, tm, path


class TestDiskPathParity:
    def test_disk_load_bit_identical_to_converter(self, w32_pth):
        cfg, _, path = w32_pth
        model = PoseHighResolutionNet(config=cfg)
        from_disk = load_pretrained_variables(model, path)
        in_memory = torch_statedict_to_flax(load_torch_statedict(path))
        flat_d = jax.tree_util.tree_leaves_with_path(from_disk)
        flat_m = dict(jax.tree_util.tree_leaves_with_path(in_memory))
        assert len(flat_d) == len(flat_m) > 0
        for p, v in flat_d:
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(flat_m[p]),
                                          err_msg=str(p))

    def test_loaded_weights_match_torch_at_real_geometry(self, w32_pth):
        import torch
        cfg, tm, path = w32_pth
        model = PoseHighResolutionNet(config=cfg)
        variables = load_pretrained_variables(model, path)
        x = np.random.RandomState(3).randn(1, 3, 256, 192).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()       # (1, 17, 64, 48)
        out = model.apply(variables,
                          np.transpose(x, (0, 2, 3, 1)), train=False)
        got = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestOneCommandEval:
    def test_03_evaluate_with_pretrained_pth(self, w32_pth, tmp_path):
        """The runbook command, verbatim, on a synthetic mini-COCO."""
        from tests.fixtures import make_coco_dataset
        from stlpose_tpu.utils.experiment import create_experiment

        _, _, pth = w32_pth
        data = tmp_path / "data"
        make_coco_dataset(str(data), n_train=2, n_val=2, people_per_img=1)
        exp_path = create_experiment(
            "parity", {"batch_size": 4, "eval_batch_size": 4},
            root=str(tmp_path / "experiments"))

        env = dict(os.environ,
                   PALLAS_AXON_POOL_IPS="",
                   JAX_PLATFORMS="cpu",
                   STLPOSE_PRETRAINED=pth,
                   STLPOSE_MODEL_CONFIG="w32_256x192")
        out = subprocess.run(
            [sys.executable, "scripts/03_evaluate.py", "-d", exp_path,
             "--data_path", str(data)],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=3000)
        assert out.returncode == 0, out.stderr[-4000:]
        assert "AP:" in out.stdout

        # full chain artifacts: submission file + stats JSON
        preds = json.load(open(os.path.join(
            exp_path, "submission_dict.json")))
        assert preds and all(len(p["keypoints"]) == 51 for p in preds)
        stats_files = [f for f in os.listdir(exp_path)
                       if f.startswith("evaluation_stats")]
        assert stats_files
        blob = json.load(open(os.path.join(exp_path, stats_files[0])))
        per_ckpt = list(blob.values())[0]      # {stat_name: value}
        assert len(per_ckpt) >= 10
