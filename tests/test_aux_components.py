"""Pose entries / COCO converters, multihost helpers, profiling utils."""

import numpy as np
import pytest

from stlpose_tpu.ops.pose_entries import (create_pose_entries,
                                          convert_to_coco_format,
                                          unnormalize)
from stlpose_tpu.parallel.distributed import (host_slice, all_gather_host,
                                              process_count)
from stlpose_tpu.utils.profiling import StepTimer, trace


class TestPoseEntries:
    def test_entries_and_counts(self, rng):
        kpts = rng.uniform(0, 100, (2, 17, 2))
        kpts[1, 5:] = -1                       # second pose mostly missing
        maxvals = np.ones((2, 17))
        maxvals[0, 0] = 0.01                   # below threshold
        entries, all_kp = create_pose_entries(kpts, maxvals, thr=0.1)
        assert len(entries) == 2
        assert all_kp.shape == (34, 4)
        assert entries[0][-1] == 17            # all slots indexed
        assert entries[1][-1] == 5
        assert all_kp[0, -1] == 0              # sub-threshold flag cleared
        assert (all_kp[17 + 5] == -1).all()    # missing keypoint rows

    def test_coco_format_roundtrip(self, rng):
        kpts = rng.uniform(0, 100, (1, 17, 2))
        entries, all_kp = create_pose_entries(kpts)
        coco, scores = convert_to_coco_format(entries, all_kp)
        assert len(coco) == 1 and len(coco[0]) == 51
        np.testing.assert_allclose(coco[0][0:2], kpts[0, 0], atol=1e-9)
        assert scores[0] == 1 * 16             # score * (count - 1)

    def test_empty_pose_list(self):
        coco, scores = convert_to_coco_format([], np.zeros((0, 4)))
        assert coco == [[0.0] * 51] and scores == [0.0]

    def test_unnormalize_roundtrip(self, rng):
        img01 = rng.rand(8, 8, 3).astype(np.float32)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        normed = (img01 - mean) / std
        back = unnormalize(normed)
        np.testing.assert_allclose(back, img01, atol=1e-5)
        # 0-255 passthrough
        np.testing.assert_allclose(unnormalize(img01 * 255.0), img01,
                                   atol=1e-5)


class TestDistributed:
    def test_single_host_degenerate(self):
        assert process_count() == 1
        assert host_slice(100) == slice(0, 100)
        x = {"a": np.arange(5)}
        out = all_gather_host(x)
        np.testing.assert_array_equal(out["a"], x["a"])


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(warmup=1)
        for _ in range(5):
            t.tick(32)
        s = t.stats()
        assert s["steps_per_sec"] > 0
        assert s["examples_per_sec"] > 0

    def test_trace_writes_files(self, tmp_path):
        import jax.numpy as jnp
        import jax
        with trace(str(tmp_path / "prof")):
            jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
        import os
        found = []
        for root, _, files in os.walk(tmp_path / "prof"):
            found += files
        assert found, "no profiler artifacts written"
