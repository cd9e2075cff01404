"""Retrieval subsystem: pose-vector processing, native HNSW, neighbor
search with penalizations, retrieval metrics, and the 05/06/07 flow."""

import json
import os
import pickle

import numpy as np
import pytest

from stlpose_tpu.retrieval import (process_pose_vector, process_data,
                                   create_graph, save_knn_structure,
                                   load_knn, get_neighbors_idxs,
                                   score_retrievals, confidence_score,
                                   oks_score, Index)
from stlpose_tpu.retrieval.hnsw import native_available


class TestPoseVector:
    def test_subset_dims(self, rng):
        joints = rng.rand(17, 3)
        assert process_pose_vector(joints, "all_kpts").shape == (34,)
        assert process_pose_vector(joints, "full_body").shape == (26,)
        assert process_pose_vector(joints, "upper_body").shape == (18,)

    def test_nose_centering_and_zeros(self, rng):
        joints = rng.rand(17, 3) + 1.0
        joints[7, :2] = 0                       # occluded keypoint
        v = process_pose_vector(joints, "all_kpts", normalize=False)
        # nose (index 0 in subset) is subtracted -> first pair becomes 0
        assert v[0] == 0 and v[1] == 0
        # occluded joints stay exactly zero
        assert v[14] == 0 and v[15] == 0        # joint 7 -> positions 14,15
        # other joints are nose-centered
        assert v[2] == pytest.approx(joints[1, 0] - joints[0, 0])

    def test_normalization(self, rng):
        joints = rng.rand(17, 3) * 100
        v = process_pose_vector(joints, "full_body", normalize=True)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-6)

    def test_batched_matches_single(self, rng):
        joints = rng.rand(8, 17, 3) * 50
        batch = process_data(joints, "full_body", normalize=True)
        for i in range(8):
            single = process_pose_vector(joints[i], "full_body", True)
            np.testing.assert_allclose(batch[i], single, atol=1e-12)


class TestHNSW:
    def test_native_library_builds(self):
        assert native_available()

    @pytest.mark.parametrize("space", ["l2", "cosine"])
    def test_recall_vs_exact(self, rng, space):
        data = rng.randn(1500, 26).astype(np.float32)
        idx = Index(space, 26)
        idx.init_index(1500, ef_construction=200, M=8)
        idx.set_ef(200)
        idx.add_items(data, np.arange(1500))
        q = data[:30]
        ids, dists = idx.knn_query(q, k=5)
        if space == "l2":
            d = ((q[:, None] - data[None]) ** 2).sum(-1)
        else:
            dn = data / np.linalg.norm(data, axis=1, keepdims=True)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            d = 1 - qn @ dn.T
        exact = np.argsort(d, axis=1)[:, :5]
        recall = np.mean([len(set(ids[i].tolist()) &
                              set(exact[i].tolist())) / 5
                          for i in range(30)])
        assert recall > 0.95, recall
        assert (ids[:, 0] == np.arange(30)).all()   # self is nearest

    def test_save_load_roundtrip(self, rng, tmp_path):
        data = rng.randn(300, 10).astype(np.float32)
        idx = Index("l2", 10)
        idx.init_index(300, 100, 8)
        idx.set_ef(100)
        idx.add_items(data)
        path = str(tmp_path / "graph.bin")
        idx.save_index(path)
        idx2 = Index("l2", 10)
        idx2.load_index(path)
        idx2.set_ef(100)
        ids1, _ = idx.knn_query(data[:10], k=3)
        ids2, _ = idx2.knn_query(data[:10], k=3)
        np.testing.assert_array_equal(ids1, ids2)


class TestRetrievalMetrics:
    def test_score_retrievals_known_values(self):
        # self + ranked list; 3 relevant in ranks 1,2,4 (after self-drop)
        retrievals = ["a", "a", "a", "b", "a", "b", "c", "d", "e", "f", "g"]
        m = score_retrievals("a", retrievals)
        assert m["p@1"] == 1.0
        assert m["p@5"] == pytest.approx(3 / 5)
        # r@rel = recall at rank n_rel (reference: lib/metrics.py:73)
        assert m["r@rel"] == pytest.approx(2 / 3)
        assert m["mAP"] == pytest.approx((1 + 1 + 3 / 4) / 3)

    def test_singleton_label_sentinel(self):
        m = score_retrievals("z", ["z", "a", "b", "c"])
        assert m["mAP"] == -1

    def test_oks_score_zero_distance(self):
        v = np.random.RandomState(0).rand(26)
        assert oks_score(v, v, "full_body") == pytest.approx(0.0, abs=1e-9)

    def test_confidence_score_increases_with_distance(self, rng):
        q = rng.rand(26)
        conf = np.ones(26)
        near = q + 0.01
        far = q + 1.0
        assert confidence_score(q, near, conf) < confidence_score(q, far, conf)


class TestNeighborSearch:
    def _clustered(self, rng, n_per=20, n_classes=4, dim=26):
        centers = rng.randn(n_classes, dim) * 5
        feats, labels = [], []
        for c in range(n_classes):
            feats.append(centers[c] + rng.randn(n_per, dim) * 0.3)
            labels += [c] * n_per
        return np.concatenate(feats).astype(np.float32), np.array(labels)

    def test_knn_method(self, rng):
        feats, labels = self._clustered(rng)
        knn = create_graph(feats, "euclidean_distance")
        idx, dists = get_neighbors_idxs(feats[0], num_retrievals=10,
                                        retrieval_method="knn", knn=knn,
                                        database=feats)
        assert labels[idx].tolist().count(labels[0]) >= 9

    @pytest.mark.parametrize("method", ["euclidean_distance",
                                        "cosine_similarity",
                                        "manhattan_distance", "oks_score"])
    def test_exhaustive_methods(self, rng, method):
        feats, labels = self._clustered(rng, n_per=10)
        if method == "cosine_similarity":
            # the reference's cosine method assumes L2-normalized vectors
            feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        idx, dists = get_neighbors_idxs(
            feats[0], num_retrievals=5, retrieval_method=method,
            penalization="none", database=feats,
            approach="full_body")
        assert int(idx[0]) == 0                 # self-retrieval first
        assert sorted(dists) == list(dists)

    def test_penalization_modes_run(self, rng):
        feats, _ = self._clustered(rng, n_per=8)
        q = feats[0].copy()
        q[4:8] = 0.0                            # occlude keypoints
        for pen in ("none", "zero_coord", "mean", "max"):
            idx, _ = get_neighbors_idxs(
                q, num_retrievals=3, retrieval_method="euclidean_distance",
                penalization=pen, database=feats)
            assert len(idx) == 3


class TestRetrievalE2E:
    def test_06_07_flow(self, rng, tmp_path):
        from stlpose_tpu.engines.retrieval_db import RetrievalExperimenter

        # synthetic database: 3 characters x 12 clustered poses
        chars = ["Heracles", "satyr", "maenad"]
        db = {}
        centers = rng.rand(3, 17, 2) * 150 + 20
        for i in range(36):
            c = i % 3
            joints = np.concatenate(
                [centers[c] + rng.randn(17, 2) * 4,
                 np.ones((17, 1))], axis=1)
            db[f"img_{i}"] = {"img": f"i{i}.jpg", "joints": joints,
                              "center": np.zeros(2), "scale": np.ones(2),
                              "character_name": chars[c]}
        joints_all = np.array([db[k]["joints"] for k in db])
        feats = process_data(joints_all, "full_body", True)
        graph = create_graph(feats, "euclidean_distance")
        name = "database_test_eval_metric_euclidean_distance_norm_True.pkl"
        save_knn_structure(graph, feats, db, name, root=str(tmp_path / "knn"))

        # narrative maps
        dict_path = tmp_path / "dicts"
        dict_path.mkdir()
        narr = {"myth": ["Heracles"], "dionysian": ["satyr", "maenad"]}
        c2n = {c: n for n, cs in narr.items() for c in cs}
        (dict_path / "char_narrative_map.json").write_text(json.dumps(c2n))
        (dict_path / "narrative_char_map.json").write_text(json.dumps(narr))

        exp = RetrievalExperimenter(
            str(tmp_path / "exp"), name, retrieval_method="knn",
            knn_root=str(tmp_path / "knn"), dict_path=str(dict_path),
            num_retrievals=36)
        exp.setup()
        exp.retrieval_experiment()
        res_c = exp.process_retrieval_results("character")
        res_n = exp.process_retrieval_results("narrative")
        # clustered poses must retrieve their own character at rank 1
        assert res_c["results"]["general"]["p@1"] > 0.9
        assert res_n["results"]["general"]["p@1"] > 0.9
        files = os.listdir(tmp_path / "exp")
        assert len([f for f in files
                    if f.startswith("retrieval_results")]) == 2
