"""Retrieval at production scale (VERDICT r1 item 8): 50k pose vectors
through the native C++ HNSW — recall@10 vs exact brute force, build/query
latency, and a save/load round-trip at that size.

Set STLPOSE_RECORD_RETRIEVAL=<path> to record the measured numbers as JSON
(BENCH_retrieval.json at the repo root is one recorded run).
"""

import json
import os
import time

import numpy as np
import pytest

from stlpose_tpu.retrieval.hnsw import Index, native_available

N = 50_000
DIM = 34            # 17 keypoints x 2 (the 06_fit_knn_tree vector layout)
K = 10
N_QUERIES = 200


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(13)
    # pose-vector-like data: cluster structure (characters striking similar
    # poses) + noise, L2-normalized like the reference's cosine prep
    centers = rng.randn(300, DIM).astype(np.float32)
    assign = rng.randint(0, 300, N)
    data = centers[assign] + 0.15 * rng.randn(N, DIM).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True) + 1e-9
    queries = data[rng.permutation(N)[:N_QUERIES]] + \
        0.02 * rng.randn(N_QUERIES, DIM).astype(np.float32)
    return data.astype(np.float32), queries.astype(np.float32)


def _exact_topk(data, queries, k):
    out = np.empty((len(queries), k), np.int64)
    for i, q in enumerate(queries):
        d = ((data - q) ** 2).sum(axis=1)
        out[i] = np.argpartition(d, k)[:k][np.argsort(d[np.argpartition(
            d, k)[:k]])]
    return out


def test_hnsw_50k_recall_latency_and_roundtrip(corpus, tmp_path):
    if not native_available():
        pytest.skip("native HNSW library unavailable")
    data, queries = corpus

    idx = Index("l2", DIM)
    # reference build parameters: M=8, ef=1000 (06_fit_knn_tree.py:150-166)
    t0 = time.perf_counter()
    idx.init_index(N, ef_construction=200, M=8)
    idx.add_items(data, np.arange(N))
    build_s = time.perf_counter() - t0
    assert idx.get_current_count() == N

    idx.set_ef(1000)
    t0 = time.perf_counter()
    labels, dists = idx.knn_query(queries, k=K)
    query_ms = (time.perf_counter() - t0) / N_QUERIES * 1000.0

    exact = _exact_topk(data, queries, K)
    recall = float(np.mean([
        len(set(labels[i].tolist()) & set(exact[i].tolist())) / K
        for i in range(N_QUERIES)]))
    assert recall >= 0.95, f"recall@{K}={recall}"
    # distances must be sorted ascending per query
    assert np.all(np.diff(dists, axis=1) >= -1e-6)

    # save/load round-trip at full size: identical neighbor sets
    path = str(tmp_path / "hnsw_50k.bin")
    idx.save_index(path)
    idx2 = Index("l2", DIM)
    idx2.load_index(path, max_elements=N)
    assert idx2.get_current_count() == N
    idx2.set_ef(1000)
    labels2, _ = idx2.knn_query(queries, k=K)
    assert np.array_equal(labels, labels2)

    record = os.environ.get("STLPOSE_RECORD_RETRIEVAL")
    result = {"n_vectors": N, "dim": DIM, "k": K,
              "recall_at_10": round(recall, 4),
              "build_seconds": round(build_s, 2),
              "query_ms_per_query": round(query_ms, 3),
              "ef_construction": 200, "M": 8, "ef_search": 1000}
    print(json.dumps(result))
    if record:
        with open(record, "w") as f:
            json.dump(result, f, indent=1)
