"""Pose-based image retrieval: pose-vector processing, the native HNSW kNN
index, neighbor search with occlusion penalization, and retrieval metrics."""

from stlpose_tpu.retrieval.hnsw import Index
from stlpose_tpu.retrieval.pose_db import (
    process_pose_vector, process_data, create_graph, load_knn,
    save_knn_structure, load_database, save_database, get_neighbors_idxs,
)
from stlpose_tpu.retrieval.metrics import (score_retrievals,
                                           confidence_score, oks_score)
