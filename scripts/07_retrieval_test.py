#!/usr/bin/env python
"""
Qualitative retrieval demo: sample queries, retrieve top-k, render query +
retrieved images with skeleton overlays.

CLI parity with the reference's 07_retrieval_test.py:27-149.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.retrieval import (process_pose_vector, get_neighbors_idxs,
                                   load_knn)
from stlpose_tpu import constants
from stlpose_tpu.utils.visualization import draw_pose


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--database_file", required=True)
    p.add_argument("--num_queries", type=int, default=5)
    p.add_argument("--num_retrievals", type=int, default=5)
    p.add_argument("--approach", default="full_body")
    p.add_argument("--normalize", default="True")
    p.add_argument("--knn_path", default=None)
    p.add_argument("--output_dir", default="retrieval_test_plots")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    knn, database, features = load_knn(args.database_file,
                                       root=args.knn_path)
    keys = list(database.keys())
    rng = np.random.RandomState(13)
    os.makedirs(args.output_dir, exist_ok=True)

    for qi in rng.choice(len(keys), min(args.num_queries, len(keys)),
                         replace=False):
        query = database[keys[qi]]
        vec = process_pose_vector(np.asarray(query["joints"]),
                                  args.approach,
                                  args.normalize == "True")
        idx, dists = get_neighbors_idxs(
            vec, num_retrievals=args.num_retrievals + 1, knn=knn,
            approach=args.approach, retrieval_method="knn",
            database=features)
        fig, axes = plt.subplots(1, args.num_retrievals + 1,
                                 figsize=(3 * (args.num_retrievals + 1), 4))
        canvas = np.ones((256, 192, 3), np.float32)
        draw_pose(canvas, np.asarray(query["joints"]),
                  skeleton=constants.SKELETON_SIMPLE, ax=axes[0],
                  title=f"query: {query['character_name']}")
        for rank, j in enumerate(idx[1:args.num_retrievals + 1], start=1):
            r = database[keys[int(j)]]
            draw_pose(canvas, np.asarray(r["joints"]),
                      skeleton=constants.SKELETON_SIMPLE, ax=axes[rank],
                      title=f"#{rank}: {r['character_name']}")
        out = os.path.join(args.output_dir, f"retrieval_query_{qi}.png")
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
        print(f"Saved {out}")


if __name__ == "__main__":
    main()
