#!/usr/bin/env python
"""
Quantitative pose-retrieval evaluation.

CLI parity with the reference's 07_retrieval_experiments.py: every database
pose queries the index; character- and narrative-level P@k/mAP/R@k/mAR are
grouped per label and overall and saved as retrieval_results_*.json
(reference: 07_retrieval_experiments.py:60-200).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.engines.retrieval_db import RetrievalExperimenter


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--exp_directory", required=True,
                   help="directory where result JSONs are written")
    p.add_argument("--database_file", required=True,
                   help="data_* artifact name from 06_fit_knn_tree")
    p.add_argument("--retrieval_method", default="knn",
                   choices=["knn", "euclidean_distance", "cosine_similarity",
                            "manhattan_distance", "confidence_score",
                            "oks_score"])
    p.add_argument("--approach", default="full_body",
                   choices=["all_kpts", "full_body", "upper_body"])
    p.add_argument("--penalization", default="none",
                   choices=["none", "zero_coord", "mean", "max"])
    p.add_argument("--normalize", default="True")
    p.add_argument("--num_retrievals", type=int, default=-1)
    p.add_argument("--knn_path", default=None)
    p.add_argument("--dict_path", default=None)
    args = p.parse_args()

    exp = RetrievalExperimenter(
        args.exp_directory, args.database_file,
        retrieval_method=args.retrieval_method, approach=args.approach,
        penalization=args.penalization, normalize=args.normalize == "True",
        num_retrievals=args.num_retrievals, knn_root=args.knn_path,
        dict_path=args.dict_path)
    exp.setup()
    exp.retrieval_experiment()
    exp.process_retrieval_results("character")
    exp.process_retrieval_results("narrative")
    print(f"Retrieval over {exp.n_entries} poses took "
          f"{exp.elapsed_time:.2f}s")


if __name__ == "__main__":
    main()
