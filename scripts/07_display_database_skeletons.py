#!/usr/bin/env python
"""
Render every stored database skeleton on a blank canvas.

CLI parity with the reference's 07_display_database_skeletons.py:48-100.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu import constants
from stlpose_tpu.retrieval import load_database
from stlpose_tpu.utils.visualization import draw_pose


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--database_file", required=True,
                   help="database name (database_{name}_{split}.pkl) or path")
    p.add_argument("--database_path", default=None)
    p.add_argument("--output_dir", default="database_skeletons")
    p.add_argument("--limit", type=int, default=50)
    args = p.parse_args()

    if os.path.isfile(args.database_file):
        with open(args.database_file, "rb") as f:
            db = pickle.load(f)
        db = db.get("data", db) if isinstance(db, dict) else db
    else:
        name = args.database_file
        name = name.replace("database_", "").replace("_eval.pkl", "")
        db = load_database(name, "eval", args.database_path)

    os.makedirs(args.output_dir, exist_ok=True)
    canvas = np.ones((256, 192, 3), np.float32)
    for i, (key, item) in enumerate(db.items()):
        if i >= args.limit:
            break
        out = os.path.join(args.output_dir, f"{key}.png")
        draw_pose(canvas, np.asarray(item["joints"]),
                  skeleton=constants.SKELETON_SIMPLE,
                  title=item.get("character_name", ""), savepath=out)
    print(f"Rendered {min(len(db), args.limit)} skeletons to "
          f"{args.output_dir}")


if __name__ == "__main__":
    main()
