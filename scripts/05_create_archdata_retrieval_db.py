#!/usr/bin/env python
"""
Build the pose retrieval database from ClassArch artworks.

CLI parity with the reference's 05_create_archdata_retrieval_db.py: per
eval image, flip-TTA HRNet forward + keypoint decode, stored as
``databases/database_{dataset}_{experiment}_eval.pkl``
(reference: 05_create_archdata_retrieval_db.py:106-209).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.engines.retrieval_db import ArchDataExtractor
from stlpose_tpu.utils.arguments import get_directory_argument
from stlpose_tpu.utils.logger import Logger, print_


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    exp_path, args = get_directory_argument(get_checkpoint=True,
                                            get_dataset=True)
    Logger(exp_path)
    print_("Extracting retrieval database", type="new_exp")
    extractor = ArchDataExtractor(
        exp_path, checkpoint=args.checkpoint,
        dataset_name=args.dataset_name or "arch_data",
        data_path=args.data_path)
    extractor.setup(
        config_name=os.environ.get("STLPOSE_MODEL_CONFIG", "w32_256x192"),
        pretrained=os.environ.get("STLPOSE_PRETRAINED") or None)
    extractor.extract_retrieval_dataset()
    path = extractor.save_retrieval_db()
    print_(f"Saved retrieval database with {len(extractor.retrieval_db)} "
           f"poses to {path}")


if __name__ == "__main__":
    main()
