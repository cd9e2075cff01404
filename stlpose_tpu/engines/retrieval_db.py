"""
Retrieval-database extraction and retrieval-experiment engines.

Equivalents of the reference's retrieval pipeline stages
(reference: 05_create_archdata_retrieval_db.py:106-185,
07_retrieval_experiments.py:60-197): per-image flip-TTA HRNet forward,
keypoint decode into 256x192 crop coordinates with a confidence-threshold
visibility flag, pickled ``database_{ds}_{exp}_eval.pkl`` artifacts; then
query-all retrieval scoring at character and narrative level with grouped
result JSONs.

TPU-native difference: extraction runs BATCHED (the reference uses batch
size 1) — flip-TTA pairs fold into one forward, and the whole decode stays
on device.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from stlpose_tpu.config import CONFIG, get_hrnet_config
from stlpose_tpu.data.loaders import load_dataset
from stlpose_tpu.models import PoseHighResolutionNet
from stlpose_tpu.parallel import get_mesh, shard_batch
from stlpose_tpu.parallel.steps import make_infer_fn
from stlpose_tpu.retrieval import (process_pose_vector, get_neighbors_idxs,
                                   score_retrievals, load_knn, save_database)
from stlpose_tpu.train import create_train_state
from stlpose_tpu.utils import load_experiment_parameters, print_
from stlpose_tpu.utils.checkpoint import load_checkpoint
from stlpose_tpu.utils.experiment import timestamp

RES_KEYS = ("p@1", "p@5", "p@10", "p@rel", "mAP",
            "r@1", "r@5", "r@10", "r@rel", "mAR")


class ArchDataExtractor:
    """Engine behind 05_create_archdata_retrieval_db.py."""

    def __init__(self, exp_path: str, checkpoint=None, dataset_name=None,
                 data_path=None, kpt_thr: float = 0.1, num_workers=None):
        self.exp_path = exp_path
        self.exp_data = load_experiment_parameters(exp_path)
        if dataset_name:
            self.exp_data["dataset"]["dataset_name"] = dataset_name
        self.checkpoint = checkpoint
        self.data_path = data_path
        self.kpt_thr = kpt_thr
        self.num_workers = num_workers
        self.retrieval_db = {}

    def setup(self, config_name: str = "w32_256x192", pretrained=None):
        self.mesh = get_mesh()
        _, self.pipe = load_dataset(
            self.exp_data, train=False, data_path=self.data_path,
            num_workers=self.num_workers,
            pad_multiple=self.mesh.devices.size)
        model = PoseHighResolutionNet(config=get_hrnet_config(config_name),
                              dtype=_model_dtype())
        self.model = model
        from stlpose_tpu.utils.checkpoint import load_pretrained_variables
        variables = load_pretrained_variables(model, pretrained) \
            if pretrained else None
        hw = get_hrnet_config(config_name).image_size
        self.state, _ = create_train_state(
            model, self.exp_data, jax.random.PRNGKey(CONFIG["random_seed"]),
            (1, hw[1], hw[0], 3), variables=variables)
        if self.checkpoint is not None:
            self.state, _ = load_checkpoint(self.state, self.exp_path,
                                            self.checkpoint, only_model=True)
        # flip-TTA heatmaps, no image-space decode (db poses live in crop
        # coordinates, reference: 05_...py:133-147)
        self.infer = make_infer_fn(self.model, self.mesh, flip_tta=True,
                                   decode=False)

    def extract_retrieval_dataset(self, records=None):
        """Build {img_N: {img, joints (17, 3), center, scale,
        character_name}} over the eval split."""
        from stlpose_tpu.ops.decode import heatmap_argmax

        records = records if records is not None else self.pipe.records
        for batch in self.pipe:
            hm = self.infer(self.state,
                            shard_batch(self.mesh, batch["image"]))
            hm = np.asarray(hm)
            n = batch["n_valid"]
            coords, maxvals = heatmap_argmax(hm[:n])
            coords, maxvals = np.array(coords), np.array(maxvals)
            # scale heatmap coords to the 256x192 crop frame (the reference
            # decodes from bilinearly x4-upsampled maps, align_corners=True)
            Hh, Hw = hm.shape[2], hm.shape[3]
            coords[..., 0] *= (192.0 - 1) / (Hw - 1)
            coords[..., 1] *= (256.0 - 1) / (Hh - 1)
            visible = (maxvals >= self.kpt_thr).astype(np.float32)
            for b in range(n):
                i = len(self.retrieval_db)
                rec = records[min(i, len(records) - 1)]
                joints = np.concatenate([coords[b], visible[b][:, None]],
                                        axis=1).astype(np.float32)
                self.retrieval_db[f"img_{i}"] = {
                    "img": os.path.basename(rec.image),
                    "joints": joints,
                    "center": batch["center"][b],
                    "scale": batch["scale"][b],
                    "character_name": rec.character_name,
                }
        return self.retrieval_db

    def save_retrieval_db(self, root=None) -> str:
        name = (f"{self.exp_data['dataset']['dataset_name']}_"
                f"{os.path.basename(self.exp_path)}")
        return save_database(self.retrieval_db, name, "eval", root)


def load_character_narrative_maps(dict_path: str | None = None):
    """char->narrative and narrative->chars maps
    (reference: lib/utils.py:421-445)."""
    dict_path = dict_path or CONFIG["paths"]["dict_path"]
    char_path = os.path.join(dict_path, "char_narrative_map.json")
    narr_path = os.path.join(dict_path, "narrative_char_map.json")
    if not (os.path.exists(char_path) and os.path.exists(narr_path)):
        raise FileNotFoundError(
            "Character/narrative mapping dicts missing; run "
            "scripts/aux_map_characters_to_narratives.py first")
    with open(char_path) as f:
        char_to_narr = json.load(f)
    with open(narr_path) as f:
        narr_to_char = json.load(f)
    return char_to_narr, narr_to_char


class RetrievalExperimenter:
    """Engine behind 07_retrieval_experiments.py."""

    def __init__(self, exp_directory: str, database_file: str,
                 retrieval_method: str = "knn", approach: str = "full_body",
                 penalization: str = "none", normalize: bool = True,
                 num_retrievals: int = -1, knn_root=None, dict_path=None):
        self.exp_directory = exp_directory
        self.database_file = database_file
        self.retrieval_method = retrieval_method
        self.approach = approach
        self.penalization = penalization
        self.normalize = normalize
        self.num_retrievals = num_retrievals
        self.knn_root = knn_root
        self.dict_path = dict_path

    def setup(self):
        self.knn, self.database, self.features = load_knn(
            self.database_file, root=self.knn_root)
        self.key_list = list(self.database.keys())
        self.n_entries = len(self.key_list)
        if self.num_retrievals < 0:
            self.num_retrievals = self.n_entries
        self.char_to_narr, self.narr_to_char = \
            load_character_narrative_maps(self.dict_path)

    def retrieval_experiment(self):
        character_results, narrative_results = [], []
        t0 = time.time()
        for key in self.key_list:
            query = self.database[key]
            joints = np.asarray(query["joints"])
            label_char = query["character_name"]
            label_narr = self.char_to_narr.get(label_char, label_char)
            vec = process_pose_vector(joints, self.approach, self.normalize)
            idx, _ = get_neighbors_idxs(
                vec, num_retrievals=self.num_retrievals,
                approach=self.approach,
                retrieval_method=self.retrieval_method,
                penalization=self.penalization,
                knn=self.knn, database=self.features)
            retrieved = [self.database[self.key_list[int(j)]]
                         for j in idx if 0 <= int(j) < self.n_entries]
            chars = [r["character_name"] for r in retrieved]
            narrs = [self.char_to_narr.get(c, c) for c in chars]
            character_results.append(score_retrievals(label_char, chars))
            narrative_results.append(score_retrievals(label_narr, narrs))
        self.elapsed_time = time.time() - t0
        self.character_results = character_results
        self.narrative_results = narrative_results

    def process_retrieval_results(self, type: str = "character",
                                  save: bool = True):
        """Group per-label and overall averages, save results JSON
        (07_retrieval_experiments.py:114-180)."""
        assert type in ("character", "narrative")
        scores = (self.character_results if type == "character"
                  else self.narrative_results)
        results = {"general": {k: [] for k in RES_KEYS}}
        for score in scores:
            label = score["label"]
            results.setdefault(label, {k: [] for k in RES_KEYS})
            for k in RES_KEYS:
                results[label][k].append(score[k])
                if score[k] >= 0:
                    results["general"][k].append(score[k])
        for label in results:
            for k in RES_KEYS:
                vals = results[label][k]
                results[label][k] = float(np.mean(vals)) if vals else -1.0
            print_(f"Retrieval results for {type}: '{label}'")

        dataset_name = self.database_file.split("database_")[-1] \
            .split("_eval")[0]
        savedict = {
            "results": results,
            "metadata": {
                "timestamp": timestamp(),
                "dataset_name": dataset_name,
                "retrival_time": self.elapsed_time,
                "database size": self.n_entries,
                "retrieval_level": type,
                "retrieval_method": self.retrieval_method,
                "pose approach": self.approach,
                "missing kpt penalization": self.penalization,
                "normalized poses": self.normalize,
            },
        }
        if save:
            fname = (f"retrieval_results_type_{type}_method_"
                     f"{self.retrieval_method}_approach_{self.approach}_"
                     f"penalization_{self.penalization}_normalized_"
                     f"{self.normalize}.json")
            os.makedirs(self.exp_directory, exist_ok=True)
            with open(os.path.join(self.exp_directory, fname), "w") as f:
                json.dump(savedict, f)
        return savedict


def _model_dtype():
    """Compute dtype for the pose model: f32 default, bf16 via
    STLPOSE_DTYPE=bfloat16 (BN statistics and the loss stay f32)."""
    import os
    import jax.numpy as jnp
    return jnp.bfloat16 if os.environ.get("STLPOSE_DTYPE") == "bfloat16" \
        else jnp.float32
