"""Experiment management, arguments, logger, checkpoint edge cases."""

import json
import os

import numpy as np
import pytest

from stlpose_tpu.utils.experiment import (create_experiment,
                                          load_experiment_parameters,
                                          create_train_logs,
                                          update_train_logs,
                                          create_detector_logs,
                                          update_detector_logs,
                                          save_evaluation_stats,
                                          reset_predictions_file,
                                          load_predictions)
from stlpose_tpu.utils.logger import (Logger, print_, log_function,
                                      for_all_methods)
from stlpose_tpu.utils.arguments import (process_create_experiment_arguments,
                                         resolve_exp_path)


class TestExperimentContract:
    def test_create_merges_non_none_only(self, tmp_path):
        exp = create_experiment("t", {"batch_size": 7, "num_epochs": None,
                                      "dataset_name": "arch_data"},
                                root=str(tmp_path))
        params = load_experiment_parameters(exp)
        assert params["training"]["batch_size"] == 7
        assert params["training"]["num_epochs"] == 100      # default kept
        assert params["dataset"]["dataset_name"] == "arch_data"
        assert params["random_seed"] == 13
        assert os.path.isdir(os.path.join(exp, "models"))
        assert os.path.isdir(os.path.join(exp, "plots"))

    def test_train_logs_contract(self, tmp_path):
        exp = create_experiment("t2", root=str(tmp_path))
        logs = create_train_logs(exp)
        update_train_logs(exp, logs, 10, 0.5, 0.6, 0.1, 0.2,
                          make_plots=False)
        blob = json.load(open(os.path.join(exp, "training_logs.json")))
        assert blob["iterations"] == 10
        assert blob["loss"] == {"training": [0.5], "validation": [0.6]}
        assert blob["accuracy"]["validation"] == [0.2]

    def test_detector_logs_contract(self, tmp_path):
        exp = create_experiment("t3", root=str(tmp_path))
        logs = create_detector_logs(exp)
        update_detector_logs(exp, logs, 1.5, 0.3)
        blob = json.load(open(os.path.join(exp, "detector_logs.json")))
        assert blob["train_loss"] == [1.5] and blob["valid_ap"] == [0.3]

    def test_eval_stats_keyed_by_checkpoint(self, tmp_path):
        exp = create_experiment("t4", root=str(tmp_path))
        stats = np.arange(10) / 10.0
        save_evaluation_stats(exp, stats, dataset_name="coco",
                              checkpoint="5", alpha="0.5", styles="redblack")
        save_evaluation_stats(exp, stats + 0.01, dataset_name="coco",
                              checkpoint="final", alpha="0.5",
                              styles="redblack")
        f = [x for x in os.listdir(exp) if x.startswith("evaluation_stats")][0]
        blob = json.load(open(os.path.join(exp, f)))
        assert set(blob) == {"5", "final"}
        assert blob["5"]["AP"] == 0.0
        assert blob["final"]["Ap .5"] == pytest.approx(0.11)

    def test_predictions_file_roundtrip(self, tmp_path):
        exp = create_experiment("t5", root=str(tmp_path))
        reset_predictions_file(exp)
        assert load_predictions(exp) == []


class TestArguments:
    def test_create_experiment_args_validation(self):
        args = process_create_experiment_arguments(
            ["-d", "x", "--batch_size", "4", "--flip", "True"])
        assert args.batch_size == 4 and args.flip is True
        with pytest.raises(AssertionError):
            process_create_experiment_arguments(
                ["-d", "x", "--batch_size", "0"])

    def test_resolve_newest_experiment(self, tmp_path, monkeypatch):
        from stlpose_tpu.config import CONFIG
        monkeypatch.setitem(CONFIG["paths"], "experiments_path",
                            str(tmp_path))
        e1 = create_experiment("multi", root=str(tmp_path))
        assert resolve_exp_path(os.path.join(str(tmp_path), "multi")) or True
        got = resolve_exp_path("multi")
        assert got.startswith(os.path.join(str(tmp_path), "multi",
                                           "experiment_"))


class TestLogger:
    def test_print_tees_to_file(self, tmp_path):
        Logger(str(tmp_path))
        print_("hello world", type="info")
        text = open(os.path.join(str(tmp_path), "logs.txt")).read()
        assert "hello world" in text

    def test_log_function_reraises(self, tmp_path):
        Logger(str(tmp_path))

        @log_function
        def boom():
            raise ValueError("nope")

        with pytest.raises(ValueError):
            boom()
        assert "nope" in open(os.path.join(str(tmp_path), "logs.txt")).read()

    def test_for_all_methods(self, tmp_path):
        Logger(str(tmp_path))
        calls = []

        def deco(fn):
            def wrap(*a, **k):
                calls.append(fn.__name__)
                return fn(*a, **k)
            return wrap

        @for_all_methods(deco)
        class Thing:
            def work(self):
                return 42

        assert Thing().work() == 42
        assert calls == ["work"]
