"""Experiment management, logging, checkpointing, and visualization."""

from stlpose_tpu.utils.experiment import (
    create_experiment, load_experiment_parameters, create_directory,
    timestamp, create_train_logs, load_train_logs, update_train_logs,
    create_detector_logs, update_detector_logs, save_evaluation_stats,
    load_evaluation_stats, reset_predictions_file, load_predictions,
)
from stlpose_tpu.utils.logger import Logger, print_, log_function, for_all_methods
