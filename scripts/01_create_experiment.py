#!/usr/bin/env python
"""
Create an experiment directory + parameters JSON.

CLI parity with the reference's 01_create_experiment.py: merges CLI args
over the defaults and writes
``experiments/<dir>/experiment_<timestamp>/{models,plots}`` with
``experiment_parameters.json`` (reference: 01_create_experiment.py:14-34).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stlpose_tpu.utils.arguments import process_create_experiment_arguments
from stlpose_tpu.utils.experiment import create_experiment
from stlpose_tpu.utils.logger import Logger, print_


def main():
    from stlpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = process_create_experiment_arguments()
    overrides = {k: v for k, v in vars(args).items() if k != "exp_directory"}
    exp_path = create_experiment(args.exp_directory, overrides)
    Logger(exp_path)
    print_(f"Created experiment at {exp_path}", type="new_exp")
    print(exp_path)


if __name__ == "__main__":
    main()
