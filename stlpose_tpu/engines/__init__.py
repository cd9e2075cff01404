"""Train/eval engines behind the numbered CLI scripts (SURVEY.md §2.7)."""

from stlpose_tpu.engines.trainer import PoseTrainer
from stlpose_tpu.engines.evaluator import PoseEvaluator
