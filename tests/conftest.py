"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel,
# but unit tests must run on a virtual multi-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(13)


@pytest.fixture(scope="session")
def detector_scene_batch():
    """Synthetic detector scenes shared by the overfit-based instruments."""
    from tests.detector_overfit import make_scenes
    return make_scenes()


@pytest.fixture(scope="session")
def trained_tiny_frcnn(detector_scene_batch):
    """(detector, trained_variables): tiny Faster R-CNN overfit until its
    detections are meaningful (~2 min; session-scoped so the bf16-accuracy
    and fused-engine tests share ONE training run)."""
    from stlpose_tpu.models.faster_rcnn import FasterRCNN, FASTER_RCNN_TINY
    from tests.detector_overfit import overfit_detector
    det = FasterRCNN(FASTER_RCNN_TINY)
    trained = overfit_detector(det, detector_scene_batch, steps=300)
    return det, trained
