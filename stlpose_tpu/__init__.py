"""
stlpose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for human pose
estimation in artworks, with the full capability surface of the STLPose
reference pipeline (person detection -> top-down HRNet keypoints ->
style-transfer training -> pose-based retrieval).

Reference capability map: see SURVEY.md at the repo root. The reference
(angelvillar96/STLPose) is PyTorch/CUDA; this framework is a from-scratch
TPU-first redesign: batched device-side geometry (affine crop warps, Gaussian
heatmap targets, heatmap decode) as fused XLA/Pallas stages, models as Flax
modules compiled once under jit/pjit, data parallelism over a
``jax.sharding.Mesh``, and host-side subsystems (COCO eval, HNSW retrieval
index) as native/numpy components.
"""

__version__ = "0.1.0"
