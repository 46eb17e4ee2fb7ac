"""SAST-TPU: a TPU-native Scene Adaptive Sparse Transformer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Peterande/SAST
(CVPR 2024 event-camera object detection): recurrent sparse-transformer
backbone + YOLOX detection, data pipeline for the Prophesee Gen1 / 1 Mpx
datasets, static-shape sparse attention, on-device NMS, SPMD data-parallel
training over a TPU mesh, and a Prophesee-protocol evaluator.
"""

__version__ = "0.1.0"

from sast_tpu.config import ExperimentConfig, get_config, resolve_config  # noqa: F401
