"""LAVT-RS TPU — a TPU-native (JAX/XLA/Pallas) referring-segmentation
framework with the capabilities of the PyTorch LAVT-RS reference.

Core entry points:
  * lavt_rs_tpu.config         — typed model/training configs
  * lavt_rs_tpu.models.factory — model zoo (lavt, lavt_one, lavt_video, ...)
  * lavt_rs_tpu.train          — jitted data-parallel training step
  * lavt_rs_tpu.convert        — PyTorch-checkpoint -> JAX pytree converter
"""

from . import config  # noqa: F401

__version__ = "0.1.0"
