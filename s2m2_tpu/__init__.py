"""s2m2_tpu — TPU-native stereo depth engine.

A from-scratch JAX/XLA/Pallas re-design of the S2M2 stereo matching model
(ICCV 2025, arXiv:2507.13229; reference implementation junhong-3dv/s2m2).
"""
from .config import ModelConfig, Precision, get_config, VARIANTS  # noqa: F401

__version__ = "0.1.0"
