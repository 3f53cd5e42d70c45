"""EfficientQ-TPU: a TPU-native JAX/XLA/Pallas framework for post-training
quantization of 3D segmentation networks.

Re-implements the capabilities of the EfficientQ reference (PyTorch, single-GPU)
as an idiomatic TPU stack:

- functional graph IR interpreted under ``jax.jit`` (XLA fuses the whole net)
- NDHWC layout so channels land on the TPU lane dimension
- PTQ calibration as an explicit per-layer sweep (closed-form ADMM with
  on-device Gram matrices + Cholesky solves), not forward hooks
- on-device sliding-window whole-volume inference with overlap averaging
- multi-chip scaling via jax.sharding.Mesh + shard_map (data/spatial parallel)

Reference parity map lives in docstrings throughout (file:line cites point to
the reference tree layout, e.g. ``src/models/solver.py:201``).
"""

__version__ = "0.1.0"

from . import quant  # noqa: F401
