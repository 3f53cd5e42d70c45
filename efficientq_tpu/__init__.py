"""EfficientQ-TPU: a TPU-native JAX/XLA/Pallas framework for post-training
quantization of 3D segmentation networks.

Re-implements the capabilities of the EfficientQ reference (PyTorch,
single-GPU) as an idiomatic TPU stack:

- functional graph IR interpreted under ``jax.jit`` (XLA fuses the whole net)
- NDHWC layout so channels land on the TPU lane dimension
- PTQ calibration as an explicit per-layer sweep (closed-form ADMM with
  on-device Gram matrices + Cholesky solves), not forward hooks
- on-device sliding-window whole-volume inference with overlap averaging
- multi-chip scaling via jax.sharding.Mesh (data/spatial/tensor parallel)
- int8 true-integer deployment path and Pallas fused fake-quant kernels

Quick start::

    from efficientq_tpu import nnir
    from efficientq_tpu.models import build_uresq, preset_config, torch_io
    from efficientq_tpu.ptq import run_ptq, PTQHyperParams

    cfg = preset_config("brats", quantize=True)      # W2A2 preset
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    variables = torch_io.load_torch_checkpoint(graph, variables, ckpt_path)
    fgraph, qvars, report = run_ptq(graph, variables, calib_x,
                                    task="brats", init_stride=(2, 2, 2))
    out = nnir.apply(fgraph, qvars, x, mode="quantized")

Reference parity map: COMPONENTS.md.  Reference file:line cites appear in
docstrings throughout (e.g. ``src/models/solver.py:201``).
"""

__version__ = "0.1.0"

from . import nnir, ops, quant  # noqa: F401
