#!/usr/bin/env python3
"""LiTS FP forward latency (BASELINE.json row 1): one 128x128x64 patch
through the full 9-stage 32-512-channel LiTS-preset UResQ, FP32 and bf16,
vs a torch-CPU execution of the same graph (the reference's substrate —
correctness parity itself is pinned by tests/test_reference_parity.py).

Run alone on the chip; prints one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from efficientq_tpu.cli.entrance import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir
    from efficientq_tpu.models import build_uresq, preset_config
    from efficientq_tpu.models.torch_exec import torch_reference_forward

    cfg = preset_config("lits", quantize=False)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))

    # LiTS preset patch: 128 x 128 x 64 (config/lits_fp.yaml crop_size),
    # single CT modality
    x = np.random.RandomState(0).randn(1, 128, 128, 64, 1).astype(np.float32)
    xj = jnp.asarray(x)

    def timed(fn, iters=20):
        np.asarray(fn(xj))  # compile + warm
        jax.block_until_ready(fn(xj))
        t0 = time.perf_counter()
        outs = [fn(xj) for _ in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    f32_fn = jax.jit(lambda xb: nnir.apply(graph, variables, xb))
    bf16_fn = jax.jit(lambda xb: nnir.apply(graph, variables, xb,
                                            compute_dtype=jnp.bfloat16))
    f32_ms = timed(f32_fn)
    bf16_ms = timed(bf16_fn)

    x_ncdhw = np.transpose(x, (0, 4, 1, 2, 3)).copy()
    t0 = time.perf_counter()
    torch_reference_forward(graph, variables, x_ncdhw)
    cpu_ms = (time.perf_counter() - t0) * 1e3

    print(json.dumps({
        "metric": "lits_fp_forward_128x128x64",
        "unit": "ms/patch",
        "tpu_f32_ms": round(f32_ms, 2),
        "tpu_bf16_ms": round(bf16_ms, 2),
        "torch_cpu_f32_ms": round(cpu_ms, 1),
        "speedup_f32": round(cpu_ms / f32_ms, 1),
        "speedup_bf16": round(cpu_ms / bf16_ms, 1),
    }))


if __name__ == "__main__":
    main()
