#!/usr/bin/env python3
"""LiTS-preset whole-volume serving: reference patch grid vs full-depth
column serving (VERDICT r3 item 7).

The LiTS preset is the anisotropic case (init_stride 2,2,1, patch
128x128x64): on a 512x512x128 CT the reference D grid (starts
{0,112,224,336,384}) recomputes 1.25x the volume's D extent, so the
full-depth column win is bigger than BraTS's.  Serves through the
PRODUCT inferencer (eval/sliding.py::make_jitted_volume_inferencer) in
both grids, mixed-int8 deployment, hard argmax predictions.

Usage: python scripts/lits_serving_bench.py [D H W] (default 512 512 128)
Writes one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from efficientq_tpu.cli.entrance import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.eval.sliding import (column_grid_plan,
                                         make_jitted_volume_inferencer,
                                         patch_grid)
from efficientq_tpu.models import build_uresq, preset_config
from efficientq_tpu.models.uresq import min_input_divisor
from efficientq_tpu.ptq import fold_bn
from efficientq_tpu.ptq.deploy import to_int8_inference
from efficientq_tpu.quant import fake_quant_weight


def main():
    args = sys.argv[1:4]
    if args and len(args) != 3:
        sys.exit(f"usage: {sys.argv[0]} [D H W]  (all three or none)")
    vol_shape = tuple(int(v) for v in args) if args else (512, 512, 128)
    patch, overlap = (128, 128, 64), (16, 16, 16)

    cfg = preset_config("lits", quantize=True)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fgraph, fvars = fold_bn(graph, variables)
    for node in fgraph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        p = fvars["params"][node.name]
        if qcfg.q_weight:
            alpha = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], alpha, qcfg.qlvl_w)
            p["alpha_w"] = alpha
        if qcfg.q_act:
            p["alpha_act"] = jnp.float32(1.0)
    mgraph, mvars = to_int8_inference(fgraph, fvars,
                                      only_kernel_sizes={(3, 3, 3)})

    div = min_input_divisor(cfg)[0]
    n_patches = len(patch_grid(vol_shape, patch, overlap))
    pd, cpatch, cov = column_grid_plan(vol_shape, patch, overlap, div)
    n_cols = len(patch_grid((pd,) + vol_shape[1:], cpatch, cov))
    print(f"# grid: {n_patches} patches vs {n_cols} columns "
          f"({cpatch}, pad D {vol_shape[0]}->{pd})", file=sys.stderr)

    vol = jnp.asarray(np.random.RandomState(0)
                      .randn(1, *vol_shape, 1).astype(np.float32))
    iters = 5

    def bench(serve_grid, patch_batch):
        infer = make_jitted_volume_inferencer(
            mgraph, patch_batch=patch_batch, mode="quantized",
            heads=slice(-1, None), hard_pred=True, multilabel=False,
            compute_dtype=jnp.bfloat16, serve_grid=serve_grid,
            stride_div=div)
        seg = np.asarray(infer(mvars, vol, patch, overlap))
        assert seg.shape == (1, 1, *vol_shape), seg.shape
        t0 = time.perf_counter()
        outs = [infer(mvars, vol, patch, overlap) for _ in range(iters)]
        jax.block_until_ready(outs)
        return iters / (time.perf_counter() - t0), seg

    patch_vps, seg_p = bench("patch", 15)
    col_vps, seg_c = bench("column", 5)
    agree = float((seg_p == seg_c).mean())

    print(json.dumps({
        "metric": "lits_w4a4_whole_volume_serving",
        "vol_shape": list(vol_shape),
        "patch_grid": {"n": n_patches, "async_vol_per_s": round(patch_vps, 3)},
        "column_grid": {"n": n_cols, "column_patch": list(cpatch),
                        "async_vol_per_s": round(col_vps, 3)},
        "column_speedup": round(col_vps / patch_vps, 3),
        "voxel_agreement": round(agree, 6),
    }))


if __name__ == "__main__":
    main()
