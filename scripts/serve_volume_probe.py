#!/usr/bin/env python3
"""Probe: alternative serving grids vs the reference 128^3 patch grid.

The reference always serves through a sliding window of 128^3 patches
(src/utils/validate.py:235-240) because a GPU cannot hold the whole
activation set.  A v5e has 16 GB HBM, which opens three TPU-native grids:

  patch    — the reference grid: 2x2x2 = 8 patches of 128^3, overlap 16.
             D starts {0,27}: the D overlap of 101 planes means the grid
             covers 1.6x the volume's voxels.
  column   — full-depth columns: pad D to the net's stride multiple (160)
             and serve 4 patches of (160,128,128).  Kills the D-overlap
             recompute; H/W grid (and stage plane geometry — 64^2, the
             Pallas kernels' sweet spot) unchanged.
  column-a — aligned columns: pad H/W to 256 so starts land on {0,128}
             (overlap 0) — every stitch DUS is 128-lane aligned (the
             misaligned W-start-112 RMW profiled at ~0.58 ms x4).
  volume   — the whole padded volume (160,256,256) in ONE forward: no
             extraction, no stitch.  Stage0 planes are 128^2: beyond the
             kernels' VMEM budget, so those convs take the XLA fallback.

Usage: python scripts/serve_volume_probe.py [mixed|int8|bf16] [iters] [modes]
  modes: comma list of patch,column,column_aligned,volume (default all)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "mixed"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from efficientq_tpu.cli.entrance import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir
    from efficientq_tpu.eval.sliding import patch_grid, sliding_window_inference
    from efficientq_tpu.models import build_uresq, preset_config
    from efficientq_tpu.models.uresq import min_input_divisor
    from efficientq_tpu.ptq import fold_bn
    from efficientq_tpu.ptq.attention import pred_brats_con_merge
    from efficientq_tpu.ptq.deploy import channels_first_tail, to_int8_inference
    from efficientq_tpu.quant import fake_quant_weight

    cfg = preset_config("brats", quantize=True)
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

    if variant == "int8":
        g, v = to_int8_inference(fgraph, fvars)
    elif variant == "mixed":
        g, v = to_int8_inference(fgraph, fvars, only_kernel_sizes={(3, 3, 3)})
    else:
        g, v = fgraph, fvars
    g = channels_first_tail(g)

    vol_shape = (155, 240, 240)
    vol = np.random.RandomState(0).randn(1, *vol_shape, 4).astype(np.float32)
    vj = jnp.asarray(vol)
    div = min_input_divisor(cfg)

    def pad_axes(target):
        """target: per-axis padded size or None (keep + round up to div)."""
        return tuple(
            (-(-s // dv) * dv if t is None else t)
            for s, t, dv in zip(vol_shape, target, div))

    def make_grid_infer(padded, patch, overlap):
        @jax.jit
        def infer(v, image):
            pads = [(0, p - s) for s, p in zip(vol_shape, padded)]
            x = jnp.pad(image, [(0, 0)] + pads + [(0, 0)])

            def model_fn(xb):
                return nnir.apply(g, v, xb, mode="quantized",
                                  compute_dtype=jnp.bfloat16,
                                  keep_head_dtype=True)

            n_p = len(patch_grid(padded, patch, overlap))
            logits = sliding_window_inference(model_fn, x, patch, overlap,
                                              patch_batch=n_p,
                                              channels_first=True,
                                              normalize=False)
            logits = logits[-1][:, :, :vol_shape[0], :vol_shape[1],
                               :vol_shape[2]]
            return pred_brats_con_merge(logits, axis=1).astype(jnp.uint8)

        return infer

    def make_volume_infer(padded):
        @jax.jit
        def infer(v, image):
            pads = [(0, p - s) for s, p in zip(vol_shape, padded)]
            x = jnp.pad(image, [(0, 0)] + pads + [(0, 0)])
            outs = nnir.apply(g, v, x, mode="quantized",
                              compute_dtype=jnp.bfloat16,
                              keep_head_dtype=True)
            logits = outs[-1][:, :, :vol_shape[0], :vol_shape[1],
                              :vol_shape[2]]
            return pred_brats_con_merge(logits, axis=1).astype(jnp.uint8)

        return infer

    modes = {
        "patch": make_grid_infer(vol_shape, (128, 128, 128), (16, 16, 16)),
        "column": make_grid_infer(pad_axes((None, 240, 240)),
                                  (pad_axes((None,) * 3)[0], 128, 128),
                                  (0, 16, 16)),
        "column_aligned": make_grid_infer(
            pad_axes((None, 256, 256)),
            (pad_axes((None,) * 3)[0], 128, 128), (0, 0, 0)),
        "volume": make_volume_infer(pad_axes((None, 256, 256))),
    }

    sel = (sys.argv[3].split(",") if len(sys.argv) > 3 else list(modes))
    results, segs = {}, {}
    for name in sel:
        infer = modes[name]
        try:
            t0 = time.perf_counter()
            seg = np.asarray(infer(v, vj))
            compile_s = time.perf_counter() - t0
            assert seg.shape == (1, *vol_shape), seg.shape
            segs[name] = seg
            t0 = time.perf_counter()
            outs = [infer(v, vj) for _ in range(iters)]
            jax.block_until_ready(outs)
            async_vps = iters / (time.perf_counter() - t0)
            results[name] = {"async_vps": round(async_vps, 3),
                             "compile_s": round(compile_s, 1)}
        except Exception as e:  # keep probing the other modes
            results[name] = {"error": repr(e)[:200]}
        if "patch" in segs and name in segs:
            results[name]["agree_vs_patch"] = round(
                float((segs[name] == segs["patch"]).mean()), 6)
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"variant": variant, "modes": results}))


if __name__ == "__main__":
    main()
