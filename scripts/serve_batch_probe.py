#!/usr/bin/env python3
"""Cross-volume serving-batch probe: does batching the patch grids of V
volumes into one forward (8V patches) beat pipelining V single-volume
dispatches?

sliding_window_inference already handles N>1 volumes (the patch axis is
P*N and the stitch returns (M, N, ...)); this measures whether the larger
MXU M-dim + fewer dispatch round-trips pay for the bigger working set.

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
    from efficientq_tpu.eval.sliding import (patch_grid,
                                             sliding_window_inference)
    from efficientq_tpu.models import build_uresq, preset_config
    from efficientq_tpu.ptq import fold_bn
    from efficientq_tpu.ptq.attention import pred_brats_con_merge
    from efficientq_tpu.ptq.deploy import (channels_first_tail,
                                           to_int8_inference)
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

    vol_shape = (155, 240, 240)
    patch, overlap = (128, 128, 128), (16, 16, 16)
    n_patches = len(patch_grid(vol_shape, patch, overlap))

    mgraph, mvars = to_int8_inference(fgraph, fvars,
                                      only_kernel_sizes={(3, 3, 3)})
    g = channels_first_tail(mgraph)

    def make_infer(n_vols):
        @jax.jit
        def infer_volume(v, image):
            def model_fn(xb):
                return nnir.apply(g, v, xb, mode="quantized",
                                  compute_dtype=jnp.bfloat16,
                                  keep_head_dtype=True)

            logits = sliding_window_inference(
                model_fn, image, patch, overlap,
                patch_batch=n_patches * n_vols, channels_first=True,
                normalize=False)
            return pred_brats_con_merge(logits[-1], axis=1).astype(jnp.uint8)

        return jax.tree_util.Partial(infer_volume, mvars)

    rng = np.random.RandomState(0)
    results = {}
    iters = 6
    for n_vols in (1, 2, 3):
        vj = jnp.asarray(rng.randn(n_vols, *vol_shape, 4).astype(np.float32))
        infer = make_infer(n_vols)
        seg = np.asarray(infer(vj))  # compile + warmup
        assert seg.shape == (n_vols, *vol_shape), seg.shape
        jax.block_until_ready(infer(vj))
        t0 = time.perf_counter()
        outs = [infer(vj) for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        results[f"async_vps_n{n_vols}"] = round(n_vols * iters / dt, 4)

    print(json.dumps({"metric": "cross_volume_serving_batch_probe",
                      "unit": "volumes/sec (mixed int8 deploy, async)",
                      **results}))


if __name__ == "__main__":
    main()
