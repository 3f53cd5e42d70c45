#!/usr/bin/env python3
"""Profile the serving graph on the chip and print the top device ops.

Traces N volumes of the selected serving variant (mixed|int8|bf16) with
jax.profiler, parses the xplane proto (tensorflow's profiler protobuf),
and prints per-op device totals — the measurement the kernel work in
docs/kernels.md is steered by.

Usage: python scripts/profile_serving.py [mixed|int8|bf16] [n_vols]
"""
import glob
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np


def top_device_ops(logdir, top=25):
    """Sum device-plane event durations by event name from an xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    totals = defaultdict(float)
    for plane in xs.planes:
        # device planes: TPU core traces (skip host threads)
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            # XLA Ops / XLA Modules lines both appear; use the op-level line
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                totals[ev_names.get(ev.metadata_id, "?")] += (
                    ev.duration_ps / 1e9)  # -> ms
    return sorted(totals.items(), key=lambda kv: -kv[1])[:top], \
        sum(totals.values())


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "mixed"
    n_vols = int(sys.argv[2]) if len(sys.argv) > 2 else 3

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

    if variant in ("int8", "s2d_int8"):
        g, v = to_int8_inference(fgraph, fvars)
    elif variant in ("mixed", "s2d"):
        g, v = to_int8_inference(fgraph, fvars,
                                 only_kernel_sizes={(3, 3, 3)})
    else:
        g, v = fgraph, fvars
    g = channels_first_tail(g)

    vol_shape = (155, 240, 240)
    patch, overlap = (128, 128, 128), (16, 16, 16)
    starts = patch_grid(vol_shape, patch, overlap)
    n_patches = len(starts)
    vol = np.random.RandomState(0).randn(1, *vol_shape, 4).astype(np.float32)

    extract_fn = None
    kw = {}
    if variant.startswith("s2d"):
        # host-side space-to-depth serving (bench.py mixed_s2d_host_async):
        # the host builds the stem kernel's input PATCH STACK directly
        # (fused s2d + extraction, native/effq_native.cpp) — the device
        # runs zero extraction
        from efficientq_tpu.data import native as effq_native
        from efficientq_tpu.pallas.stem import prestacked_s2d_extract
        from efficientq_tpu.ptq.deploy import s2d_stem_serving

        g, v, stem = s2d_stem_serving(g, v)
        assert stem is not None, "s2d stem rewrite unsupported here"
        vol = effq_native.s2d_patches_bf16(vol, starts, patch)
        extract_fn = prestacked_s2d_extract
        kw = dict(vol_shape=vol_shape)
    vj = jnp.asarray(vol)

    # NOTE (r4, measured dead end): XLA picks a bespoke PARAMETER layout
    # for the uploaded patch stack ({1,4,3,2,0}) and relayout-copies it
    # back for the Pallas stem operand (~1.3 ms/volume, copy.79).
    # Pinning the parameter row-major via jax.jit in_shardings +
    # jax.experimental.layout.Format sends the compile down a
    # pathological path (>28 min remote, vs ~2 min unpinned; timed out
    # twice) — accept the copy until the toolchain changes.
    @jax.jit
    def infer(v, image):
        def model_fn(xb):
            return nnir.apply(g, v, xb, mode="quantized",
                              compute_dtype=jnp.bfloat16,
                              keep_head_dtype=True)

        logits = sliding_window_inference(model_fn, image, patch, overlap,
                                          patch_batch=n_patches,
                                          channels_first=True,
                                          normalize=False,
                                          extract_fn=extract_fn, **kw)
        return pred_brats_con_merge(logits[-1], axis=1).astype(jnp.uint8)

    jax.block_until_ready(infer(v, vj))  # compile + warmup

    import tempfile

    logdir = tempfile.mkdtemp(prefix=f"effq_prof_{variant}_")
    with jax.profiler.trace(logdir):
        outs = [infer(v, vj) for _ in range(n_vols)]
        jax.block_until_ready(outs)

    ops, total = top_device_ops(logdir)
    print(json.dumps({"variant": variant, "n_vols": n_vols,
                      "device_ms_per_volume": round(total / n_vols, 2)}))
    for name, ms in ops:
        print(f"{ms / n_vols:8.3f} ms/vol  {name[:110]}")
    print(f"trace: {logdir}")


if __name__ == "__main__":
    main()
