#!/usr/bin/env python3
"""Benchmark: flagship BraTS W4A4 quantized 3D-UNet forward throughput on a
128^3 patch (the headline inference workload of BASELINE.json), vs a torch
CPU FP32 execution of the *same* graph (the reference's substrate).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "patches/sec", "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


from efficientq_tpu.models.torch_exec import torch_reference_forward


def _device_watchdog(timeout_s: float = 180.0):
    """Fail fast (explicit JSON) when the TPU tunnel is down: jax.devices()
    hangs forever during a relay outage (no listener on the tunnel ports),
    which would wedge the whole bench run.  Probe in a daemon thread."""
    import threading

    got = []

    def probe():
        import jax

        got.append(jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not got:
        print(json.dumps({
            "metric": "brats_w4a4_whole_volume_sliding_window_inference",
            "value": 0.0, "unit": "volumes/sec", "vs_baseline": 0.0,
            "error": f"device backend unreachable after {timeout_s:.0f}s "
                     "(TPU tunnel outage) — no measurement taken",
            # the most recent hardware measurement (r4, 2026-08-19) so the
            # round record is not empty; clearly NOT a fresh number
            "last_measured_hw": {
                "mixed_s2d_hostvol_vol_per_s": 35.5,
                "mixed_async_vol_per_s": 28.9,
                "int8_async_vol_per_s": 27.2,
                "bf16_async_vol_per_s": 22.5,
                "mixed_column_async_vol_per_s": 33.3,
                "device_ms_per_volume": 23.1,
                "mfu_vs_bf16_peak_best": 0.16,
            },
        }))
        sys.exit(0)


def main():
    from efficientq_tpu.cli.entrance import enable_compilation_cache

    enable_compilation_cache()
    _device_watchdog()
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
    # -> 2x2x2 = 8 patches, stitched on device (BASELINE.md row 2)
    vol_shape = (155, 240, 240)
    patch, overlap = (128, 128, 128), (16, 16, 16)
    n_patches = len(patch_grid(vol_shape, patch, overlap))
    vol = np.random.RandomState(0).randn(1, *vol_shape, 4).astype(np.float32)
    vj = jnp.asarray(vol)

    from efficientq_tpu.pallas.stem import extract_s2d_patches, s2d_supported
    from efficientq_tpu.ptq.attention import pred_brats_con_merge
    from efficientq_tpu.ptq.deploy import (channels_first_tail,
                                           s2d_stem_serving,
                                           to_int8_inference)

    def make_infer(g, v, n_vols=1, grid="patch"):
        # serving tail rewrite: final head only, emitted NCDHW so the
        # head conv / trilinear up / stitch run with W on the vector lanes
        # instead of a C=3 minor dim that tiles at ~42x its logical bytes
        # (ptq/deploy.py::channels_first_tail; -2.5 ms/volume measured)
        g = channels_first_tail(g)
        # opt-in stem rewrite (EFFQ_S2D_STEM=1): the stride-2 C=4 init conv
        # as the fused space-to-depth Pallas kernel (pallas/stem.py).  The
        # kernel beats the XLA stem conv 3.2x, but the XLA-side volume
        # phase shuffle it needs costs more than it saves on this
        # toolchain (docs/kernels.md), so the default serving path keeps
        # the direct conv.
        extract_fn = None
        if os.environ.get("EFFQ_S2D_STEM") == "1" and grid == "patch":
            # geometry check BEFORE the graph rewrite: a rewritten graph fed
            # with un-transformed patches would tuple-unpack the batch axis
            # (review r3) — when unsupported, keep the original graph
            stem0 = next((n for n in g.nodes
                          if n.op == "conv"
                          and n.inputs == (g.input_name,)), None)
            if stem0 is not None and s2d_supported(
                    patch_grid(vol_shape, patch, overlap), patch, vol_shape,
                    stem0.attrs):
                g, v, stem = s2d_stem_serving(g, v)
                if stem is not None:
                    extract_fn = extract_s2d_patches

        # full-depth column serving (--serve_grid column): pad D to the
        # net's stride multiple and serve 4 (160, 128, 128) columns — the
        # reference D grid (starts {0, 27}) recomputes 101 of 155 planes;
        # a v5e has the HBM to hold the full-depth activations instead
        # (eval/sliding.py::column_grid_plan; +21% measured)
        g_patch, g_overlap, np_grid = patch, overlap, n_patches
        if grid == "column":
            from efficientq_tpu.eval.sliding import column_grid_plan
            from efficientq_tpu.models.uresq import min_input_divisor

            pad_d, g_patch, g_overlap = column_grid_plan(
                vol_shape, patch, overlap, min_input_divisor(cfg)[0])
            np_grid = len(patch_grid((pad_d,) + vol_shape[1:], g_patch,
                                     g_overlap))

        @jax.jit
        def infer_volume(v, image):
            if grid == "column":
                image = jnp.pad(image, ((0, 0), (0, pad_d - vol_shape[0]),
                                        (0, 0), (0, 0), (0, 0)))

            def model_fn(xb):
                # bf16 operands / f32 accumulation for the XLA convs: at
                # 2-bit quantization the bf16 rounding of grid values is
                # noise, and the MXU runs at full bf16 throughput.  Pallas-
                # flagged int8 nodes run their own fused MXU kernels.
                # keep_head_dtype: this is hard-pred serving — the head /
                # stitch / sign-test tail stays bf16
                return nnir.apply(g, v, xb, mode="quantized",
                                  compute_dtype=jnp.bfloat16,
                                  keep_head_dtype=True)

            # full patch grid as ONE batched forward: fewest dispatch
            # round-trips and best MXU utilization (measured sweep up to the
            # full grid).  normalize=False: hard-pred serving is invariant
            # to the positive per-voxel visit count (sigmoid(x) >= 0.5 <=>
            # x >= 0), so the overlap-average division is skipped
            logits = sliding_window_inference(model_fn, image, g_patch,
                                              g_overlap,
                                              patch_batch=np_grid * n_vols,
                                              channels_first=True,
                                              normalize=False,
                                              extract_fn=extract_fn)
            logits = logits[-1][:, :, :vol_shape[0]]  # crop the column pad
            # end-to-end serving output: hard segmentation (uint8), so the
            # timed loop can materialize each result on the host cheaply
            return pred_brats_con_merge(logits, axis=1).astype(jnp.uint8)

        return jax.tree_util.Partial(infer_volume, v)

    iters = 5

    def time_sync(infer):
        """Synchronous serving: block on the host materialization per
        volume (includes tunnel/transfer latency)."""
        t0 = time.perf_counter()
        for _ in range(iters):
            seg = np.asarray(infer(vj))
        return iters / (time.perf_counter() - t0)

    def time_async(infer):
        """Pipelined device throughput: keep the device queue full (the
        deployment mode with concurrent volumes), materialize at the end."""
        t0 = time.perf_counter()
        segs = [infer(vj) for _ in range(iters)]
        jax.block_until_ready(segs)
        return iters / (time.perf_counter() - t0)

    infer_bf16 = make_infer(fgraph, fvars)
    seg = np.asarray(infer_bf16(vj))  # compile + warmup + transfer
    assert seg.shape == (1, *vol_shape)
    sync_vps = time_sync(infer_bf16)
    async_vps = time_async(infer_bf16)

    # int8 deployment: true-integer MXU arithmetic through the fused Pallas
    # kernels (ptq/deploy.py + pallas/qconv3d.py), bit-exact vs fake-quant
    igraph, ivars = to_int8_inference(fgraph, fvars)
    infer_int8 = make_infer(igraph, ivars)
    seg8 = np.asarray(infer_int8(vj))
    assert seg8.shape == (1, *vol_shape)
    int8_sync_vps = time_sync(infer_int8)
    int8_async_vps = time_async(infer_int8)

    # mixed serving: int8 Pallas MXU for the FLOP-heavy 3^3 convs, bf16 XLA
    # matmuls for the skinny 1x1 transitions (fastest measured combination)
    mgraph, mvars = to_int8_inference(fgraph, fvars,
                                      only_kernel_sizes={(3, 3, 3)})
    infer_mixed = make_infer(mgraph, mvars)
    segm = np.asarray(infer_mixed(vj))
    assert segm.shape == (1, *vol_shape)
    mixed_sync_vps = time_sync(infer_mixed)
    mixed_async_vps = time_async(infer_mixed)

    # full-depth column serving on the fastest variant (mixed): 4 columns
    # instead of 8 cubes — no D-overlap recompute, half the extraction /
    # stitch work (column_grid_plan)
    infer_mixed_col = make_infer(mgraph, mvars, grid="column")
    segc = np.asarray(infer_mixed_col(vj))
    assert segc.shape == (1, *vol_shape)
    col_sync_vps = time_sync(infer_mixed_col)
    col_async_vps = time_async(infer_mixed_col)

    # host-s2d serving: the stem runs the fused Pallas s2d kernel
    # (pallas/stem.py — 2.8 ms vs the 6.0 ms XLA stem + 3.0 ms dual-output
    # pass it absorbs) with the space-to-depth prep on the HOST.  TWO host
    # splits, measured separately because the better one depends on host
    # core count (the pipelined bound is max(host ms, device ms)):
    #   hostvol  — host transforms the VOLUME (s2d_bf16, ~26 ms 1-core),
    #              device extracts the patch stack (~1.2 ms layout traffic)
    #   prestack — host writes the stem kernel's input patch STACK
    #              directly (s2d_patches_bf16, ~55 ms 1-core: 2x the
    #              bytes), device runs ZERO extraction (best device time)
    # On a 1-core rig hostvol's bound wins; on a many-core production host
    # prestack's device time is the bound and it wins.
    s2d_probe = {}  # name -> (device_async_vps, host_ms, call)
    try:
        from efficientq_tpu.data import native as effq_native
        from efficientq_tpu.pallas.stem import (extract_pre_s2d_patches,
                                                prestacked_s2d_extract,
                                                s2d_need_planes)

        starts = patch_grid(vol_shape, patch, overlap)
        stem0 = next((nd for nd in mgraph.nodes
                      if nd.op == "conv"
                      and nd.inputs == (mgraph.input_name,)), None)
        if stem0 is not None and s2d_supported(starts, patch, vol_shape,
                                               stem0.attrs):
            g2 = channels_first_tail(mgraph)
            g2, v2, stem = s2d_stem_serving(g2, mvars)
            if stem is not None:
                def host_ms(fn):
                    # warmup pays the one-time ctypes/make load (r3 charged
                    # it to the transform: 1695 ms for a 26 ms kernel)
                    out = fn()
                    samples = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        fn()
                        samples.append((time.perf_counter() - t0) * 1e3)
                    return out, min(samples)

                def run_variant(name, host_fn, extract_fn):
                    host_out, ms = host_ms(host_fn)
                    sj = jnp.asarray(host_out)

                    @jax.jit
                    def infer_fn(v, sv):
                        def model_fn(xb):
                            return nnir.apply(g2, v, xb, mode="quantized",
                                              compute_dtype=jnp.bfloat16,
                                              keep_head_dtype=True)

                        logits = sliding_window_inference(
                            model_fn, sv, patch, overlap,
                            patch_batch=n_patches, channels_first=True,
                            normalize=False, extract_fn=extract_fn,
                            vol_shape=vol_shape)
                        return pred_brats_con_merge(
                            logits[-1], axis=1).astype(jnp.uint8)

                    call = jax.tree_util.Partial(infer_fn, v2)
                    seg = np.asarray(call(sj))
                    assert seg.shape == (1, *vol_shape)
                    t0 = time.perf_counter()
                    outs = [call(sj) for _ in range(iters)]
                    jax.block_until_ready(outs)
                    vps = iters / (time.perf_counter() - t0)
                    s2d_probe[name] = (vps, ms, lambda: call(sj))

                need = s2d_need_planes(starts, patch)
                run_variant("mixed_s2d_hostvol",
                            lambda: effq_native.s2d_bf16(vol, need),
                            extract_pre_s2d_patches)
                run_variant("mixed_s2d_prestack",
                            lambda: effq_native.s2d_patches_bf16(
                                vol, starts, patch),
                            prestacked_s2d_extract)
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"# host-s2d probe skipped: {e!r}", file=sys.stderr)

    # SUSTAINED stream through the PRODUCT --serve_stem s2d path
    # (ptq/deploy.py::make_s2d_volume_inferencer — the exact inferencer
    # validate_seg drives, 1-deep pipeline): the s2d headline above is a
    # computed pipeline bound; this row is a MEASUREMENT over a
    # many-volume stream with per-volume host-transform timing
    # (VERDICT r4 item 2).  Distinct volumes per iteration — the runtime
    # memoizes identical pure executions through the dev tunnel.
    stream = None
    try:
        from efficientq_tpu.data import native as effq_native2
        from efficientq_tpu.ptq.deploy import make_s2d_volume_inferencer

        host_times = []
        orig_s2d = effq_native2.s2d_bf16

        def timed_s2d(*a, **kw):
            t0 = time.perf_counter()
            out = orig_s2d(*a, **kw)
            host_times.append((time.perf_counter() - t0) * 1e3)
            return out

        effq_native2.s2d_bf16 = timed_s2d
        try:
            infer_prod = make_s2d_volume_inferencer(
                mgraph, mvars, hard_pred=True, multilabel=True,
                heads=slice(-1, None))
            if infer_prod is not None:
                n_stream = 16
                rs = np.random.RandomState(7)
                slabs = [rs.randn(1, 8, *vol_shape[1:], 4).astype(np.float32)
                         for _ in range(4)]

                def mk(i):
                    v = vol.copy()
                    v[:, i % 16:i % 16 + 8] += slabs[i % 4]
                    return v

                np.asarray(infer_prod(None, mk(99), patch, overlap))  # warm
                host_times.clear()
                t0 = time.perf_counter()
                pending = None
                for i in range(n_stream):
                    preds = infer_prod(None, mk(i), patch, overlap)
                    if pending is not None:
                        np.asarray(pending)
                    pending = preds
                np.asarray(pending)
                wall = time.perf_counter() - t0
                hh = np.asarray(host_times)
                # isolate the per-volume host->device upload: on this rig
                # the dev tunnel (~tens of MB/s) bounds a distinct-volume
                # stream — name it so the row can't masquerade as serving
                # cost (production hosts feed over PCIe at GB/s)
                from efficientq_tpu.pallas.stem import s2d_need_planes
                sv_h = orig_s2d(mk(98), s2d_need_planes(
                    patch_grid(vol_shape, patch, overlap), patch))
                ups = []
                for _ in range(3):
                    tu = time.perf_counter()
                    jax.block_until_ready(jnp.asarray(sv_h))
                    ups.append((time.perf_counter() - tu) * 1e3)
                up_ms = float(min(ups))
                mb = sv_h.size * sv_h.dtype.itemsize / 1e6
                stream = {
                    "volumes_per_sec": round(n_stream / wall, 3),
                    "n_volumes": n_stream,
                    "host_s2d_ms": {"min": round(float(hh.min()), 1),
                                    "p50": round(float(np.median(hh)), 1),
                                    "max": round(float(hh.max()), 1)},
                    "host_occupancy": round(float(hh.sum()) / (wall * 1e3),
                                            3),
                    "upload_ms_per_volume": round(up_ms, 1),
                    "upload_mb_per_sec": round(mb / (up_ms / 1e3), 1),
                    "bound": ("rig tunnel upload"
                              if up_ms > 4 * max(float(np.median(hh)), 25.0)
                              else "host/device"),
                }
        finally:
            effq_native2.s2d_bf16 = orig_s2d
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"# sustained-stream probe skipped: {e!r}", file=sys.stderr)

    # cross-volume batching: the patch grids of 3 volumes as ONE 24-patch
    # forward (sliding_window_inference stitches N>1 natively; the
    # inferencer's patch_batch must scale with the volume count or the
    # grid silently chunks back to 8-patch forwards — review r3) —
    # larger MXU M-dim + fewer dispatches; +17-20% over single-volume
    # pipelining in an isolated process (scripts/serve_batch_probe.py)
    infer_mixed3 = make_infer(mgraph, mvars, n_vols=3)
    vj3 = jnp.asarray(np.random.RandomState(1)
                      .randn(3, *vol_shape, 4).astype(np.float32))
    seg3 = np.asarray(infer_mixed3(vj3))
    assert seg3.shape == (3, *vol_shape)
    t0 = time.perf_counter()
    outs3 = [infer_mixed3(vj3) for _ in range(iters)]
    jax.block_until_ready(outs3)
    mixed_async3_vps = 3 * iters / (time.perf_counter() - t0)

    # serving-artifact overhead probe (export.py): the SAME final-head
    # forward, once as a live jitted graph and once deserialized from the
    # jax.export StableHLO artifact — the artifact claim is that
    # serialization costs nothing at serve time.  Guarded: a failure here
    # must not cost the headline measurement.
    artifact_async_vps = live_jit_async_vps = None
    try:
        import tempfile

        from efficientq_tpu import export as export_mod
        from efficientq_tpu.eval.sliding import make_jitted_volume_inferencer

        live = make_jitted_volume_inferencer(
            fgraph, patch_batch=n_patches, mode="quantized",
            heads=slice(-1, None), hard_pred=True, multilabel=True)
        exported, _batch = export_mod.export_patch_model(
            fgraph, fvars, patch, 4, mode="quantized",
            patch_batch=n_patches)
        with tempfile.NamedTemporaryFile(suffix=".zip") as tf:
            export_mod.save_serving_artifact(tf.name, exported, {
                "batch": _batch, "patch_size": list(patch),
                "overlap": list(overlap), "n_class": 3})
            art = export_mod.load_serving_artifact(tf.name)
        art_infer = art.volume_inferencer(patch_batch=n_patches,
                                          hard_pred=True, multilabel=True)

        def time_async_fn(fn, *a):
            # block on the warmup: its device execution must not bleed
            # into the timed window (compile cost differs live vs
            # artifact, so the bleed would skew the comparison unevenly)
            jax.block_until_ready(fn(*a))
            t0 = time.perf_counter()
            outs = [fn(*a) for _ in range(iters)]
            jax.block_until_ready(outs)
            return iters / (time.perf_counter() - t0)

        live_jit_async_vps = time_async_fn(live, fvars, vj, patch, overlap)
        artifact_async_vps = time_async_fn(art_infer, None, vj, patch,
                                           overlap)
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"# artifact probe skipped: {e!r}", file=sys.stderr)

    # Headline policy (VERDICT r3 item 2 + advisor r3): the durable number is
    # DEVICE throughput, not tunnel-bound synchronous dispatch — sync vol/s
    # "dropped" 4.40->3.62 across r2->r3 on tunnel RTT noise alone while the
    # device improved 38.7->33.7 ms/volume.  The headline is therefore the
    # best *pipelined* (async) variant among the REFERENCE-PARITY patch-grid
    # variants (the column grid changes what the metric measures — advisor
    # r3 finding 5 — so it is reported separately below), plus the xplane
    # device_ms_per_volume of that winner.  Sync variants remain as a
    # tunnel-health diagnostic only.
    async_variants = {
        "bf16_async": (async_vps, lambda: infer_bf16(vj)),
        "int8_pallas_async": (int8_async_vps, lambda: infer_int8(vj)),
        "mixed_int8_3x3_async": (mixed_async_vps, lambda: infer_mixed(vj)),
    }
    # s2d variants: same patch grid as the reference (grid-parity);
    # numerics differ only at bf16 reduction-order level, like
    # --serve_dtype bf16.  Headline eligibility uses the PIPELINE bound:
    # the host transform overlaps device compute, so sustained throughput
    # is min(device rate, host rate) — on a many-core production host the
    # threaded transform is far below device time, but THIS rig has one
    # core, and quoting device-only throughput while the host gates the
    # pipeline would overstate the deliverable.
    s2d_effective = {name: min(vps, 1000.0 / ms)
                     for name, (vps, ms, _) in s2d_probe.items()}
    for name, (vps, ms, call) in s2d_probe.items():
        async_variants[name + "_async"] = (s2d_effective[name], call)
    headline_variant = max(async_variants, key=lambda k: async_variants[k][0])
    tpu_volumes_per_sec, headline_call = async_variants[headline_variant]

    # xplane device time of the headline variant: the tunnel-independent
    # ground truth (same extraction as scripts/profile_serving.py)
    device_ms_per_volume = None
    try:
        import tempfile

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scripts.profile_serving import top_device_ops

        logdir = tempfile.mkdtemp(prefix="effq_bench_prof_")
        with jax.profiler.trace(logdir):
            outs = [headline_call() for _ in range(iters)]
            jax.block_until_ready(outs)
        _, total_ms = top_device_ops(logdir)
        device_ms_per_volume = total_ms / iters
    except Exception as e:  # pragma: no cover - profiler-path guard
        print(f"# xplane device-time probe skipped: {e!r}", file=sys.stderr)

    # FLOP accounting for MFU/roofline (VERDICT r2 item 9): conv MACs of
    # the whole patch-grid volume forward (2x2x2 = 8 patches at this
    # volume/patch/overlap), from statically evaluated shapes.  NOTE: rounds
    # 1-3 mistakenly used 18 here (a stale grid count), overstating
    # conv_tflops_per_volume and MFU by 2.25x.
    def graph_flops(g, batch, spatial):
        # count only convs reachable from the SERVING output: every timed
        # variant runs channels_first_tail(g), whose single final-head
        # output lets XLA DCE the aux classifiers — counting those convs
        # overstated MFU by ~1% (review r3; same error class as the
        # 18-vs-8 grid overcount below)
        tail = channels_first_tail(g)
        reach, stack = set(tail.outputs), list(tail.outputs)
        while stack:
            for i in tail.node(stack.pop()).inputs:
                if i not in reach:
                    reach.add(i)
                    stack.append(i)
        conv_names = [n.name for n in g.conv_nodes() if n.name in reach]
        shapes = jax.eval_shape(
            lambda xx: nnir.apply(g, fvars, xx, mode="fp",
                                  capture=conv_names)[1],
            jax.ShapeDtypeStruct((batch, *spatial, 4), jnp.float32))
        total = 0
        for n in g.conv_nodes():
            if n.name not in reach:
                continue
            a = n.attrs
            out_sh = shapes[n.name].shape  # (N, D, H, W, O)
            k = int(np.prod(a["kernel_size"]))
            total += (2 * int(np.prod(out_sh[:4])) * a["out_ch"]
                      * a["in_ch"] // a["groups"] * k)
        return total

    flops_volume = graph_flops(fgraph, n_patches, patch)
    from efficientq_tpu.eval.sliding import column_grid_plan
    from efficientq_tpu.models.uresq import min_input_divisor

    pad_d, col_patch, col_ov = column_grid_plan(vol_shape, patch, overlap,
                                                min_input_divisor(cfg)[0])
    n_cols = len(patch_grid((pad_d,) + vol_shape[1:], col_patch, col_ov))
    flops_column = graph_flops(fgraph, n_cols, col_patch)
    # v5e peak: 197 TFLOP/s bf16, 394 TOP/s int8 (public spec); MFU is
    # reported against the bf16 peak for every variant — the int8 variants'
    # headroom to the 2x int8 peak is part of the story
    PEAK_BF16 = 197e12
    mfu = {
        "bf16_async": flops_volume * async_vps / PEAK_BF16,
        "int8_pallas_async": flops_volume * int8_async_vps / PEAK_BF16,
        "mixed_int8_3x3_async": flops_volume * mixed_async_vps / PEAK_BF16,
        # column serving runs FEWER flops per volume (no D-overlap
        # recompute) — its MFU uses its own flop count
        "mixed_column_async": flops_column * col_async_vps / PEAK_BF16,
        # s2d variants: MFU from the DEVICE rate (device utilization is
        # host-count-independent; the effective rate is reported below)
        **{name + "_async": flops_volume * vps / PEAK_BF16
           for name, (vps, _, _) in s2d_probe.items()},
    }

    # torch CPU FP32 baseline: one 128^3 patch through the same graph,
    # extrapolated to the 8-patch volume (a full CPU volume would take
    # ~10 min; stitching cost is negligible next to the convs)
    x = vol[:, :128, :128, :128, :]
    x_ncdhw = np.transpose(x, (0, 4, 1, 2, 3)).copy()
    t0 = time.perf_counter()
    torch_reference_forward(fgraph, fvars, x_ncdhw)
    cpu_patch_sec = time.perf_counter() - t0
    cpu_volumes_per_sec = 1.0 / (cpu_patch_sec * n_patches)
    # grid-matched CPU extrapolation for the column variant (conv-flop
    # proportional; labeled "extrapolated" — CPU time is not purely
    # conv-flop-proportional, advisor r3): a CPU column run also skips the
    # D-overlap recompute, so the column speedup stays apples-to-apples
    # per grid, but it is an estimate, not a measurement
    cpu_col_volumes_per_sec = cpu_volumes_per_sec * flops_volume / flops_column

    print(json.dumps({
        "metric": "brats_w4a4_whole_volume_sliding_window_inference",
        "value": round(tpu_volumes_per_sec, 4),
        "unit": "volumes/sec",
        "vs_baseline": round(tpu_volumes_per_sec / cpu_volumes_per_sec, 2),
        "headline_variant": headline_variant,
        # tunnel-independent ground truth for the headline variant (xplane
        # device-plane total / volume); the number to compare across rounds
        "device_ms_per_volume": (round(device_ms_per_volume, 2)
                                 if device_ms_per_volume else None),
        # flop counts for BOTH serving grids (advisor r3): the headline
        # variants run the reference-parity patch grid (flops_volume); the
        # column variants run flops_column (~37% fewer, no D-recompute)
        "conv_tflops_per_volume": round(flops_volume / 1e12, 3),
        "conv_tflops_per_volume_column_grid": round(flops_column / 1e12, 3),
        "mfu_vs_bf16_peak": {k: round(v, 4) for k, v in mfu.items()},
        # column serving: faster end-to-end but NOT grid-parity with the
        # reference (>99.9% voxel agreement, not exact) — reported beside
        # the headline, never as it; its baseline ratio is extrapolated
        "column_async_volumes_per_sec": round(col_async_vps, 4),
        "column_vs_baseline_extrapolated": round(
            col_async_vps / cpu_col_volumes_per_sec, 2),
        "variants": {
            "bf16_async": round(async_vps, 4),
            "int8_pallas_async": round(int8_async_vps, 4),
            "mixed_int8_3x3_async": round(mixed_async_vps, 4),
            "mixed_column_async": round(col_async_vps, 4),
            "mixed_int8_3x3_async_3vol_batch": round(mixed_async3_vps, 4),
            # _device = device-only rate; _effective = pipeline bound
            # min(device, host transform) — what a 1-core host sustains
            **{k: round(v, 4) for name, (vps, _, _) in s2d_probe.items()
               for k, v in ((name + "_device", vps),
                            (name + "_effective", s2d_effective[name]))},
            **({"artifact_async": round(artifact_async_vps, 4),
                "live_jit_async": round(live_jit_async_vps, 4)}
               if artifact_async_vps else {}),
        },
        # host-side s2d transform cost per volume (overlaps device compute
        # in pipelined serving; the pipeline bound is max(host, device));
        # single-core numbers — the transforms thread on production hosts
        **({"host_s2d_ms_per_volume":
            {name: round(ms, 1) for name, (_, ms, _) in s2d_probe.items()}}
           if s2d_probe else {}),
        # MEASURED sustained stream through the product --serve_stem s2d
        # inferencer (validate_seg's 1-deep pipeline; per-volume host
        # transform timed inline) — the headline's end-to-end ground truth
        **({"s2d_sustained_stream": stream} if stream else {}),
        # synchronous per-volume dispatch: dominated by the dev tunnel's
        # per-call RTT, kept ONLY as a tunnel-health diagnostic
        "tunnel_diagnostics_sync": {
            "bf16_sync": round(sync_vps, 4),
            "int8_pallas_sync": round(int8_sync_vps, 4),
            "mixed_int8_3x3_sync": round(mixed_sync_vps, 4),
            "mixed_column_sync": round(col_sync_vps, 4),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
