"""Int8 deployment transform: true integer-arithmetic quantized inference.

The fake-quant forward (mode='quantized') computes
    y = conv(alpha_a * qa/(na-1),  alpha_w * s/(nw-1)) + b
with qa in [0, na-1] and s an odd integer in [-(nw-1), nw-1].  Both factors
are exact integers times a scale, so the conv can run on the MXU's int8
path with int32 accumulation and a single f32 epilogue:
    y = conv_int8(qa, s) * (alpha_a * alpha_w / ((na-1)(nw-1))) + b
— bit-exact with the fake-quant computation (integer accumulation has no
rounding), and eligible for the 2x int8 MXU throughput.

``to_int8_inference`` rewrites eligible qconvs (q_act with <=128 levels and
q_weight with <=128 levels so codes fit int8); ineligible layers (e.g. the
256-level-weight first/last convs, which also skip activation quantization)
keep the float path.  Run the result with ``nnir.apply(mode='quantized')``
— the int8 nodes carry an attrs flag the evaluator dispatches on.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..nnir import Graph


def eligible(qcfg) -> bool:
    return (qcfg is not None and qcfg.q_weight and qcfg.q_act
            and qcfg.qlvl_act <= 128 and qcfg.qlvl_w <= 128)


def to_int8_inference(graph: Graph, variables, pallas: bool = None,
                      only_kernel_sizes=None,
                      node_filter=None,
                      fuse_epilogues: bool = True) -> Tuple[Graph, Dict]:
    """Returns (graph', variables') with eligible qconvs converted to int8
    codes + scale epilogue.  Input variables must hold post-PTQ quantized
    kernels (values = alpha_w * grid).

    With ``pallas=True`` the result is additionally flagged for the fused
    Pallas kernels (pallas/qmatmul.py, pallas/qconv3d.py): on a TPU backend
    the int8 3^3 convs and 1x1x1 matmuls run as single fused act-quant +
    int8-MXU programs.  Default is backend-derived (TPU -> True): elsewhere
    the kernels would dispatch through interpret-mode Pallas, orders of
    magnitude slower than the XLA int8 conv (advisor r2).

    ``only_kernel_sizes``: optional collection of kernel-size triples —
    qconvs with other shapes keep the float fake-quant path (e.g.
    ``{(3, 3, 3)}`` gives the mixed serving graph: int8 MXU for the
    FLOP-heavy 3^3 convs, bf16 XLA matmuls for the skinny transitions).
    """
    if pallas is None:
        import jax

        pallas = jax.default_backend() == "tpu"
    params = {k: dict(v) for k, v in variables["params"].items()}

    def act_k_of(node) -> int:
        """Offset-grid shift calibrated for this conv (run_ptq
        act_offset), baked into attrs as a STATIC int so the int8 eval
        path and the Pallas-eligibility gates below see it (the fused
        kernels' act-quant prologues/epilogues assume the unsigned grid;
        offset layers keep the XLA realization of the same math)."""
        v = params.get(node.name, {}).get("act_k")
        return int(np.asarray(v)) if v is not None else 0

    new_nodes = []
    for node in graph.nodes:
        if (node.op == "conv" and eligible(node.attrs.get("qcfg"))
                and (only_kernel_sizes is None
                     or tuple(node.attrs["kernel_size"])
                     in only_kernel_sizes)
                and (node_filter is None or node_filter(node))):
            qcfg = node.attrs["qcfg"]
            p = params[node.name]
            alpha_w = jnp.asarray(p["alpha_w"], jnp.float32)
            alpha_a = jnp.asarray(p["alpha_act"], jnp.float32)
            # w / alpha_w * (nw-1) = 2b - (nw-1): odd integers in
            # [-(nw-1), nw-1]
            codes = jnp.round(
                p["kernel"] / alpha_w * (qcfg.qlvl_w - 1)).astype(jnp.int8)
            scale = alpha_a * alpha_w / ((qcfg.qlvl_act - 1) *
                                         (qcfg.qlvl_w - 1))
            p["kernel_int8"] = codes
            p["scale"] = scale
            del p["kernel"]
            attrs = dict(node.attrs)
            attrs["int8"] = True
            ak = act_k_of(node)
            if ak:
                attrs["act_k"] = ak
            new_nodes.append(dataclasses.replace(node, attrs=attrs))
        else:
            attrs = dict(node.attrs)
            if node.op == "conv":
                ak = act_k_of(node)
                if ak:
                    attrs["act_k"] = ak
            new_nodes.append(dataclasses.replace(node, attrs=attrs))
    out_graph = Graph(new_nodes, list(graph.outputs), graph.input_name)
    if pallas:
        from ..pallas.qmatmul import to_pallas_inference

        out_graph = to_pallas_inference(out_graph)
        if fuse_epilogues:
            # fold the surrounding relu / residual-add / next act-quant
            # into the Pallas kernels so the custom calls stop being XLA
            # fusion barriers (pallas/epilogue.py)
            from ..pallas.epilogue import fuse_int8_epilogues

            out_graph = fuse_int8_epilogues(out_graph)
    return out_graph, {"params": params, "state": variables.get("state", {})}


def channels_first_tail(graph: Graph) -> Graph:
    """Serving-only rewrite: keep only the FINAL head and emit it NCDHW.

    The classifier head is C=3 channels; every channel-minor pass after it
    (the 1x1 head conv's write, the trilinear upsample, the full-volume
    stitch updates) tiles lanes at C=3/128 — ~42x its logical bytes —
    which profiled at ~9 ms of the 42.6 ms int8 serving graph.  Rewriting
    the tail to channels-first puts W on the lanes instead: the head conv
    becomes an einsum emitting (N, C, D, H, W) and the upsample/stitch run
    with dense tiles.  Consumers take the class axis at dim 1
    (ptq/attention.py pred helpers accept ``axis``).

    Numerics are unchanged (same contraction, same trilinear weights); the
    reference has no analogue — its cuDNN NCDHW layout never paid this tax
    (src/models/model_blk.py:180-186 emits NCDHW natively).
    """
    out = graph.outputs[-1]
    tail_up = None
    cur = graph.node(out)
    if cur.op == "upsample":
        tail_up = cur.name
        cur = graph.node(cur.inputs[0])
    a = cur.attrs
    if not (cur.op == "conv" and a["kernel_size"] == (1, 1, 1)
            and a["stride"] == (1, 1, 1) and a["padding"] == (0, 0, 0)
            and a["groups"] == 1 and not a.get("int8")):
        return graph  # unexpected tail shape: leave the graph unchanged
    new_nodes = []
    for n in graph.nodes:
        if n.name == cur.name:
            new_nodes.append(dataclasses.replace(n, op="conv_cf",
                                                 attrs=dict(n.attrs)))
        elif n.name == tail_up:
            new_nodes.append(dataclasses.replace(n, op="upsample_cf",
                                                 attrs=dict(n.attrs)))
        else:
            new_nodes.append(n)
    # aux-head nodes stay in the node list (XLA DCEs them — same mechanism
    # as final-head-only serving via ``heads=slice(-1, None)``) but the
    # graph now has the single channels-first output
    return Graph(new_nodes, [out], graph.input_name)


def s2d_stem_serving(graph: Graph, variables):
    """Serving-only rewrite: run the init conv as the fused space-to-depth
    Pallas stem (pallas/stem.py).

    Rewrites
        input -> conv0 (3^3 s2) -> [identity...] -> relu -> {int8 conv,
                                                             residual uses}
    into
        (s2d patches, parities) -> stem_s2d -> (bf16 relu'd, int8 codes)
    with the relu node becoming a tuple-get on the bf16 branch (so residual
    consumers are untouched) and the int8 consumer reading the codes branch
    directly (``input_quantized``).  The model input becomes the
    (patches, parities) pair produced by pallas.stem.extract_s2d_patches —
    use it with ``sliding_window_inference(extract_fn=...)``.

    Returns (graph', variables', stem_node) — stem_node is None when the
    graph doesn't match (rewrite skipped; original graph returned).
    """
    skip = (graph, variables, None)
    stem = next((n for n in graph.nodes
                 if n.op == "conv" and n.inputs == (graph.input_name,)), None)
    if stem is None or stem.attrs.get("int8"):
        return skip
    a = stem.attrs
    if not (a["kernel_size"] == (3, 3, 3) and a["stride"] == (2, 2, 2)
            and a["padding"] == (1, 1, 1) and a["dilation"] == (1, 1, 1)
            and a["groups"] == 1):
        return skip
    if 8 * a["in_ch"] < 32 or a["out_ch"] < 32:
        # s2d channels (8C) or output below a vector register: real Mosaic
        # fails to lower toy-width kernels (same class as the qconv3d
        # narrow-channel fallback) — serve the direct stem there.
        # Interpret-mode Pallas (CPU tests) lowers fine, so the guard is
        # backend-scoped.
        import jax

        if jax.default_backend() == "tpu":
            return skip
    # follow the identity chain to the stem's relu.  After
    # pallas/epilogue.py::_elide_relus the chain end fans out (the relu is
    # dead and its former consumers read the chain directly), so accept a
    # fan-out as long as exactly one relu hangs off it.
    cur = stem.name
    relu = None
    for _ in range(4):
        users = [n for n in graph.nodes if cur in n.inputs]
        relus = [u for u in users if u.op == "relu"]
        if len(relus) == 1:
            relu = relus[0]
            break
        if len(users) != 1 or users[0].op != "identity":
            return skip
        cur = users[0].name
    if relu is None:
        return skip
    # the int8 codes consumer: a Pallas int8 conv reading the (possibly
    # elided — pallas/epilogue.py::_elide_relus) relu as its data input;
    # every other consumer edge must be a residual stream, which keeps the
    # bf16 branch
    taps = {relu.name, cur}
    edges = [(n, i) for n in graph.nodes if n.name != relu.name
             for i, inp in enumerate(n.inputs) if inp in taps]
    codes_edges = [(n, i) for (n, i) in edges
                   if i == 0 and n.op == "conv" and n.attrs.get("int8")
                   and n.attrs.get("pallas")
                   # offset-grid consumers quantize with signed codes the
                   # stem's unsigned quant epilogue cannot emit
                   and not n.attrs.get("act_k")
                   and not n.attrs.get("input_quantized")]
    if len(codes_edges) != 1:
        return skip
    consumer = codes_edges[0][0]
    res_edges = [(n, i) for (n, i) in edges if n is not consumer]
    if any(i == 0 or not n.attrs.get("residual") for (n, i) in res_edges):
        return skip  # a non-residual consumer would need the float value

    from ..pallas.stem import s2d_stem_weights

    params = {k: dict(v) for k, v in variables["params"].items()}
    sp = params[stem.name]
    w_even, w_odd = s2d_stem_weights(np.asarray(sp["kernel"], np.float32))
    bias = sp.get("bias")
    if bias is None:
        bias = jnp.zeros((w_even.shape[-1],), jnp.float32)
    params[stem.name] = {
        # bf16 weights: serving always runs the stem at compute_dtype, and
        # the kernel's MXU dots take bf16 operands with f32 accumulation
        "w_even": jnp.asarray(w_even, jnp.bfloat16),
        "w_odd": jnp.asarray(w_odd, jnp.bfloat16),
        "bias": jnp.asarray(bias, jnp.float32),
        "alpha_next": params[consumer.name]["alpha_act"],
    }
    codes_name = stem.name + ".s2d_codes"
    new_nodes = []
    for n in graph.nodes:
        if n.name == stem.name:
            attrs = dict(n.attrs)
            attrs["qlvl_next"] = consumer.attrs["qcfg"].qlvl_act
            new_nodes.append(dataclasses.replace(n, op="stem_s2d",
                                                 attrs=attrs))
        elif n.name == relu.name:
            new_nodes.append(dataclasses.replace(n, op="tuple_get",
                                                 attrs={"idx": 0}))
            new_nodes.append(
                type(n)(codes_name, "tuple_get", n.inputs, {"idx": 1}))
        elif n.name == consumer.name:
            attrs = dict(n.attrs)
            attrs["input_quantized"] = True
            ins = (codes_name,) + tuple(
                relu.name if inp in taps else inp for inp in n.inputs[1:])
            new_nodes.append(dataclasses.replace(n, inputs=ins, attrs=attrs))
        elif any(m is n for (m, _) in res_edges):
            # residual streams read the bf16 branch (the tuple-get that
            # replaced the relu); an existing residual_relu flag is
            # harmless — relu is idempotent
            ins = tuple(relu.name if inp in taps else inp for inp in n.inputs)
            new_nodes.append(dataclasses.replace(n, inputs=ins,
                                                 attrs=dict(n.attrs)))
        else:
            new_nodes.append(n)
    g2 = Graph(new_nodes, list(graph.outputs), graph.input_name)
    return g2, {"params": params,
                "state": variables.get("state", {})}, g2.node(stem.name)


def make_s2d_volume_inferencer(graph: Graph, variables, *,
                               patch_batch="auto", hard_pred: bool = True,
                               multilabel: bool = False,
                               compute_dtype=jnp.bfloat16,
                               heads=None):
    """Host-s2d serving (--serve_stem s2d): the product analogue of the
    bench's fastest mode.

    The init conv runs as the fused space-to-depth Pallas stem
    (s2d_stem_serving) and the space-to-depth transform runs on the HOST
    (data/native.py::s2d_bf16, threaded C++ with NumPy fallback),
    overlapping the previous volume's device compute in validate_seg's
    1-deep pipeline — the on-device transform was measured a net loss
    (14.9 ms relayout, docs/kernels.md).

    Returns ``infer(variables_ignored, image, patch_size, overlap)``
    accepting a HOST (numpy NDHWC) volume, with the same output contract
    as eval.sliding.make_jitted_volume_inferencer, or ``None`` when the
    graph has no eligible stem (not a 3^3-stride-2 init conv feeding an
    int8 Pallas consumer — i.e. use --deploy int8|mixed first).  Volumes
    whose geometry the s2d grid cannot serve (odd H/W starts or extents)
    fall back to the direct inferencer per volume.
    """
    import jax
    from functools import partial

    from .. import nnir, ops
    from ..data import native as effq_native
    from ..eval.sliding import (make_jitted_volume_inferencer, patch_grid,
                                sliding_window_inference)
    from ..pallas.stem import (extract_pre_s2d_patches, s2d_need_planes,
                               s2d_supported)

    stem0 = next((n for n in graph.nodes
                  if n.op == "conv" and n.inputs == (graph.input_name,)),
                 None)
    # serving-tail rewrite BEFORE the stem rewrite: final head emitted
    # NCDHW so the head conv / trilinear up / stitch run with W on the
    # vector lanes instead of the C=3-minor ~42x-padded tiles (the bench
    # graph always had this; the product path previously stitched
    # channels-last — closing that gap is worth ~1.5 ms/volume).  Only
    # engaged when the tail matches AND the caller serves the final head
    # (the cf rewrite drops the aux heads from the output list).
    cf = False
    g_in = graph
    if heads == slice(-1, None) or len(graph.outputs) == 1:
        g_cf = channels_first_tail(graph)
        if g_cf is not graph:
            g_in, cf = g_cf, True
    g2, v2, stem = s2d_stem_serving(g_in, variables)
    if stem is None:
        return None
    stem_attrs = stem0.attrs

    keep_hd = bool(hard_pred and compute_dtype is not None)
    fallback = make_jitted_volume_inferencer(
        graph, patch_batch=(8 if patch_batch in ("auto", 0, None)
                            else int(patch_batch)),
        mode="quantized", hard_pred=hard_pred, multilabel=multilabel,
        compute_dtype=compute_dtype, heads=heads)

    @partial(jax.jit, static_argnames=("patch_size", "overlap", "vol_shape",
                                       "pb"))
    def run(v, sv, patch_size, overlap, vol_shape, pb):
        def model_fn(xb):
            return nnir.apply(g2, v, xb, mode="quantized",
                              compute_dtype=compute_dtype,
                              keep_head_dtype=keep_hd)

        out = sliding_window_inference(
            model_fn, sv, patch_size, overlap, pb,
            heads=None if cf else heads, channels_first=cf,
            normalize=not hard_pred, extract_fn=extract_pre_s2d_patches,
            vol_shape=vol_shape)
        if hard_pred:
            if multilabel:
                out = (out >= 0).astype(jnp.uint8)
                return jnp.moveaxis(out, 2, -1) if cf else out
            return jnp.argmax(out, axis=2 if cf else -1).astype(jnp.uint8)
        return jnp.moveaxis(out, 2, -1) if cf else out

    # 'auto' starts at the full grid (the measured-best chunking on the
    # flagship) but unlike choose_patch_batch the sweep never probed
    # smaller chunks — so a device OOM halves the chunk and retries
    # instead of failing the eval.  Only the FIRST call per program
    # signature blocks (to surface the OOM while retry is still cheap);
    # later volumes stay async so validate_seg's 1-deep pipeline holds.
    pb_cap = {"v": None}
    seen_sigs = set()

    def infer(variables_ignored, image, patch_size, overlap):
        del variables_ignored  # weights are baked into the rewritten graph
        image = np.asarray(image)
        patch_size = tuple(ops.triple(patch_size))
        overlap = tuple(ops.triple(overlap))
        vol_shape = tuple(image.shape[1:4])
        starts = patch_grid(vol_shape, patch_size, overlap)
        if not s2d_supported(starts, patch_size, vol_shape, stem_attrs):
            return fallback(variables, jnp.asarray(image), patch_size,
                            overlap)
        svol = effq_native.s2d_bf16(image.astype(np.float32, copy=False),
                                    s2d_need_planes(starts, patch_size))
        sj = jnp.asarray(svol)
        pb = (len(starts) * image.shape[0]
              if patch_batch in ("auto", 0, None) else int(patch_batch))
        if pb_cap["v"] is not None:
            pb = min(pb, pb_cap["v"])
        while True:
            try:
                out = run(v2, sj, patch_size, overlap, vol_shape, pb)
                sig = (sj.shape, patch_size, overlap, pb)
                if sig not in seen_sigs:
                    jax.block_until_ready(out)
                    seen_sigs.add(sig)
                return out
            except Exception as e:
                if "RESOURCE_EXHAUSTED" not in str(e) or pb <= 1:
                    raise
                pb = max(1, pb // 2)
                pb_cap["v"] = pb
                print(f"serve_stem=s2d: device OOM, retrying at "
                      f"patch_batch={pb}")

    return infer
