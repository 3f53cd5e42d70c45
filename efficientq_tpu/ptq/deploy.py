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
            new_nodes.append(dataclasses.replace(node, attrs=attrs))
        else:
            new_nodes.append(dataclasses.replace(node, attrs=dict(node.attrs)))
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
