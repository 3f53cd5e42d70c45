"""Epilogue fusion for the int8 Pallas deployment graph.

A `pallas_call` is an XLA fusion barrier: in the unfused int8 serving graph
every interior 3^3 conv writes its output to HBM, XLA re-reads it for the
relu / residual-add / next act-quant, and writes again — traffic the bf16
whole-graph path never pays (XLA fuses those elementwise ops into its own
convs), which is why bf16 beat int8 end-to-end in round 2.

This transform rewrites the deployed graph (after ``to_int8_inference`` +
``to_pallas_inference``) so the elementwise neighborhood of each Pallas
int8 3^3 conv moves INTO the kernel:

1. conv -> [identity/dropout]* -> relu -> [identity/dropout]* -> int8 conv
   (every hop single-consumer): the producer emits the consumer's int8
   activation codes directly (`epilogue_quant_for`), the relu folds into
   the quantize clip-at-0, and the consumer skips its own act-quant
   (`input_quantized`).  One int8 write instead of a float write + float
   read + int8 write.  This is the ResBlock's block1.conv -> block2.conv
   edge (src/models/UResQNet.py block factories).

2. conv -> [identity/dropout]* -> add(other): the residual operand streams
   into the kernel at the output tiling and the add happens in VMEM
   (`residual`); the add node becomes an identity.  This is the ResBlock's
   block2.conv -> add edge.

Both rewrites are deployment-graph-only (mode='quantized'); the fused
graph must not be used for calibration or capture.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List

from ..nnir import Graph, Node

_TRANSPARENT = ("identity", "dropout")


def _consumers(graph: Graph) -> Dict[str, List[str]]:
    return graph.consumers()


def _follow_transparent(nodes, cons, name):
    """Walk forward through single-consumer identity/dropout nodes; returns
    (last transparent node name, the single consumer after it) or
    (name, None) if the chain fans out / ends."""
    cur = name
    while True:
        cs = cons.get(cur, [])
        if len(cs) != 1 or cs[0] == "__output__":
            return cur, None
        nxt = nodes[cs[0]]
        if nxt.op in _TRANSPARENT:
            cur = nxt.name
            continue
        return cur, nxt


def _is_pallas_int8_3x3(node: Node) -> bool:
    return (node.op == "conv" and node.attrs.get("pallas")
            and node.attrs.get("int8")
            and node.attrs.get("kernel_size") == (3, 3, 3))


def fuse_int8_epilogues(graph: Graph) -> Graph:
    """Returns a new graph with relu+act-quant and residual-add epilogues
    folded into eligible Pallas int8 3^3 convs."""
    nodes = {n.name: dataclasses.replace(n, inputs=tuple(n.inputs),
                                         attrs=dict(n.attrs))
             for n in graph.nodes}
    cons = _consumers(graph)

    for n in graph.nodes:
        node = nodes[n.name]
        if not _is_pallas_int8_3x3(node):
            continue

        last, nxt = _follow_transparent(nodes, cons, node.name)
        if nxt is None:
            continue

        if nxt.op == "relu":
            relu = nxt
            _, after = _follow_transparent(nodes, cons, relu.name)
            if (after is not None and after.op == "conv"
                    and after.attrs.get("int8")
                    and not after.attrs.get("input_quantized")
                    # offset-grid consumers (act_k) keep their own XLA
                    # act-quant: the in-kernel quant epilogue emits
                    # unsigned [0, n-1] codes
                    and not after.attrs.get("act_k")
                    and after.attrs.get("qcfg") is not None
                    and after.attrs["qcfg"].q_act
                    # the Pallas 1x1 matmuls quantize internally and have
                    # no code-input variant; restrict to the 3^3 kernel and
                    # the XLA int8 conv
                    and (not after.attrs.get("pallas")
                         or after.attrs.get("kernel_size") == (3, 3, 3))):
                node.attrs["epilogue_quant_for"] = after.name
                node.attrs["epilogue_qlvl"] = after.attrs["qcfg"].qlvl_act
                nodes[after.name].attrs["input_quantized"] = True
                nodes[relu.name] = dataclasses.replace(
                    nodes[relu.name], op="identity")
            continue

        if nxt.op == "add" and len(nxt.inputs) == 2 and last in nxt.inputs:
            other = [i for i in nxt.inputs if i != last]
            if len(other) != 1:  # add(x, x) — not a residual pattern
                continue
            order = {m.name: i for i, m in enumerate(graph.nodes)}
            if order.get(other[0], 1 << 30) > order[node.name]:
                continue  # operand not available before the conv
            node.attrs["residual"] = True
            new_inputs = (*node.inputs, other[0])
            nodes[node.name] = dataclasses.replace(node, inputs=new_inputs)
            nodes[nxt.name] = dataclasses.replace(
                nodes[nxt.name], op="identity", inputs=(last,))

    _fuse_pools(graph, nodes)
    _elide_relus(graph, nodes)
    return Graph([nodes[n.name] for n in graph.nodes], list(graph.outputs),
                 graph.input_name)


def _fuse_pools(graph: Graph, nodes: Dict[str, Node]) -> None:
    """Rewrite #4: conv(+residual) -> identity(the fused add) -> maxpool(2)
    becomes a dual-output kernel (pallas/qconv3d.py ``pool``): the encoder's
    TransDown downsample pass re-reads the full stage activation (~1 ms at
    the 64^3 stage); the kernel emits the pooled planes alongside.  The
    identity becomes tuple_get(0) (the skip/decoder consumers see y
    unchanged) and the maxpool becomes tuple_get(1)."""
    cons = graph.consumers(nodes)
    for n in graph.nodes:
        node = nodes[n.name]
        if (not _is_pallas_int8_3x3(node)
                or node.attrs.get("epilogue_quant_for")):
            continue
        # walk the single-consumer transparent chain after the conv (the
        # folded-BN identity, then the fused residual add's identity); the
        # pool hangs off wherever the chain fans out
        cur, first_t = node.name, None
        while True:
            if cur in graph.outputs:
                first_t = None
                break
            cs = [c for c in cons.get(cur, []) if c != "__output__"]
            if len(cs) == 1 and nodes[cs[0]].op in _TRANSPARENT:
                if first_t is None:
                    first_t = cs[0]
                cur = cs[0]
                continue
            break
        if first_t is None:
            continue  # need a transparent hop to host tuple_get(0)
        pools = [u for u in cons.get(cur, [])
                 if u != "__output__" and nodes[u].op == "maxpool"
                 and nodes[u].attrs.get("kernel") == (2, 2, 2)
                 and nodes[u].attrs.get("stride") == (2, 2, 2)]
        if len(pools) != 1:
            continue
        node.attrs["epilogue_pool"] = True
        nodes[first_t] = dataclasses.replace(nodes[first_t], op="tuple_get",
                                             attrs={"idx": 0})
        nodes[pools[0]] = dataclasses.replace(
            nodes[pools[0]], op="tuple_get", inputs=(node.name,),
            attrs={"idx": 1})


def _quant_absorbs_relu(node: Node) -> bool:
    """The act-quant prologue is round(clip(x/alpha, 0, 1)*(n-1)) — the
    clip-at-0 IS a relu, so a relu feeding only the quantizer is
    redundant.  Same eligibility as the quant-epilogue rewrite."""
    return (node.op == "conv" and node.attrs.get("int8")
            and not node.attrs.get("input_quantized")
            # an offset grid (act_k) keeps k levels BELOW zero — its clip
            # is not a relu, so the relu stays materialized
            and not node.attrs.get("act_k")
            and node.attrs.get("qcfg") is not None
            and node.attrs["qcfg"].q_act
            and (not node.attrs.get("pallas")
                 or node.attrs.get("kernel_size") == (3, 3, 3)))


def _elide_relus(graph: Graph, nodes: Dict[str, Node]) -> None:
    """Rewrite #3: delete relu nodes whose every consumer re-applies the
    relu anyway.

    The ResBlock entry (`block1.relu`) feeds (a) block1.conv's act-quant —
    whose clip-at-0 is the relu — and (b) block2.conv's residual stream,
    which the kernel can relu in VMEM (``residual_relu``).  Rewiring both
    to the relu's input leaves the relu dead: the separate
    (bf16 relu, int8 codes) dual-output pass over the full stage activation
    (2.8-3.0 ms at the 64^3 stages) collapses into the quantize-only write,
    which XLA fuses into the producer.  relu-then-cast equals
    cast-then-relu for bf16 (monotone, sign-preserving), so the streamed
    residual is unchanged."""
    # consumers of the REWRITTEN nodes (rewrites #1/#2 moved edges, e.g.
    # the residual operand was appended to the conv's inputs)
    cons = graph.consumers(nodes)
    for n in graph.nodes:
        if n.op != "relu" or n.name in graph.outputs:
            continue
        users = cons.get(n.name, [])
        if not users or "__output__" in users:
            continue
        rewires = []  # (consumer name, input index)
        ok = True
        for uname in users:
            u = nodes[uname]
            idxs = [i for i, inp in enumerate(u.inputs) if inp == n.name]
            for i in idxs:
                if i == 0 and _quant_absorbs_relu(u):
                    rewires.append((uname, i, None))
                elif (i >= 1 and u.attrs.get("residual")
                        and u.attrs.get("pallas")):
                    rewires.append((uname, i, "residual_relu"))
                else:
                    ok = False
        if not ok or not rewires:
            continue
        src = nodes[n.name].inputs[0]
        for uname, i, flag in rewires:
            u = nodes[uname]
            ins = list(u.inputs)
            ins[i] = src
            attrs = u.attrs
            if flag:
                attrs[flag] = True
            nodes[uname] = dataclasses.replace(u, inputs=tuple(ins),
                                               attrs=attrs)
        # the relu node stays in the list (XLA dead-code-eliminates it)
