"""BatchNorm folding as a pure graph + params transform.

The reference mutates the module tree in place, walking children and folding
each BN into the absorbing conv that immediately precedes it
(src/models/fold_bn.py:14-34, 68-80).  Here the same semantics are a pure
rewrite: every ``bn`` node whose input is a ``conv`` with fan-out 1 is folded
into that conv (which gains a bias if it had none) and replaced by an
``identity`` node.  BNs that do not directly follow a conv (the 'pre'
block ordering, and SumFusion's bn_x/bn_skip branch norms) are left alone —
exactly what the reference's child-walk achieves.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from ..nnir import Graph, Node


def fold_bn(graph: Graph, variables) -> Tuple[Graph, Dict]:
    """Returns (folded_graph, folded_variables). Pure — inputs untouched.

    Folded math (src/models/fold_bn.py:14-34):
        std   = sqrt(running_var + eps)
        w'    = w * gamma / std          (per out-channel)
        beta  = bn_bias - gamma * mean / std
        b'    = gamma * b / std + beta   (beta if conv had no bias)
    """
    params = {k: dict(v) for k, v in variables["params"].items()}
    state = {k: dict(v) for k, v in variables.get("state", {}).items()}

    fanout: Dict[str, int] = {}
    for node in graph.nodes:
        for inp in node.inputs:
            fanout[inp] = fanout.get(inp, 0) + 1
    for out in graph.outputs:
        fanout[out] = fanout.get(out, 0) + 1

    index = {n.name: n for n in graph.nodes}
    new_nodes = []
    for node in graph.nodes:
        if node.op == "bn":
            prev = index[node.inputs[0]]
            if prev.op == "conv" and fanout.get(prev.name, 0) == 1:
                gamma = params[node.name]["scale"]
                beta_bn = params[node.name]["bias"]
                mean = state[node.name]["mean"]
                var = state[node.name]["var"]
                std = jnp.sqrt(var + node.attrs["eps"])
                cp = params[prev.name]
                cp["kernel"] = cp["kernel"] * (gamma / std)  # DHWIO: bcast on O
                beta = beta_bn - gamma * mean / std
                if "bias" in cp:
                    cp["bias"] = gamma * cp["bias"] / std + beta
                else:
                    cp["bias"] = beta
                del params[node.name]
                del state[node.name]
                # conv now carries a bias; fix the node attr on the (already
                # emitted) conv node copy
                for i, n in enumerate(new_nodes):
                    if n.name == prev.name:
                        attrs = dict(n.attrs)
                        attrs["bias"] = True
                        new_nodes[i] = dataclasses.replace(n, attrs=attrs)
                        break
                new_nodes.append(Node(node.name, "identity", node.inputs, {}))
                continue
        new_nodes.append(dataclasses.replace(node, attrs=dict(node.attrs)))

    return Graph(new_nodes, list(graph.outputs), graph.input_name), {
        "params": params, "state": state}
