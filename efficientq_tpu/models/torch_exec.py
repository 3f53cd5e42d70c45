"""Generic torch-CPU executor for our graph IR.

Runs any (inference-mode, FP) graph with torch ops on CPU — the reference's
substrate — from the same variables.  Used as the trusted full-model oracle
in tests (the reference's own verification pattern, solver.py:348-365) and
as the CPU baseline in bench.py.
"""
from __future__ import annotations

import numpy as np


def torch_reference_forward(graph, variables, x_ncdhw: np.ndarray):
    """x_ncdhw: numpy (N, C, D, H, W). Returns stacked torch heads
    (M, N, C, D, H, W)."""
    import torch
    import torch.nn.functional as F

    params = {k: {kk: torch.from_numpy(np.ascontiguousarray(vv))
                  for kk, vv in v.items()}
              for k, v in variables["params"].items()}
    state = {k: {kk: torch.from_numpy(np.ascontiguousarray(vv))
                 for kk, vv in v.items()}
             for k, v in variables.get("state", {}).items()}
    values = {graph.input_name: torch.from_numpy(x_ncdhw)}
    with torch.no_grad():
        for node in graph.nodes:
            if node.op == "input":
                continue
            ins = [values[n] for n in node.inputs]
            a = node.attrs
            if node.op == "conv":
                p = params[node.name]
                w = p["kernel"].permute(4, 3, 0, 1, 2).contiguous()
                values[node.name] = F.conv3d(
                    ins[0], w, p.get("bias"), a["stride"], a["padding"],
                    a["dilation"], a["groups"])
            elif node.op == "bn":
                p, s = params[node.name], state[node.name]
                values[node.name] = F.batch_norm(
                    ins[0], s["mean"], s["var"], p["scale"], p["bias"],
                    False, 0.1, a["eps"])
            elif node.op == "relu":
                values[node.name] = F.relu(ins[0])
            elif node.op == "maxpool":
                values[node.name] = F.max_pool3d(ins[0], a["kernel"],
                                                 a["stride"])
            elif node.op == "upsample":
                values[node.name] = F.interpolate(
                    ins[0], scale_factor=a["scale_factor"], mode="trilinear")
            elif node.op == "add":
                values[node.name] = ins[0] + ins[1]
            elif node.op in ("identity", "dropout"):
                values[node.name] = ins[0]
            else:
                raise ValueError(node.op)
        return torch.stack([values[n] for n in graph.outputs])
