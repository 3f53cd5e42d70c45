"""Torch checkpoint interop.

The reference trains/saves torch ``state_dict`` pickles
(src/utils/trainer.py:427-441).  Because our graph node names mirror the
torch module paths, conversion is mechanical:

- conv node ``X``  <->  ``X.weight`` (OIDHW<->DHWIO), ``X.bias``,
  ``X.alpha_w``, ``X.alpha_act``
- bn node ``X``    <->  ``X.weight`` (scale), ``X.bias``, ``X.running_mean``,
  ``X.running_var`` (+ ``num_batches_tracked``, ignored)

``load_torch_state_dict`` accepts either a path to a torch pickle or an
in-memory dict of numpy arrays / torch tensors, and loads non-strictly like
``model.load_state_dict(sd, strict=False)`` at src/ptq_seg.py:21.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..nnir import Graph


def _to_np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def load_torch_state_dict(graph: Graph, variables, state_dict: Mapping, strict=False):
    """Map a torch-style flat state dict into our {'params','state'} dicts.

    Returns new variables (pure; input untouched). Missing keys keep current
    values when ``strict`` is False.
    """
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    params = {k: dict(v) for k, v in variables["params"].items()}
    state = {k: dict(v) for k, v in variables.get("state", {}).items()}
    missing = []

    def take(key):
        if key in sd:
            return sd[key]
        missing.append(key)
        return None

    for node in graph.nodes:
        if node.op == "conv":
            w = take(f"{node.name}.weight")
            if w is not None:
                params[node.name]["kernel"] = jnp.asarray(
                    np.transpose(w, (2, 3, 4, 1, 0)).astype(np.float32))
            if "bias" in params[node.name]:
                b = take(f"{node.name}.bias")
                if b is not None:
                    params[node.name]["bias"] = jnp.asarray(b.astype(np.float32))
            for alpha in ("alpha_w", "alpha_act"):
                if alpha in params[node.name] and f"{node.name}.{alpha}" in sd:
                    a = np.asarray(sd[f"{node.name}.{alpha}"], np.float32)
                    # reference alphas are 0-d/1-element tensors; ours may
                    # be per-output-channel vectors (channel_wise)
                    params[node.name][alpha] = jnp.asarray(
                        a.reshape(()) if a.size == 1 else a)
            if f"{node.name}.act_k" in sd:
                # offset-activation-grid shift (run_ptq act_offset) — ours
                # only, absent from reference checkpoints
                params[node.name]["act_k"] = jnp.asarray(
                    np.asarray(sd[f"{node.name}.act_k"]).reshape(()),
                    jnp.int32)
        elif node.op == "bn":
            m = {"scale": "weight", "bias": "bias"}
            for ours, theirs in m.items():
                v = take(f"{node.name}.{theirs}")
                if v is not None:
                    params[node.name][ours] = jnp.asarray(v.astype(np.float32))
            for ours, theirs in (("mean", "running_mean"), ("var", "running_var")):
                v = take(f"{node.name}.{theirs}")
                if v is not None:
                    state[node.name][ours] = jnp.asarray(v.astype(np.float32))
    if strict and missing:
        raise KeyError(f"missing keys in state dict: {missing}")
    return {"params": params, "state": state}


def load_torch_checkpoint(graph: Graph, variables, path: str, strict=False):
    """Load a training checkpoint ({'state_dict': ...}) — torch-serialized
    (the reference's format) or a plain pickle (ours)."""
    try:
        import torch  # cpu-only torch is available in the image

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        import pickle

        with open(path, "rb") as f:
            ckpt = pickle.load(f)
    sd = ckpt.get("state_dict", ckpt)
    return load_torch_state_dict(graph, variables, sd, strict)


def read_export_qlvl_overrides(path: str):
    """The per-layer (qlvl_w, qlvl_act) map a PTQ export carries (written
    by the ptq mission as ``__qlvl_overrides__``) — needed to rebuild the
    serving graph when the export was produced with mixed precision.
    Returns {} for exports that predate the map (uniform-precision)."""
    sd = _read_export_state_dict(path)
    return dict(sd.get("__qlvl_overrides__", {}))


def _read_export_state_dict(path: str):
    import pickle

    if path.endswith(".npz"):
        return np.load(path, allow_pickle=True)["state_dict"].item()
    with open(path, "rb") as f:
        return pickle.load(f)["state_dict"]


def load_int8_checkpoint(graph: Graph, variables, path: str):
    """Load a PTQ int8-packed export (state_in_int8.pkl /
    state_in_int8_compress.npz) and restore FP-valued quantized weights,
    mirroring restore_fp_weight (src/models/PTQConv.py:144-152).

    ``graph`` must carry the grids the export was calibrated with — for a
    mixed-precision export, first rewrite it with
    ``apply_qlvl_overrides(graph, read_export_qlvl_overrides(path))``.
    A code outside [0, qlvl_w-1] means the grids disagree and raises
    rather than silently unpacking ~5x out of range."""
    from ..quant import unpack_int_weight

    sd = dict(_read_export_state_dict(path))
    overrides = dict(sd.pop("__qlvl_overrides__", {}))
    for node in graph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        key = f"{node.name}.weight"
        if not qcfg.q_weight or key not in sd:
            continue
        w = np.asarray(sd[key])
        if w.dtype in (np.uint8, np.int32):
            saved = overrides.get(node.name)
            if saved is not None and int(saved[0]) != qcfg.qlvl_w:
                raise ValueError(
                    f"{node.name}: export was packed at qlvl_w={saved[0]} "
                    f"but the graph expects {qcfg.qlvl_w} — rebuild the "
                    f"graph with apply_qlvl_overrides("
                    f"read_export_qlvl_overrides(path)) (mixed-precision "
                    f"export)")
            if int(w.max(initial=0)) > qcfg.qlvl_w - 1:
                raise ValueError(
                    f"{node.name}: packed code {int(w.max())} exceeds "
                    f"qlvl_w-1={qcfg.qlvl_w - 1} — the export was produced "
                    f"at a different grid than the graph's qcfg (check "
                    f"--qlvl_w/--mixed_qlvl flags vs the producing run)")
            alpha = np.asarray(sd[f"{node.name}.alpha_w"])
            sd[key] = unpack_int_weight(w, alpha, qcfg.qlvl_w)
    return load_torch_state_dict(graph, variables, sd)


def to_torch_state_dict(graph: Graph, variables) -> Dict[str, np.ndarray]:
    """Export our variables as a torch-style flat numpy state dict."""
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]
    state = variables.get("state", {})
    for node in graph.nodes:
        if node.op == "conv":
            p = params[node.name]
            out[f"{node.name}.weight"] = np.transpose(np.asarray(p["kernel"]),
                                                      (4, 3, 0, 1, 2))
            if "bias" in p:
                out[f"{node.name}.bias"] = np.asarray(p["bias"])
            for alpha in ("alpha_w", "alpha_act", "act_k"):
                if alpha in p:
                    out[f"{node.name}.{alpha}"] = np.asarray(p[alpha])
        elif node.op == "bn":
            p = params[node.name]
            s = state[node.name]
            out[f"{node.name}.weight"] = np.asarray(p["scale"])
            out[f"{node.name}.bias"] = np.asarray(p["bias"])
            out[f"{node.name}.running_mean"] = np.asarray(s["mean"])
            out[f"{node.name}.running_var"] = np.asarray(s["var"])
    return out
