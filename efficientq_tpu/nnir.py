"""A minimal functional graph IR for 3D segmentation networks.

Why an IR instead of a Module tree: everything the EfficientQ pipeline does to
a network — BN folding, per-layer PTQ calibration sweeps, swapping a conv for
a fused fake-quant Pallas kernel, activation capture — is a *graph transform*
or a *graph traversal*.  The reference does these with stateful nn.Module mode
flags and forward hooks (src/models/PTQConv.py:43-72, src/models/hooks.py,
src/models/fold_bn.py); here the network is data:

- ``Graph``: a topologically-ordered list of ``Node``s + output head names.
- params/state: flat dicts keyed by node name (pytrees, jit-friendly).
- ``apply``: interprets the graph; under ``jax.jit`` the interpretation cost
  is trace-time only and XLA fuses the whole network.

Node ops: input, conv, bn, relu, maxpool, upsample, dropout, add, identity.
Tensors are NDHWC; conv kernels DHWIO (see ops.py).

Node names mirror the reference's torch module paths (e.g.
``u_blocks.UResBlock1.Layer1.block1.conv``) so torch checkpoints map 1:1
(models/torch_io.py).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .quant import fake_quant_act, fake_quant_act_k, fake_quant_weight


@dataclasses.dataclass(frozen=True)
class QCfg:
    """Per-conv quantization config (mirrors PTQConv ctor args,
    src/models/PTQConv.py:12-23)."""

    q_weight: bool
    qlvl_w: int
    q_act: bool
    qlvl_act: int


@dataclasses.dataclass
class Node:
    name: str
    op: str
    inputs: Tuple[str, ...]
    attrs: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class Graph:
    nodes: List[Node]
    outputs: List[str]  # head node names, shallow-to-deep aux heads then final
    input_name: str = "input"

    _index: Optional[Dict[str, Node]] = None

    def node(self, name: str) -> Node:
        if self._index is None or len(self._index) != len(self.nodes):
            self._index = {n.name: n for n in self.nodes}
        return self._index[name]

    def conv_nodes(self) -> List[Node]:
        return [n for n in self.nodes if n.op == "conv"]

    def qconv_nodes(self) -> List[Node]:
        """Convs carrying a quantization config (the PTQ calibration targets),
        in topological (network) order — the order the reference calibrates
        them in its single 'quantizing' forward (src/ptqer.py:361-362)."""
        return [n for n in self.nodes if n.op == "conv" and n.attrs.get("qcfg")]

    def consumers(self, nodes: Optional[Dict[str, Node]] = None
                  ) -> Dict[str, List[str]]:
        """{producer name: [consumer names]}.  Graph outputs appear as the
        external consumer ``"__output__"``.  ``nodes`` optionally substitutes
        in-flight rewritten nodes (same names, possibly rewired inputs) so a
        rewrite pass can ask for consumers of its working set."""
        out: Dict[str, List[str]] = {}
        for n in self.nodes:
            for i in (nodes[n.name] if nodes is not None else n).inputs:
                out.setdefault(i, []).append(n.name)
        for o in self.outputs:
            out.setdefault(o, []).append("__output__")
        return out


# ---------------------------------------------------------------------------
# graph construction helpers
# ---------------------------------------------------------------------------


class GraphBuilder:
    def __init__(self):
        self.nodes: List[Node] = []
        self.names = set()

    def add(self, name: str, op: str, inputs: Sequence[str], **attrs) -> str:
        assert name not in self.names, f"duplicate node {name}"
        self.names.add(name)
        self.nodes.append(Node(name, op, tuple(inputs), attrs))
        return name

    def input(self, name="input"):
        return self.add(name, "input", ())

    def conv(self, name, x, in_ch, out_ch, kernel_size, stride=1, padding=0,
             dilation=1, groups=1, bias=True, qcfg: Optional[QCfg] = None):
        return self.add(name, "conv", [x], in_ch=in_ch, out_ch=out_ch,
                        kernel_size=ops.triple(kernel_size), stride=ops.triple(stride),
                        padding=ops.triple(padding), dilation=ops.triple(dilation),
                        groups=groups, bias=bias, qcfg=qcfg)

    def bn(self, name, x, ch, eps=1e-5, momentum=0.1):
        return self.add(name, "bn", [x], ch=ch, eps=eps, momentum=momentum)

    def relu(self, name, x):
        return self.add(name, "relu", [x])

    def maxpool(self, name, x, kernel, stride=None):
        return self.add(name, "maxpool", [x], kernel=ops.triple(kernel),
                        stride=ops.triple(stride if stride is not None else kernel))

    def upsample(self, name, x, scale_factor):
        return self.add(name, "upsample", [x], scale_factor=ops.triple(scale_factor))

    def dropout(self, name, x, rate):
        return self.add(name, "dropout", [x], rate=float(rate))

    def add_op(self, name, a, b):
        return self.add(name, "add", [a, b])

    def identity(self, name, x):
        return self.add(name, "identity", [x])

    def build(self, outputs: Sequence[str], input_name="input") -> Graph:
        return Graph(self.nodes, list(outputs), input_name)


# ---------------------------------------------------------------------------
# parameter init (mirrors utils/misc.py:87-103 weights_init: kaiming-normal
# conv weights, zero bias; BN scale=1, bias=0)
# ---------------------------------------------------------------------------


def _kaiming_normal(rng, shape_dhwio):
    kd, kh, kw, cin, cout = shape_dhwio
    fan_in = kd * kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return std * jax.random.normal(rng, shape_dhwio, dtype=jnp.float32)


def init(graph: Graph, rng: jax.Array):
    """Returns {'params': {...}, 'state': {...}} flat dicts keyed by node name."""
    params: Dict[str, Dict[str, jax.Array]] = {}
    state: Dict[str, Dict[str, jax.Array]] = {}
    for node in graph.nodes:
        if node.op == "conv":
            rng, sub = jax.random.split(rng)
            a = node.attrs
            kshape = (*a["kernel_size"], a["in_ch"] // a["groups"], a["out_ch"])
            p = {"kernel": _kaiming_normal(sub, kshape)}
            if a["bias"]:
                p["bias"] = jnp.zeros((a["out_ch"],), jnp.float32)
            if a.get("qcfg"):
                p["alpha_w"] = jnp.float32(1.0)
                p["alpha_act"] = jnp.float32(1.0)
            params[node.name] = p
        elif node.op == "bn":
            ch = node.attrs["ch"]
            params[node.name] = {
                "scale": jnp.ones((ch,), jnp.float32),
                "bias": jnp.zeros((ch,), jnp.float32),
            }
            state[node.name] = {
                "mean": jnp.zeros((ch,), jnp.float32),
                "var": jnp.ones((ch,), jnp.float32),
            }
    return {"params": params, "state": state}


# ---------------------------------------------------------------------------
# interpretation
# ---------------------------------------------------------------------------


def _pallas_1x1_eligible(a) -> bool:
    return (a["kernel_size"] == (1, 1, 1) and a["stride"] == (1, 1, 1)
            and a["padding"] == (0, 0, 0) and a["groups"] == 1)


def _pallas_3x3_int8_eligible(a) -> bool:
    """Interior 3^3 qconvs: stride 1, isotropic 'same' padding = dilation."""
    return (a["kernel_size"] == (3, 3, 3) and a["stride"] == (1, 1, 1)
            and a["padding"] == a["dilation"] and len(set(a["dilation"])) == 1
            and a["groups"] == 1)


def _eval_conv(node: Node, params: Dict[str, Any], ins, mode: str, precision,
               compute_dtype=None):
    a = node.attrs
    p = params[node.name]
    x = ins[0]
    qcfg: Optional[QCfg] = a.get("qcfg")
    if (a.get("pallas") and mode in ("quantized", "fq") and qcfg is not None
            and qcfg.q_act):
        # product inference hot path: act-quant prologue fused into the
        # conv/matmul in one Pallas kernel (pallas/), instead of a separate
        # HBM round-trip.  Flags set by pallas.to_pallas_inference, which
        # guarantees geometry eligibility.
        from .pallas.qconv3d import qconv3x3_int8_ndhwc
        from .pallas.qmatmul import fused_int8_matmul, qconv1x1_ndhwc

        interpret = jax.default_backend() != "tpu"
        n, d, h, w_sp, c = x.shape
        if a.get("int8") and a["kernel_size"] == (3, 3, 3):
            # with a low-precision compute_dtype requested, emit the conv
            # output in that dtype (halves the write + downstream read; the
            # downstream act-quant re-rounds anyway).  None -> f32, the
            # bit-exact deployment default.  Fused epilogues (residual add,
            # next-layer act-quant) come from pallas/epilogue.py.
            quant_for = a.get("epilogue_quant_for")
            res = ins[1] if a.get("residual") else None
            if res is not None and compute_dtype is not None:
                # low-precision serving: stream the residual at
                # compute_dtype — halves its VMEM footprint (which is what
                # lets the 64^3 stages keep the add in-kernel instead of
                # falling back to an XLA pass) and matches the precision of
                # the XLA fallback add, which also runs at compute_dtype
                res = res.astype(compute_dtype)
            return qconv3x3_int8_ndhwc(
                x, p["kernel_int8"], p.get("bias"), p["alpha_act"],
                p["scale"], qcfg.qlvl_act, dilation=a["dilation"][0],
                interpret=interpret,
                out_dtype=compute_dtype or jnp.float32,
                residual=res,
                quant_alpha=(params[quant_for]["alpha_act"]
                             if quant_for else None),
                quant_qlvl=a.get("epilogue_qlvl", 0) if quant_for else 0,
                x_quantized=bool(a.get("input_quantized")),
                residual_relu=bool(a.get("residual_relu")),
                # dual output (y, maxpool2(y)); consumers are tuple_get
                # nodes (pallas/epilogue.py::_fuse_pools)
                pool=bool(a.get("epilogue_pool")),
                # ring-accumulator A/B override for profiling (EFFQ_RING=
                # off|auto|force|ring1|taps — see qconv3x3_int8_ndhwc
                # docstring); default 'auto' engages where the kd-packed
                # dot reduces padded MXU work, multi-plane (TZ) where
                # depth/VMEM allow — bit-exact in every case
                ring=os.environ.get("EFFQ_RING", "auto"))
        if a.get("int8"):
            y = fused_int8_matmul(
                x.reshape(-1, c), p["kernel_int8"].reshape(c, -1),
                p.get("bias"), p["alpha_act"], p["scale"], qcfg.qlvl_act,
                interpret=interpret)
            return y.reshape(n, d, h, w_sp, -1)
        kernel = p["kernel"]
        if mode == "fq" and qcfg.q_weight:
            kernel = fake_quant_weight(kernel, p["alpha_w"], qcfg.qlvl_w)
        return qconv1x1_ndhwc(x, kernel, p.get("bias"), p["alpha_act"],
                              qcfg.qlvl_act, interpret=interpret)
    if a.get("int8") and mode in ("quantized", "fq"):
        # true integer path (ptq/deploy.py): quantize acts to int8 codes,
        # int8 x int8 conv with int32 accumulation, f32 scale epilogue —
        # bit-exact with the fake-quant computation
        if a.get("input_quantized"):
            qa = x  # producer emitted this conv's codes (pallas/epilogue.py)
        elif a.get("act_k"):
            # offset activation grid (quant.fake_quant_act_k): signed codes
            # in [-k, n-1-k]; zero stays on the grid, so the conv's zero
            # padding and the scale epilogue are unchanged
            ak = a["act_k"]
            qa = jnp.clip(jnp.round(x / p["alpha_act"]
                                    * (qcfg.qlvl_act - 1)),
                          -ak, qcfg.qlvl_act - 1 - ak).astype(jnp.int8)
        else:
            qa = jnp.round(jnp.clip(x / p["alpha_act"], 0.0, 1.0)
                           * (qcfg.qlvl_act - 1)).astype(jnp.int8)
        y = ops.conv3d(qa, p["kernel_int8"], None, a["stride"], a["padding"],
                       a["dilation"], a["groups"],
                       preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * p["scale"]
        if "bias" in p:
            y = y + p["bias"]
        return y
    kernel = p["kernel"]
    bias = p.get("bias")
    if qcfg is not None and mode in ("quantized", "fq"):
        if qcfg.q_act:
            # offset grid chosen at calibration (run_ptq act_offset):
            # static attr (deploy/QAT bake it) or calibrated param
            ak = a.get("act_k", p.get("act_k"))
            if ak is None:
                x = fake_quant_act(x, p["alpha_act"], qcfg.qlvl_act)
            else:
                x = fake_quant_act_k(x, p["alpha_act"], qcfg.qlvl_act, ak)
        if mode == "fq" and qcfg.q_weight:
            # emulate quantization without a PTQ pass (weights quantized on
            # the fly); after PTQ the stored kernel already holds quantized
            # values and mode='quantized' uses it as-is
            # (src/models/PTQConv.py:163-167).
            kernel = fake_quant_weight(kernel, p["alpha_w"], qcfg.qlvl_w)
    if compute_dtype is not None:
        # low-precision inference: cast operands (quantization error dwarfs
        # bf16 rounding of the grid values) and EMIT at compute_dtype — a
        # channel-minor f32 write at the 64^3 stages is a tile-padded ~1 GB
        # pass; every downstream consumer (act-quant, adds, pools) re-rounds
        # or tolerates bf16 anyway.  apply() casts the head outputs back to
        # f32 at the output boundary.  The conv emits compute_dtype NATIVELY
        # (the MXU still accumulates bf16 operands in f32 and rounds once):
        # the earlier preferred_element_type=f32 + astype form left XLA
        # materializing the f32 conv output in HBM — the 2026-08-18 per-op
        # profile showed the stem fusion writing f32[8,64^3,32] (1 GB
        # tile-padded) with the bf16 convert duplicated into the consumers.
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        y = ops.conv3d(x, kernel, None, a["stride"], a["padding"],
                       a["dilation"], a["groups"], precision=precision)
        if bias is not None:
            y = y + bias.astype(compute_dtype)
        return y
    y = ops.conv3d(x, kernel, None, a["stride"], a["padding"],
                   a["dilation"], a["groups"], precision=precision)
    if bias is not None:
        y = y + bias
    return y


def eval_node(node: Node, params: Dict[str, Any], state: Dict[str, Any],
              ins, *, mode: str = "fp", precision=None, compute_dtype=None):
    """Evaluate a single (inference-mode) node. Used by both the jitted
    whole-graph ``apply`` and the eager PTQ calibration sweep."""
    if node.op == "conv":
        return _eval_conv(node, params, ins, mode, precision, compute_dtype)
    if node.op == "bn":
        p = params[node.name]
        s = state[node.name]
        return ops.batch_norm(ins[0], p["scale"], p["bias"], s["mean"],
                              s["var"], node.attrs["eps"])
    if node.op == "relu":
        return ops.relu(ins[0])
    if node.op == "maxpool":
        return ops.max_pool3d(ins[0], node.attrs["kernel"], node.attrs["stride"])
    if node.op == "upsample":
        return ops.upsample3d(ins[0], node.attrs["scale_factor"])
    if node.op == "conv_cf":
        # Serving-only channels-first head (ptq/deploy.py::channels_first_tail):
        # the 1x1 classifier emits NCDHW so every downstream pass (trilinear
        # up, stitch, pred merge) runs with a spatial dim on the vector lanes.
        # A C=3-minor f32 tensor tiles at ~42x its logical bytes on TPU; the
        # profiled head+stitch tail cost ~9 ms of the 42.6 ms serving graph.
        p = params[node.name]
        a = node.attrs
        x = ins[0]
        qcfg: Optional[QCfg] = a.get("qcfg")
        kernel = p["kernel"]
        if qcfg is not None and mode in ("quantized", "fq"):
            if qcfg.q_act:
                ak = a.get("act_k", p.get("act_k"))
                if ak is None:
                    x = fake_quant_act(x, p["alpha_act"], qcfg.qlvl_act)
                else:
                    x = fake_quant_act_k(x, p["alpha_act"], qcfg.qlvl_act,
                                         ak)
            if mode == "fq" and qcfg.q_weight:
                kernel = fake_quant_weight(kernel, p["alpha_w"], qcfg.qlvl_w)
        if compute_dtype is not None:
            # emit at compute_dtype natively (MXU f32 accumulation, one
            # rounding) — same rationale as _eval_conv: preferred f32 +
            # astype leaves XLA materializing the f32 head tensor
            x = x.astype(compute_dtype)
            kernel = kernel.astype(compute_dtype)
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NCDHW"))
            if "bias" in p:
                y = y + p["bias"].reshape(1, -1, 1, 1, 1).astype(
                    compute_dtype)
            return y
        # 1x1 conv with an NCDHW output spec (CPU's dot thunk can't take
        # bf16 operands with f32 accumulation; the conv thunk can)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NCDHW"),
            preferred_element_type=jnp.float32)
        if "bias" in p:
            y = y + p["bias"].reshape(1, -1, 1, 1, 1)
        return y
    if node.op == "upsample_cf":
        return ops.upsample3d_cf(ins[0], node.attrs["scale_factor"])
    if node.op == "stem_s2d":
        # serving-only fused space-to-depth stem (pallas/stem.py, rewritten
        # by ptq/deploy.py::s2d_stem_serving).  Input is the
        # (s2d patches, parities) pair from pallas.stem.extract_s2d_patches;
        # returns (bf16 relu'd activation, consumer's int8 codes).
        from .pallas.stem import stem_s2d_conv

        xs, par = ins[0]
        p = params[node.name]
        return stem_s2d_conv(
            xs, par, p["w_even"], p["w_odd"], p["bias"], p["alpha_next"],
            node.attrs["qlvl_next"],
            interpret=jax.default_backend() != "tpu",
            out_dtype=compute_dtype or jnp.float32,
            # EFFQ_STEM_RING=off|auto|force — A/B hook, same spirit as
            # EFFQ_RING (default 'auto': ring where the z-tiled kernel
            # would be read-amplified at tz=1 and VMEM fits)
            ring=os.environ.get("EFFQ_STEM_RING", "auto"))
    if node.op == "tuple_get":
        return ins[0][node.attrs["idx"]]
    if node.op == "dropout":
        return ins[0]
    if node.op == "add":
        return ins[0] + ins[1]
    if node.op == "identity":
        return ins[0]
    raise ValueError(f"unknown op {node.op}")


def _eval_train_node(node: Node, i: int, params, st, ins, *, train, rng,
                     mode, precision, compute_dtype):
    """One node under either engine (plain ``apply`` or the remat one):
    returns (output, bn-state update or None).  ``i`` is the node's global
    topo index — the dropout RNG folds it in, so segment boundaries cannot
    change the per-node random streams."""
    if (train and node.op == "conv" and compute_dtype is not None
            and mode == "fp"):
        # mixed-precision training path: plain low-precision conv (the MXU
        # accumulates bf16 operands in f32 internally and rounds once — the
        # same value as the serving branch's preferred_element_type=f32 +
        # astype, but differentiable: the serving form's transpose would
        # pair an f32 cotangent with a bf16 kernel, which
        # lax.conv_general_dilated rejects).  FP training only: QAT
        # (train + mode='fq') falls through to eval_node, whose fake-quant
        # ops are STE-differentiable (quant.discretize) and whose grid
        # arithmetic must stay f32 — a bf16 round flips 2-bit codes.
        p = params[node.name]
        a = node.attrs
        x = ins[0].astype(compute_dtype)
        k = p["kernel"].astype(compute_dtype)
        y = ops.conv3d(x, k, None, a["stride"], a["padding"], a["dilation"],
                       a["groups"], precision=precision)
        if "bias" in p:
            y = y + p["bias"].astype(compute_dtype)
        return y, None
    if train and node.op == "bn":
        p = params[node.name]
        s = st[node.name]
        x = ins[0]
        if compute_dtype is not None:
            # mixed-precision training: batch statistics and the running-
            # stat EMA accumulate in f32 (a bf16 mean over 128^3 voxels
            # loses ~3 decimal digits and the running estimates drift);
            # the normalized output is re-emitted at compute_dtype so the
            # activation write stays half-width.
            x = x.astype(jnp.float32)
        out, m, v = ops.batch_norm_train(
            x, p["scale"], p["bias"], s["mean"], s["var"],
            node.attrs["momentum"], node.attrs["eps"])
        if compute_dtype is not None:
            out = out.astype(compute_dtype)
        return out, {"mean": m, "var": v}
    if train and node.op == "dropout" and node.attrs["rate"] > 0:
        assert rng is not None, "dropout needs rng in train mode"
        return ops.dropout3d(ins[0], node.attrs["rate"],
                             jax.random.fold_in(rng, i)), None
    return eval_node(node, params, st, ins, mode=mode, precision=precision,
                     compute_dtype=compute_dtype), None


def _apply_remat(graph: Graph, variables, x, *, train, rng, mode, precision,
                 compute_dtype, remat: int):
    """Segmented interpretation for ``apply(..., remat=N)``.

    The topo-ordered node list is chunked into consecutive N-node segments;
    each runs inside ``jax.checkpoint``, taking only its boundary values
    (plus its own params/state slices) and returning only the values later
    segments or the heads consume.  Under ``jax.grad`` XLA keeps just those
    boundaries and re-runs a segment's forward during its backward."""
    params = variables["params"]
    st = variables.get("state", {})

    indexed = [(i, n) for i, n in enumerate(graph.nodes) if n.op != "input"]
    segments = [indexed[k:k + remat] for k in range(0, len(indexed), remat)]

    # producer -> segment index (graph input = -1)
    seg_of = {graph.input_name: -1}
    for si, seg in enumerate(segments):
        for _, n in seg:
            seg_of[n.name] = si
    # per-segment boundary sets, in deterministic (first-use) order
    seg_in: List[List[str]] = [[] for _ in segments]
    seg_out: List[List[str]] = [[] for _ in segments]
    for si, seg in enumerate(segments):
        for _, n in seg:
            for src in n.inputs:
                if seg_of[src] < si and src not in seg_in[si]:
                    seg_in[si].append(src)
                    if seg_of[src] >= 0 and src not in seg_out[seg_of[src]]:
                        seg_out[seg_of[src]].append(src)
    for o in graph.outputs:
        if o not in seg_out[seg_of[o]]:
            seg_out[seg_of[o]].append(o)

    def make_seg(si):
        seg, in_names, out_names = segments[si], seg_in[si], seg_out[si]
        p_sub = {n.name: params[n.name] for _, n in seg if n.name in params}
        s_sub = {n.name: st[n.name] for _, n in seg if n.name in st}

        def seg_fn(p_sub, s_sub, boundary, rng):
            vals = dict(zip(in_names, boundary))
            new_state = {}
            for i, node in seg:
                ins = [vals[n] for n in node.inputs]
                out, ns = _eval_train_node(
                    node, i, p_sub, s_sub, ins, train=train, rng=rng,
                    mode=mode, precision=precision,
                    compute_dtype=compute_dtype)
                if ns is not None:
                    new_state[node.name] = ns
                vals[node.name] = out
            return tuple(vals[n] for n in out_names), new_state

        return jax.checkpoint(seg_fn), p_sub, s_sub, in_names, out_names

    env = {graph.input_name: x}
    new_state_all: Dict[str, Any] = {}
    for si in range(len(segments)):
        fn, p_sub, s_sub, in_names, out_names = make_seg(si)
        outs, ns = fn(p_sub, s_sub, tuple(env[n] for n in in_names), rng)
        env.update(zip(out_names, outs))
        new_state_all.update(ns)
        # drop values no later segment (nor the heads) will read, so the
        # outer trace doesn't keep them alive past their last use
        needed = set(graph.outputs)
        for sj in range(si + 1, len(segments)):
            needed.update(seg_in[sj])
        for k in list(env):
            if k not in needed:
                del env[k]

    outs = [env[n] for n in graph.outputs]
    if compute_dtype is not None:
        outs = [o.astype(jnp.float32) for o in outs]
    out = jnp.stack(outs, axis=0)
    if train:
        return out, new_state_all
    return out


def apply(
    graph: Graph,
    variables: Dict[str, Any],
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    mode: str = "fp",
    precision=None,
    compute_dtype=None,
    capture: Optional[Sequence[str]] = None,
    remat: int = 0,
    keep_head_dtype: bool = False,
):
    """Interpret the graph on input ``x`` (NDHWC).

    mode: 'fp' (plain convs), 'quantized' (fake-quant activations, stored
    quantized weights), 'fq' (fake-quant both on the fly).

    Returns stacked head outputs of shape (num_heads, N, D, H, W, C).
    With ``train=True`` returns (out, new_state); with ``capture`` (a list of
    node names) returns (out, {name: node_output}).

    remat > 0 executes the graph in consecutive ``remat``-node segments,
    each under ``jax.checkpoint``: the backward pass recomputes a segment's
    interior activations from its boundary values instead of keeping every
    intermediate alive — O(boundaries) training memory for one extra
    forward of FLOPs (the standard TPU HBM/FLOPs trade; the reference has
    no analogue — torch keeps the full autograd tape).  Numerics are
    IDENTICAL to remat=0 (same ops, same per-node RNG streams); ignored
    under ``capture`` (the PTQ sweep holds activations on purpose).
    """
    assert mode in ("fp", "quantized", "fq")
    if remat < 0:
        raise ValueError(f"remat must be >= 0 (nodes per checkpoint "
                         f"segment), got {remat}")
    if remat and capture is None:
        return _apply_remat(graph, variables, x, train=train, rng=rng,
                            mode=mode, precision=precision,
                            compute_dtype=compute_dtype, remat=int(remat))
    params = variables["params"]
    st = variables.get("state", {})
    new_state: Dict[str, Any] = {}
    values: Dict[str, jax.Array] = {graph.input_name: x}
    captured: Dict[str, Tuple[jax.Array, jax.Array]] = {}

    for i, node in enumerate(graph.nodes):
        if node.op == "input":
            continue
        ins = [values[n] for n in node.inputs]
        out, ns = _eval_train_node(node, i, params, st, ins, train=train,
                                   rng=rng, mode=mode, precision=precision,
                                   compute_dtype=compute_dtype)
        if ns is not None:
            new_state[node.name] = ns
        values[node.name] = out
        if capture and node.name in capture:
            # outputs only: the PTQ sweep recomputes each layer's input from
            # the quantized prefix, so capturing inputs would double the
            # held activation memory for nothing
            captured[node.name] = out

    outs = [values[n] for n in graph.outputs]
    if compute_dtype is not None and not keep_head_dtype:
        # external contract: head outputs are f32 regardless of the
        # internal compute precision (tests/test_compute_dtype.py).
        # keep_head_dtype=True opts out for hard-prediction serving: the
        # downstream stitch/argmax/sign-test tail then runs at
        # compute_dtype, halving the full-volume canvas traffic
        outs = [o.astype(jnp.float32) for o in outs]
    out = jnp.stack(outs, axis=0)
    if capture is not None:
        return out, captured
    if train:
        return out, new_state
    return out
