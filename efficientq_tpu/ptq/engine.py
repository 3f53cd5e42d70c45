"""PTQ engine: the layer-wise calibration sweep.

The reference performs calibration as a side effect of one forward pass with
every conv flipped to a 'quantizing' mode flag (src/ptqer.py:282-387,
src/models/PTQConv.py:157-162).  Here the same dataflow is explicit:

1. fold BN (pure graph transform)
2. one captured FP forward collects every qconv's FP output (the per-layer
   regression target, replacing forward hooks src/models/hooks.py:5-10)
3. attention weight map + mask pyramid from the FP prediction
4. an eager sweep over the node list: at each qconv, the *current* input
   (already carrying quantization error from preceding layers) is
   fake-quantized, the layer is calibrated by ADMM (admm.py), and its
   quantized output feeds the next node — exactly the error-propagation
   semantics of the reference's single quantizing forward

Each per-layer calibration is one jitted XLA computation (cached per shape
signature), so the sweep runs at device speed with trace cost only on the
first occurrence of each layer geometry.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import nnir, ops
from ..nnir import Graph
from ..quant import project_by_iter
from .admm import PTQHyperParams, calibrate_layer
from .attention import attention_weight_map, mask_pyramid, match_pyramid_level
from .fold_bn import fold_bn

HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class PTQReport:
    layer_losses: List[Tuple[str, float]]
    class_voxel_nums: List[int]
    fp_forward_seconds: float
    calibration_seconds: float
    output_fp: jnp.ndarray
    output_q: jnp.ndarray
    # per-layer ADMM trajectories {layer: {loss,primal_residual,
    # dual_residual,rho: (admm_iter,)}} — the reference's loss_history /
    # plot_save observability (EfficientQConv.py:122-127, ptqer.py:275-279)
    layer_histories: Dict[str, Dict[str, "jnp.ndarray"]] = dataclasses.field(
        default_factory=dict)
    # scale-free per-layer sensitivities (reported loss / target energy),
    # comparable across layers — the mixed-precision ranking signal
    layer_rel_losses: List[Tuple[str, float]] = dataclasses.field(
        default_factory=list)
    # layers recalibrated at the high grid by run_ptq_mixed
    mixed_upgraded: List[str] = dataclasses.field(default_factory=list)

    def layer_loss_lines(self) -> List[str]:
        """layer_loss.txt formatting (src/ptqer.py:369-370,
        EfficientQConv.py:166)."""
        return [f"{name:45s}:{loss}" for name, loss in self.layer_losses]

    def time_cost_line(self) -> str:
        total = self.fp_forward_seconds + self.calibration_seconds
        return f"{total / 60:.3f} min."


_VALUE_PRESERVING = ("identity", "dropout")  # dropout is identity in eval


def block_calibration_targets(graph: Graph) -> Dict[str, Tuple[str, str]]:
    """Block-granularity calibration map: {conv_name: (add_name,
    residual_name)} for every qconv whose output reaches a two-operand
    residual add through value-preserving glue, with the residual operand
    produced BEFORE the conv.

    The reference scaffolds block-level PTQ (src/models/PTQBlock.py:6-68)
    but leaves `ptq` NotImplementedError and never instantiates the class.
    Here the idea is realized with the existing per-layer machinery: since
    the residual add is LINEAR, minimizing the block output error

        || add_fp - (conv(x_q) + residual_q) ||^2

    over the conv's quantized weights is the SAME quadratic problem as the
    layer-wise one with the regression target shifted to
    ``add_fp - residual_q`` — so the exit conv of each ResBlock can absorb
    the quantization error of everything inside the block (entry relu +
    first conv), BRECQ-style, at zero extra solver cost.

    Eligibility requires every hop conv -> add to be single-consumer and
    value-preserving (mid/pre block orderings after fold_bn; 'post' blocks
    have a relu between conv and add and fall back to layer-wise).
    """
    cons = graph.consumers()
    nodes = {n.name: n for n in graph.nodes}
    order = {n.name: i for i, n in enumerate(graph.nodes)}

    out: Dict[str, Tuple[str, str]] = {}
    for node in graph.qconv_nodes():
        if not node.attrs["qcfg"].q_weight:
            continue
        cur = node.name
        for _ in range(4):
            cs = cons.get(cur, [])
            if len(cs) != 1 or cs[0] == "__output__":
                break
            nxt = nodes[cs[0]]
            if nxt.op in _VALUE_PRESERVING:
                cur = nxt.name
                continue
            if nxt.op == "add" and len(nxt.inputs) == 2 and cur in nxt.inputs:
                other = [i for i in nxt.inputs if i != cur]
                if len(other) == 1 and order.get(other[0], 1 << 30) \
                        < order[node.name]:
                    out[node.name] = (nxt.name, other[0])
            break
    return out


def tail_sensitive_convs(graph: Graph, k: int = 2) -> List[str]:
    """The final-stage weight-quantized convs (the last ResBlock's, on both
    presets): the cascade-trigger set of the W2A2 bimodal basin.

    The basin probe (scripts/basin_probe.py, docs/quantization.md) showed
    every calibration draw's prefix-quantization dice collapses at the LAST
    decoder block's entry conv — its local reconstruction loss is small
    (the layer is narrow and its target energy low) so the rel-loss ranking
    underrates it, but its output feeds the classifier with no downstream
    conv left to absorb the error.  This is the same structural fact behind
    the reference's own q_first/q_last heuristic (src/definer.py:167-176:
    first/last conv kept high-precision unconditionally), extended one
    block inward.

    Returns the last ``k`` qconvs in topological order that do NOT reach a
    graph output without crossing another weight-quantized conv (which
    excludes the classifier heads — q_last already covers those).
    """
    cons = graph.consumers()
    nodes = {n.name: n for n in graph.nodes}

    def reaches_output_sans_qconv(name):
        seen, stack = set(), [name]
        while stack:
            for c in cons.get(stack.pop(), []):
                if c == "__output__":
                    return True
                nd = nodes[c]
                if (nd.op == "conv" and nd.attrs.get("qcfg") is not None
                        and nd.attrs["qcfg"].q_weight):
                    continue
                if c not in seen:
                    seen.add(c)
                    stack.append(c)
        return False

    body = [n.name for n in graph.qconv_nodes()
            if n.attrs["qcfg"].q_weight
            and not reaches_output_sans_qconv(n.name)]
    return body[-k:]


def _layer_kw(node, qcfg, p, hp, act_search: int = 0):
    """The static calibrate_layer kwargs for one qconv — shared by the
    sweep and the AOT precompiler so their program signatures agree."""
    return dict(ksize=node.attrs["kernel_size"], stride=node.attrs["stride"],
                padding=node.attrs["padding"],
                dilation=node.attrs["dilation"], qlvl_w=qcfg.qlvl_w,
                has_bias="bias" in p, hp=hp,
                qlvl_act=qcfg.qlvl_act if qcfg.q_act else None,
                act_search=act_search)


def _precompile_layer_programs(graph, params, state, calib_x, captured,
                               pyramid, hp, verbose, act_search_for=None):
    """AOT-compile every distinct per-layer calibration program in a
    thread pool.  Returns {node_name: compiled}.  Shapes come from the FP
    capture (quantization is shape-preserving), so no device work happens
    here beyond the compiles themselves."""
    from concurrent.futures import ThreadPoolExecutor

    sds = jax.ShapeDtypeStruct
    shapes = {graph.input_name: sds(calib_x.shape, calib_x.dtype)}
    for name, v in captured.items():
        shapes[name] = sds(v.shape, v.dtype)
    # predecessors of qconvs that are not themselves captured: infer the
    # whole graph's shapes abstractly in one pass
    need = {src for n in graph.qconv_nodes() for src in n.inputs}
    missing = [n for n in need if n not in shapes]
    if missing:
        abstract = jax.eval_shape(
            lambda x: nnir.apply(graph, {"params": params, "state": state},
                                 x, mode="fp", capture=missing)[1],
            sds(calib_x.shape, calib_x.dtype))
        shapes.update(abstract)

    jobs = {}
    sig_to_nodes = {}
    for node in graph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        p = params[node.name]
        if not qcfg.q_weight or node.inputs[0] not in shapes:
            continue
        x_sd = shapes[node.inputs[0]]
        y_sd = shapes[node.name]
        att = match_pyramid_level(pyramid, y_sd.shape)
        kw = _layer_kw(node, qcfg, p, hp,
                       act_search=(act_search_for(node.name)
                                   if act_search_for else 0))
        sig = (x_sd.shape, y_sd.shape,
               None if att is None else tuple(att.shape),
               tuple(p["kernel"].shape), "bias" in p,
               tuple(sorted((k, str(v)) for k, v in kw.items())))
        sig_to_nodes.setdefault(sig, []).append(node.name)
        if sig not in jobs:
            k_sd = sds(p["kernel"].shape, p["kernel"].dtype)
            b_sd = (sds(p["bias"].shape, p["bias"].dtype)
                    if "bias" in p else None)
            a_sd = None if att is None else sds(att.shape, att.dtype)
            jobs[sig] = (x_sd, y_sd, k_sd, b_sd, a_sd, kw)

    def compile_one(item):
        sig, (x_sd, y_sd, k_sd, b_sd, a_sd, kw) = item
        try:
            return sig, calibrate_layer.lower(
                x_sd, y_sd, k_sd, b_sd, a_sd, **kw).compile()
        except Exception as e:  # pragma: no cover — fall back to jit path
            if verbose:
                print(f"precompile failed for {sig_to_nodes[sig][0]}: {e}")
            return sig, None

    compiled = {}
    with ThreadPoolExecutor(max_workers=8) as pool:
        for sig, ex in pool.map(compile_one, jobs.items()):
            if ex is not None:
                for name in sig_to_nodes[sig]:
                    compiled[name] = ex
    return compiled


def apply_qlvl_overrides(graph: Graph,
                         qlvl_overrides: Dict[str, Tuple[int, int]]) -> Graph:
    """Pure rewrite: per-layer (qlvl_w, qlvl_act) grid overrides — the
    mixed-precision mechanism (run_ptq_mixed).  The returned graph carries
    the overridden qcfgs, so deployment (ptq/deploy.py) packs and fuses
    each layer at its own grid, and PTQ exports reload on the right grids
    (missions write the map as ``__qlvl_overrides__``;
    torch_io.load_int8_checkpoint consumes it)."""
    unknown = set(qlvl_overrides) - {n.name for n in graph.nodes}
    if unknown:
        raise ValueError(f"qlvl_overrides for unknown nodes: {unknown}")
    new_nodes = []
    for n in graph.nodes:
        if n.name in qlvl_overrides and n.attrs.get("qcfg") is not None:
            attrs = dict(n.attrs)
            qw, qa = qlvl_overrides[n.name]
            attrs["qcfg"] = dataclasses.replace(
                attrs["qcfg"], qlvl_w=int(qw), qlvl_act=int(qa))
            n = dataclasses.replace(n, attrs=attrs)
        new_nodes.append(n)
    return dataclasses.replace(graph, nodes=new_nodes, _index=None)


def run_ptq(
    graph: Graph,
    variables,
    calib_x: jnp.ndarray,
    *,
    task: str,
    init_stride,
    hp: PTQHyperParams = PTQHyperParams(),
    att_style: str = "p:0.5",
    num_mask_lvls: int = 5,
    fold: bool = True,
    verbose: bool = False,
    mesh=None,
    granularity: str = "layer",
    qlvl_overrides: Dict[str, Tuple[int, int]] = None,
    block_target: str = "quantized",
    act_offset: int = 0,
    act_offset_convs=None,
):
    """Calibrate every qconv of ``graph`` on one NDHWC calibration batch.

    Returns (folded_graph, quantized_variables, PTQReport).  After this,
    ``nnir.apply(folded_graph, qvars, x, mode='quantized')`` runs quantized
    inference (stored kernels hold quantized values; activations are
    fake-quantized on the fly by alpha_act).

    With ``mesh`` (a jax.sharding.Mesh) the Gram accumulation of every
    weight-quantized layer is sharded across the mesh's devices
    (parallel/ptq.py::calibrate_layer_sharded): no device materializes more
    than its output-depth slab of the im2col, and one psum merges the
    statistics over ICI.

    ``granularity='block'`` calibrates each ResBlock's exit conv against
    the block's FP output instead of its own (block_calibration_targets):
    the residual structure turns block-level reconstruction into the same
    per-layer quadratic with a shifted target, so the exit conv absorbs
    the in-block quantization error.  Ineligible convs fall back to
    layer-wise.

    ``act_offset=K`` searches offset (signed-asymmetric) activation grids
    per layer — k of the qlvl_act levels shifted below zero, k in 0..K,
    picked by input reconstruction error (quant.fake_quant_act_k; the
    chosen k is stored as params[...]['act_k'] and flows through fq
    forward, int8 deployment and exports).  ``act_offset_convs`` limits
    the search to the named convs (None = every q_act conv).
    """
    if granularity not in ("layer", "block"):
        raise ValueError(f"granularity must be 'layer' or 'block', "
                         f"got {granularity!r}")
    if block_target not in ("quantized", "fp"):
        raise ValueError(f"block_target must be 'quantized' or 'fp', "
                         f"got {block_target!r}")
    if fold:
        graph, variables = fold_bn(graph, variables)
    if qlvl_overrides:
        graph = apply_qlvl_overrides(graph, qlvl_overrides)
    params = {k: dict(v) for k, v in variables["params"].items()}
    state = variables.get("state", {})

    block_targets = (block_calibration_targets(graph)
                     if granularity == "block" else {})
    qnodes = graph.qconv_nodes()
    capture = [n.name for n in qnodes]
    capture += sorted({a for a, _ in block_targets.values()
                       if a not in capture})
    if block_target == "fp":
        # the FP value of each residual stream (see target choice below)
        capture += sorted({r for _, r in block_targets.values()
                           if r not in capture})

    t0 = time.time()

    @jax.jit
    def _captured_forward(variables, x):
        return nnir.apply(graph, variables, x, mode="fp", precision=HI,
                          capture=capture)

    out_fp, captured = _captured_forward({"params": params, "state": state},
                                         calib_x)
    out_fp = jax.block_until_ready(out_fp)
    t1 = time.time()

    # body mask: BraTS = nonzero voxels of modality 0; LiTS = everything
    # (src/ptqer.py:337-340)
    if task == "brats":
        body_mask = calib_x[..., 0] != 0.0
    else:
        body_mask = jnp.ones(calib_x.shape[:-1], bool)

    # class stats use an all-ones mask; the pyramid uses the body mask
    # (src/ptqer.py:342-345)
    ones_mask = jnp.ones_like(body_mask)
    weight_map, nums = attention_weight_map(out_fp[-1], ones_mask, att_style,
                                            task)
    # one jitted program for the whole pyramid (the weight map values are
    # baked as constants; traced once per run)
    pyramid = jax.jit(lambda o, b: mask_pyramid(
        o, b, weight_map, init_stride, num_mask_lvls, task))(out_fp,
                                                             body_mask)

    # ---- concurrent program preparation ----
    # The sweep is sequential (layer i+1's input carries layer i's
    # quantization error), but every layer's PROGRAM signature is known
    # up front from the FP shapes.  Compiling/fetching them one-by-one
    # inside the sweep serializes the dominant warm-run cost on
    # remote-attached hosts (per-geometry executable fetch, BASELINE.md);
    # here all distinct per-layer programs are AOT-compiled in a thread
    # pool first and the sweep calls the compiled executables.
    def act_search_for(name: str) -> int:
        """Max offset-grid shift to search for this conv (0 = off)."""
        if not act_offset:
            return 0
        if act_offset_convs is not None and name not in act_offset_convs:
            return 0
        return int(act_offset)

    precompiled = {}
    if mesh is None:
        t_pre = time.time()
        precompiled = _precompile_layer_programs(
            graph, params, state, calib_x, captured, pyramid, hp, verbose,
            act_search_for=act_search_for)
        if verbose and precompiled:
            print(f"precompiled {len(precompiled)} layer programs in "
                  f"{time.time() - t_pre:.1f}s")

    # ---- the calibration sweep ----
    # The nodes BETWEEN calibration targets (relu/pool/add/upsample/BN glue)
    # are grouped into maximal segments, each compiled as ONE jitted
    # function: per-op eager dispatch costs a host<->device round-trip per
    # node, which dominates warm-cache wall-clock on remote-attached TPUs.
    layer_losses: List[Tuple[str, float]] = []
    layer_rel_losses: List[Tuple[str, float]] = []
    layer_histories: Dict[str, Dict[str, np.ndarray]] = {}
    values: Dict[str, jnp.ndarray] = {graph.input_name: calib_x}

    # last position at which each value is consumed (inf for head outputs)
    last_use: Dict[str, float] = {name: float("inf") for name in graph.outputs}
    for pos, n in enumerate(graph.nodes):
        for src in n.inputs:
            last_use[src] = max(last_use.get(src, -1), pos)

    def free_dead(pos):
        """Drop device activations no node after ``pos`` consumes: without
        this every full-volume intermediate stays alive for the whole
        sweep, and peak device memory grows with network depth instead of
        the live frontier (the pressure that needlessly trips the
        RESOURCE_EXHAUSTED -> CPU fallback on deep configs).  Safe for the
        block-granularity residual lookup: the residual stream feeds the
        block's add node, which sits after the exit conv being
        calibrated."""
        for name in [k for k in values if last_use.get(k, -1) <= pos]:
            del values[name]

    def run_glue_segment(seg, seg_end_pos):
        """Execute a run of non-calibrated nodes as one jitted program."""
        produced = {n.name for n in seg}
        in_names = sorted({src for n in seg for src in n.inputs
                           if src not in produced})
        out_names = [n.name for n in seg
                     if last_use.get(n.name, -1) > seg_end_pos]
        seg_params = {n.name: params[n.name] for n in seg if n.name in params}
        seg_state = {n.name: state[n.name] for n in seg if n.name in state}

        def fn(p, s, ins):
            vals = dict(zip(in_names, ins))
            for n in seg:
                vals[n.name] = nnir.eval_node(
                    n, p, s, [vals[x] for x in n.inputs], mode="fp",
                    precision=HI)
            return tuple(vals[name] for name in out_names)

        outs = jax.jit(fn)(seg_params, seg_state,
                           tuple(values[x] for x in in_names))
        values.update(zip(out_names, outs))
        free_dead(seg_end_pos)

    glue: List = []
    for pos, node in enumerate(graph.nodes):
        if node.op == "input":
            continue
        if not (node.op == "conv" and node.attrs.get("qcfg") is not None):
            glue.append((pos, node))
            continue
        if glue:
            run_glue_segment([n for _, n in glue], glue[-1][0])
            glue = []
        ins = [values[n] for n in node.inputs]
        if node.op == "conv":  # a calibration target
            qcfg = node.attrs["qcfg"]
            p = params[node.name]
            x_in = ins[0]
            y_fp = captured[node.name]
            if node.name in block_targets:
                # block granularity: regression target = FP block output
                # minus the residual stream, so this conv absorbs the
                # block's accumulated error (the add is linear; see
                # block_calibration_targets).  The reported layer loss is
                # then the block-output loss.
                #
                # block_target picks WHICH residual value shifts the target:
                #   'quantized' (default) — the deployed stream: exact for
                #     the calibration volume, but it bakes the stream's
                #     draw-specific quantization noise into the target with
                #     a minus sign, so the exit conv learns to CANCEL that
                #     draw's noise (the repair-overfit mechanism of the
                #     W2A2 basin, docs/quantization.md);
                #   'fp' — the captured FP stream: a biased target at
                #     deploy time but free of draw noise.
                add_name, res_name = block_targets[node.name]
                res_val = (captured[res_name] if block_target == "fp"
                           else values[res_name])
                y_fp = captured[add_name] - res_val
            t_layer = time.time()
            if verbose:
                print(f"Calibrating {node.name}")
            if qcfg.q_weight:
                # activation-scale search, Gram build, ADMM and the layer's
                # quantized forward are ONE jitted program per layer
                att = match_pyramid_level(pyramid, y_fp.shape)
                kw = _layer_kw(node, qcfg, p, hp,
                               act_search=act_search_for(node.name))
                try:
                    if mesh is not None:
                        from ..parallel.ptq import calibrate_layer_sharded

                        res = calibrate_layer_sharded(
                            mesh, x_in, y_fp, p["kernel"], p.get("bias"),
                            att, **kw)
                    elif node.name in precompiled:
                        try:
                            res = precompiled[node.name](
                                x_in, y_fp, p["kernel"], p.get("bias"), att)
                        except Exception:  # signature drift -> jit path
                            res = calibrate_layer(x_in, y_fp, p["kernel"],
                                                  p.get("bias"), att, **kw)
                    else:
                        res = calibrate_layer(x_in, y_fp, p["kernel"],
                                              p.get("bias"), att, **kw)
                except Exception as e:  # accelerator OOM -> host fallback
                    # (the reference's GPU-OOM -> CPU path,
                    # solver.py:259-277, 329-337)
                    if "RESOURCE_EXHAUSTED" not in str(e):
                        raise
                    print(f"{node.name}: device OOM, calibrating on CPU")
                    cpu = jax.devices("cpu")[0]
                    args_cpu = [jax.device_put(t, cpu) if t is not None else None
                                for t in (x_in, y_fp, p["kernel"],
                                          p.get("bias"), att)]
                    res = calibrate_layer(*args_cpu, **kw)
                    res = jax.tree.map(jnp.asarray, res)
                p["kernel"] = res["kernel"]
                if res["bias"] is not None:
                    p["bias"] = res["bias"]
                p["alpha_w"] = res["alpha_w"]
                if res["alpha_act"] is not None:
                    p["alpha_act"] = res["alpha_act"]
                if act_search_for(node.name) and res.get("act_k") is not None:
                    # chosen offset-grid shift (0 = the unsigned grid) —
                    # read by nnir's fq path, deployment and exports
                    p["act_k"] = jnp.asarray(res["act_k"], jnp.int32)
                layer_losses.append((node.name, float(res["loss_reported"])))
                if "loss_relative" in res:
                    layer_rel_losses.append(
                        (node.name, float(res["loss_relative"])))
                hist = {k: np.asarray(v) for k, v in res["history"].items()}
                layer_histories[node.name] = hist
                if verbose:
                    # the reference prints the trajectory every 10 iters
                    # DURING the loop (EfficientQConv.py:123-127); ours is a
                    # compiled loop, so print it after the layer completes
                    for i in range(0, len(hist["loss"]), 10):
                        print(f"ADMM iter {i + 1}: primal residual = "
                              f"{hist['primal_residual'][i]:.4f}, "
                              f"dual residual = {hist['dual_residual'][i]:.4f}"
                              f", rho = {hist['rho'][i]:.4f}, "
                              f"loss = {hist['loss'][i]:.7f}.")
                out = res["out_q"]  # fused into the calibration program
                if verbose:
                    out = jax.block_until_ready(out)
                    print(f"  {node.name}: {time.time() - t_layer:.2f}s")
            else:
                # act-only quantization (q_weight off): no ADMM
                if qcfg.q_act:
                    a_act, b_act = project_by_iter(x_in, qcfg.qlvl_act,
                                                   0.0, 1.0)
                    p["alpha_act"] = a_act
                    x_q = a_act * b_act
                else:
                    x_q = x_in
                out = ops.conv3d(x_q, p["kernel"], p.get("bias"),
                                 node.attrs["stride"], node.attrs["padding"],
                                 node.attrs["dilation"], node.attrs["groups"],
                                 precision=HI)
        values[node.name] = out
        free_dead(pos)
    if glue:
        run_glue_segment([n for _, n in glue], glue[-1][0])

    out_q = jnp.stack([values[n] for n in graph.outputs], axis=0)
    out_q = jax.block_until_ready(out_q)
    t2 = time.time()

    new_vars = {"params": params, "state": state}
    report = PTQReport(layer_losses, nums, t1 - t0, t2 - t1, out_fp, out_q,
                       layer_histories, layer_rel_losses)
    return graph, new_vars, report


def run_ptq_mixed(
    graph: Graph,
    variables,
    calib_x: jnp.ndarray,
    *,
    task: str,
    init_stride,
    hp: PTQHyperParams = PTQHyperParams(),
    mixed_frac: float = 0.25,
    mixed_qlvl: int = 16,
    verbose: bool = False,
    ranking=None,
    mixed_tail: bool = True,
    **kw,
):
    """Sensitivity-driven mixed-precision PTQ (ours — no reference
    counterpart; the reference fixes one (qlvl_w, qlvl_act) per layer class,
    src/models/PTQConv.py:12-23).

    Two passes of :func:`run_ptq`:

    1. calibrate at the graph's base grids and rank every weight-quantized
       layer by its *relative* reconstruction loss (reported loss over
       target energy — scale-free, so comparable across layers);
    2. recalibrate with the worst ``mixed_frac`` fraction of layers lifted
       to a ``mixed_qlvl`` grid (weights AND activations; the sweep is
       sequential, so upgraded layers also de-noise everything downstream).

    Deployment cost is unchanged: any grid <= 256 levels packs into the
    same int8 codes and runs the same fused Pallas kernels — only the
    epilogue constants differ.  Returns ``(graph, qvars, report)`` with
    ``report.mixed_upgraded`` naming the lifted layers.

    ``ranking``: a precomputed ``[(layer_name, rel_loss), ...]`` sensitivity
    ranking — skips pass 1.  The ranking is a property of the trained
    weights far more than of the calibration volume
    (scripts/mixed_rank_probe.py), so callers calibrating on several
    volumes (ptq/select.py) rank once and reuse.

    ``mixed_tail`` (default on): structurally include the final-stage
    convs (tail_sensitive_convs) in the lift set, ahead of the rel-loss
    ranking.  The basin probe showed rel loss systematically underrates
    the last block (small local target energy, no downstream conv to
    absorb its error): on the W2A2 gate matrix, forcing the tail moves
    every calibration draw out of the 0.48 collapse basin (means
    0.583 -> 0.645; draws 2/3 lift 0.48 -> 0.63/0.58) at identical
    serving cost.  The lift-set size stays max(k, tail size).
    """
    if not 0.0 < mixed_frac <= 1.0:
        raise ValueError(f"mixed_frac must be in (0, 1], got {mixed_frac}")
    if ranking is None:
        _, _, rep1 = run_ptq(graph, variables, calib_x, task=task,
                             init_stride=init_stride, hp=hp, verbose=verbose,
                             **kw)
        ranking = rep1.layer_rel_losses or rep1.layer_losses
    k = max(1, int(round(mixed_frac * len(ranking))))
    tail = tail_sensitive_convs(graph) if mixed_tail else []
    ranked = [name for name, _ in sorted(ranking, key=lambda t: -t[1])
              if name not in tail]
    worst = (tail + ranked)[:max(k, len(tail))]
    overrides = {}
    lookup = {n.name: n for n in graph.nodes}
    for name in worst:
        qcfg = lookup[name].attrs["qcfg"]
        overrides[name] = (max(qcfg.qlvl_w, mixed_qlvl),
                           max(qcfg.qlvl_act, mixed_qlvl))
    if verbose:
        print(f"mixed precision: lifting {k}/{len(ranking)} layers to "
              f"qlvl {mixed_qlvl}: {worst}")
    g2, v2, rep2 = run_ptq(graph, variables, calib_x, task=task,
                           init_stride=init_stride, hp=hp, verbose=verbose,
                           qlvl_overrides=overrides, **kw)
    rep2.mixed_upgraded.extend(worst)
    return g2, v2, rep2
