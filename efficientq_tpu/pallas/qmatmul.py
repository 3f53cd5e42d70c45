"""Pallas TPU kernels for the quantized inference hot path.

The quantized forward's elementwise prologue (activation fake-quant) is fused
into the matmul here instead of being a separate HBM round-trip: one kernel
reads the activation tile, snaps it to the alpha_act grid on the VPU, and
feeds the MXU immediately.

``fused_qact_matmul`` covers every 1x1x1 quantized conv (the transition,
projection and classifier convs — a large fraction of UResQ's layers): a
(M, K) x (K, N) tiled matmul with the quantize prologue and bias epilogue in
VMEM.  3x3x3 convs stay on XLA's conv (already MXU-optimal); their act-quant
is a trivial fusible elementwise op.

All kernels run under ``interpret=True`` on CPU for tests.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x, m):
    return (x + m - 1) // m * m


def _qact_matmul_kernel(alpha_ref, x_ref, w_ref, b_ref, o_ref, *, qlvl_act):
    alpha = alpha_ref[0]
    x = x_ref[:]
    # discretize(x/alpha, qlvl, 0, 1) * alpha  (quant.py:discretize)
    delta = 1.0 / (qlvl_act - 1)
    xq = jnp.clip(x / alpha, 0.0, 1.0)
    xq = jnp.round(xq / delta) * delta * alpha
    # HIGHEST: full-f32 multi-pass on the MXU.  One-pass bf16 rounding of
    # the operands is enough to flip downstream quantizer rounding
    # decisions, which cascades through the net (measured on hardware).
    acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    o_ref[:] = acc + b_ref[:]


@functools.partial(jax.jit, static_argnames=("qlvl_act", "tile_m", "interpret"))
def fused_qact_matmul(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array],
    alpha_act,
    qlvl_act: int,
    tile_m: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """y = fake_quant_act(x) @ w + bias, fused in one Pallas kernel.

    x: (M, K) float32, w: (K, N) float32 (already holding quantized values
    post-PTQ), bias: (N,) or None.
    """
    M, K = x.shape
    K2, N = w.shape
    assert K == K2
    if bias is None:
        bias = jnp.zeros((N,), x.dtype)

    Mp = _round_up(M, tile_m)
    Np = _round_up(N, 128)
    Kp = _round_up(K, 128)
    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    bp = jnp.pad(bias, (0, Np - N))[None, :]
    alpha = jnp.reshape(jnp.asarray(alpha_act, jnp.float32), (1,))

    grid = (Mp // tile_m,)
    kernel = functools.partial(_qact_matmul_kernel, qlvl_act=qlvl_act)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM) if _HAS_PLTPU and not interpret
            else pl.BlockSpec((1,), lambda i: (0,)),
            pl.BlockSpec((tile_m, Kp), lambda i: (i, 0)),
            pl.BlockSpec((Kp, Np), lambda i: (0, 0)),
            pl.BlockSpec((1, Np), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, Np), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        interpret=interpret,
    )(alpha, xp, wp, bp)
    return out[:M, :N]


def _int8_qact_matmul_kernel(scales_ref, x_ref, w_ref, b_ref, o_ref, *,
                             qlvl_act):
    """True-integer path: quantize activations to int8 codes on the VPU,
    int8 x int8 matmul with int32 accumulation on the MXU, f32 scale + bias
    epilogue (ptq/deploy.py semantics — bit-exact vs fake-quant)."""
    alpha_act = scales_ref[0]
    qa = jnp.clip(x_ref[:] / alpha_act, 0.0, 1.0) * (qlvl_act - 1)
    qa = jnp.round(qa).astype(jnp.int8)
    acc = jnp.dot(qa, w_ref[:], preferred_element_type=jnp.int32)
    # b_ref: (2, N) — row 0 the scale alpha_act*alpha_w/((na-1)(nw-1))
    # (per-tensor broadcast or per-output-channel), row 1 the bias
    o_ref[:] = acc.astype(jnp.float32) * b_ref[0] + b_ref[1]


@functools.partial(jax.jit, static_argnames=("qlvl_act", "tile_m", "interpret"))
def fused_int8_matmul(
    x: jax.Array,
    w_codes: jax.Array,
    bias: Optional[jax.Array],
    alpha_act,
    scale,
    qlvl_act: int,
    tile_m: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """y = (int8_codes(x) @ w_codes) * scale + bias, one Pallas kernel.

    x: (M, K) float32; w_codes: (K, N) int8 (ptq/deploy.py kernel codes);
    scale: the f32 epilogue scalar.  Uses the MXU's int8 path.
    """
    M, K = x.shape
    K2, N = w_codes.shape
    assert K == K2
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    Mp = _round_up(M, tile_m)
    Np = _round_up(N, 128)
    Kp = _round_up(K, 128)
    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    wp = jnp.pad(w_codes, ((0, Kp - K), (0, Np - N)))
    # (2, Np) scale+bias rows (scale per-tensor broadcast or per-channel)
    bp = jnp.stack([
        jnp.pad(jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (N,)),
                (0, Np - N)),
        jnp.pad(bias.astype(jnp.float32), (0, Np - N))])
    scales = jnp.asarray(alpha_act, jnp.float32).reshape(1)

    grid = (Mp // tile_m,)
    kernel = functools.partial(_int8_qact_matmul_kernel, qlvl_act=qlvl_act)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM) if _HAS_PLTPU and not interpret
            else pl.BlockSpec((1,), lambda i: (0,)),
            pl.BlockSpec((tile_m, Kp), lambda i: (i, 0)),
            pl.BlockSpec((Kp, Np), lambda i: (0, 0)),
            pl.BlockSpec((2, Np), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, Np), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        interpret=interpret,
    )(scales, xp, wp, bp)
    return out[:M, :N]


def qconv1x1_ndhwc(x, kernel_dhwio, bias, alpha_act, qlvl_act,
                   interpret: bool = False):
    """Quantized-inference 1x1x1 conv via the fused Pallas matmul.

    x: (N, D, H, W, C); kernel: (1, 1, 1, C, O).
    """
    n, d, h, w, c = x.shape
    o = kernel_dhwio.shape[-1]
    flat = x.reshape(-1, c)
    wmat = kernel_dhwio.reshape(c, o)
    y = fused_qact_matmul(flat, wmat, bias, alpha_act, qlvl_act,
                          interpret=interpret)
    return y.reshape(n, d, h, w, o)


def to_pallas_inference(graph, include_1x1: bool = False):
    """Graph transform: flag every eligible qconv to dispatch through the
    fused Pallas kernels in ``nnir._eval_conv`` (quantized/fq modes only).

    Default eligibility = the interior 3x3x3 int8 convs (after
    ``ptq.deploy.to_int8_inference`` — apply it FIRST so they carry the
    ``int8`` attr), which route to the im2col-matmul MXU kernel in
    qconv3d.py and beat the XLA conv at every preset geometry (measured
    1.0-1.5x).  ``include_1x1=True`` additionally flags activation-quantized
    1x1x1 convs (transition/projection/classifier) for the fused matmul
    kernels; off by default because at the presets' skinny K/N (32-256,
    padded to the 128-lane MXU) XLA's dot is faster — measured 1.5-5x at
    the wide-M stages.  FP mode and training are untouched.
    """
    import dataclasses

    from ..nnir import Graph, _pallas_1x1_eligible, _pallas_3x3_int8_eligible

    new_nodes = []
    for node in graph.nodes:
        qcfg = node.attrs.get("qcfg")
        if (node.op == "conv" and qcfg is not None and qcfg.q_act
                # offset-grid (act_k) layers keep the XLA realization: the
                # fused kernels' act-quant prologues assume the unsigned
                # grid (ptq/deploy.py::act_k_of)
                and not node.attrs.get("act_k")
                and ((include_1x1 and _pallas_1x1_eligible(node.attrs))
                     or (node.attrs.get("int8")
                         and _pallas_3x3_int8_eligible(node.attrs)))):
            attrs = dict(node.attrs)
            attrs["pallas"] = True
            new_nodes.append(dataclasses.replace(node, attrs=attrs))
        else:
            new_nodes.append(node)
    return Graph(new_nodes, list(graph.outputs), graph.input_name)
