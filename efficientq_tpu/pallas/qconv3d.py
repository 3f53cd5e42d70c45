"""Pallas TPU kernel: int8 3x3x3 conv as an in-VMEM im2col-matmul.

The deployed quantized network's FLOPs live in the 3^3 convs
(src/models/PTQConv.py:157-170 runs them as cuDNN f32 convs; our XLA path
as bf16/f32 `conv_general_dilated`).  This kernel runs them on the MXU's
int8 path:

    XLA (fused upstream): activation -> int8 codes  (4x smaller in HBM)
    per output z-plane (pallas grid):
      - three padded int8 input planes arrive via BlockSpec taps
        (the same array passed three times with z-offset index maps)
      - the im2col block for each kd tap: 9 shifted (H*W, C) views
        concatenated to (H*W, 9C) in VMEM
      - three int8 x int8 matmuls with int32 accumulation on the MXU
      - f32 scale + bias epilogue

Integer accumulation has no rounding, so the result is bit-exact with the
fake-quant computation (see ptq/deploy.py).  Activations are read from HBM
as int8 (3 taps x 1 byte vs the f32 conv's 4 bytes), and the quantize
prologue fuses into whatever XLA op produced the activation.

Covers stride 1, symmetric 'same' padding (= dilation), groups 1 — the
shape of every interior 3^3 qconv that `ptq.deploy.to_int8_inference`
rewrites.  Other geometries stay on the XLA conv.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _qconv3d_kernel(scale_ref, *refs, H, W, dil, taps_hw, tz, out_dtype):
    """refs = tz + 2*dil int8 plane refs, then w_ref, b_ref, o_ref.

    Each program computes ``tz`` output z-planes from tz + 2*dil input
    planes (z-tiling: an input plane is fetched by ~(tz+2dil)/tz programs
    instead of 3, cutting HBM read amplification)."""
    plane_refs = refs[:tz + 2 * dil]
    w_ref, b_ref, o_ref = refs[tz + 2 * dil:]
    scale = scale_ref[0]
    for z in range(tz):
        acc = None
        for kd in range(3):
            qa = plane_refs[z + kd * dil][0, 0]  # (Hp, Wp, C) int8
            cols = jnp.concatenate(
                [qa[kh * dil:kh * dil + H, kw * dil:kw * dil + W, :]
                 .reshape(H * W, -1) for kh, kw in taps_hw], axis=1)
            part = jnp.dot(cols, w_ref[kd], preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
        o_ref[0, z] = (acc.astype(jnp.float32) * scale
                       + b_ref[:]).reshape(H, W, -1).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("qlvl_act", "dilation",
                                             "interpret", "out_dtype"))
def qconv3x3_int8_ndhwc(
    x: jax.Array,
    w_codes: jax.Array,
    bias: Optional[jax.Array],
    alpha_act,
    scale,
    qlvl_act: int,
    dilation: int = 1,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jax.Array:
    """y = conv3d(int8_codes(x), w_codes) * scale + bias, stride 1,
    padding = dilation ('same'), one fused Pallas program per output plane.

    x: (N, D, H, W, C) float32; w_codes: (3, 3, 3, C, O) int8 (DHWIO codes
    from ptq/deploy.py); scale = alpha_act*alpha_w/((na-1)(nw-1)).
    """
    n, d, h, w_sp, c = x.shape
    kd, kh, kw, c2, o = w_codes.shape
    assert (kd, kh, kw) == (3, 3, 3) and c2 == c
    dil = int(dilation)
    if bias is None:
        bias = jnp.zeros((o,), jnp.float32)

    # act-quant in XLA (fuses, with the padding, into one pass over the
    # producing op's output); int8 thereafter
    qa = jnp.round(jnp.clip(x / alpha_act, 0.0, 1.0)
                   * (qlvl_act - 1)).astype(jnp.int8)
    qp = jnp.pad(qa, ((0, 0), (dil, dil), (dil, dil), (dil, dil), (0, 0)))
    taps_hw = tuple((i, j) for i in range(3) for j in range(3))
    # per-kd im2col weight layout: (kh, kw, C) rows, matching the kernel's
    # kh-major/kw-minor concat of C-column slices
    w_mat = w_codes.reshape(3, 9 * c, o)
    bias2d = bias.reshape(1, o)
    scale1 = jnp.reshape(jnp.asarray(scale, jnp.float32), (1,))
    hp, wp = h + 2 * dil, w_sp + 2 * dil

    # z-tile: TZ output planes per program, bounded by a VMEM budget that
    # accounts for the 128-lane channel padding (C=32 tiles pad 4x)
    def _pad128(v):
        return -(-v // 128) * 128

    tz = 1
    if h * w_sp >= 1024:  # tiny planes: per-z overhead beats the read saving
        for t in (8, 4, 2):
            vmem = ((t + 2 * dil) * hp * wp * _pad128(c) * 2  # int8 planes x2
                    + t * h * w_sp * _pad128(o) * 4 * 2       # f32 out x2
                    + h * w_sp * _pad128(9 * c)               # im2col block
                    + h * w_sp * _pad128(o) * 4)              # i32 accumulator
            if d % t == 0 and vmem < 9 * 1024 * 1024:
                tz = t
                break

    kernel = functools.partial(_qconv3d_kernel, H=h, W=w_sp, dil=dil,
                               taps_hw=taps_hw, tz=tz, out_dtype=out_dtype)
    plane_spec = [
        pl.BlockSpec((1, 1, hp, wp, c),
                     lambda ni, zi, _k=k: (ni, zi * tz + _k, 0, 0, 0))
        for k in range(tz + 2 * dil)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n, d // tz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM) if _HAS_PLTPU and not interpret
            else pl.BlockSpec((1,), lambda ni, zi: (0,)),
            *plane_spec,
            pl.BlockSpec((3, 9 * c, o), lambda ni, zi: (0, 0, 0)),
            pl.BlockSpec((1, o), lambda ni, zi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tz, h, w_sp, o),
                               lambda ni, zi: (ni, zi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d, h, w_sp, o), out_dtype),
        interpret=interpret,
    )(scale1, *([qp] * (tz + 2 * dil)), w_mat, bias2d)
    return out
