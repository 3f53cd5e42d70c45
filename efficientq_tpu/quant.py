"""Quantization math core.

Provides the uniform fake-quantizer and the alternating-minimization optimal
scale search used everywhere in EfficientQ-style PTQ.

Parity notes (reference = rongzhao-zhang/EfficientQ):
- ``ste_round``     <-> RoundDifferentiable        (src/models/layer_helper.py:13-22)
- ``discretize``    <-> discretize                 (src/models/layer_helper.py:25-37)
- ``project_by_iter`` <-> project_by_iter          (src/models/layer_helper.py:40-70)

TPU-first design: the data-dependent convergence loop of the scale search is a
``jax.lax.while_loop`` with the same iteration cap (num_lvl * 100) so the whole
thing stays inside one XLA computation; reductions use float32 accumulation
(the reference upcasts to float64 on CPU/GPU — float64 is not natively
supported on TPU, so we keep float32 and verify convergence in tests against a
float64 NumPy oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def ste_round(x):
    """Round with a straight-through gradient estimator."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def discretize(var, num_lvl, lo, hi):
    """Uniform fake-quantization of ``var`` onto ``num_lvl`` levels in [lo, hi].

    lo, hi are (-1, 1) for weights and (0, 1) for activations. Gradient is STE.
    Output values lie exactly on the uniform grid ``lo + k * (hi-lo)/(num_lvl-1)``.
    """
    delta = (hi - lo) / (num_lvl - 1)
    var = jnp.clip(var, lo, hi)
    q = ste_round((var - lo) / delta)
    return q * delta + lo


def project_by_iter(var, num_lvl, lo=-1.0, hi=1.0, tol=1e-5, max_iter=None):
    """Jointly optimal (scale a, code b) for ``var ~= a * b`` with b on the
    uniform ``num_lvl``-level grid in [lo, hi].

    Alternating minimization: b = discretize(var/a), a = <b,var>/<b,b>,
    iterated until |a - a_prev| <= tol or ``num_lvl*100`` iterations.

    Returns (a, b): scalar scale and the quantized code tensor (same shape as
    ``var``, values on the grid in [lo, hi]).
    """
    if max_iter is None:
        max_iter = int(num_lvl) * 100
    v = var.astype(jnp.float32)
    a0 = jnp.mean(jnp.abs(v))

    def cond(carry):
        a, a_prev, i = carry
        return jnp.logical_and(jnp.abs(a - a_prev) > tol, i < max_iter)

    def body(carry):
        a, _, i = carry
        b = discretize(v / a, num_lvl, lo, hi)
        num = jnp.vdot(b, v, precision=jax.lax.Precision.HIGHEST)
        den = jnp.vdot(b, b, precision=jax.lax.Precision.HIGHEST)
        a_new = jnp.where(den > 0, num / den, a)
        return (a_new, a, i + 1)

    a, _, _ = jax.lax.while_loop(cond, body, (a0, jnp.float32(-999.0), 0))
    b = discretize(v / a, num_lvl, lo, hi)
    return a, b.astype(var.dtype)


def project_by_iter_rows(var2d, num_lvl, lo=-1.0, hi=1.0, tol=1e-5,
                         max_iter=None):
    """Per-row :func:`project_by_iter`: jointly optimal (a_i, b_i) for each
    row of ``var2d ~= a[:, None] * b``.

    The per-output-channel weight scale ('channel_wise') the reference
    aspires to but never implements (src/models/PTQBlock.py:15 reads a
    ``channel_wise`` attr no PTQConv defines).  Each row's alternating
    minimization is independent; under vmap the while_loop runs until the
    slowest row converges, with converged rows' updates masked by their own
    tolerance check.

    Returns (a (R,), b (R, K)).
    """
    f = functools.partial(project_by_iter, num_lvl=num_lvl, lo=lo, hi=hi,
                          tol=tol, max_iter=max_iter)
    return jax.vmap(f)(var2d)


def fake_quant_weight(w, alpha_w, num_lvl):
    """Symmetric weight fake-quant: clip(w/a, -1, 1) on the grid, times a.

    Mirrors PTQConv._quantize_w (src/models/PTQConv.py:110-112).
    """
    return discretize(w / alpha_w, num_lvl, -1.0, 1.0) * alpha_w


def fake_quant_act(x, alpha_act, num_lvl):
    """Unsigned activation fake-quant: clip(x/a, 0, 1) on the grid, times a.

    Mirrors PTQConv._quantize_act (src/models/PTQConv.py:114-116).
    """
    return discretize(x / alpha_act, num_lvl, 0.0, 1.0) * alpha_act


def fake_quant_act_k(x, alpha_act, num_lvl, k):
    """Offset (signed-asymmetric) activation fake-quant: the uniform grid
    ``(i - k)/(num_lvl-1) * alpha_act`` for i in 0..num_lvl-1 — k levels
    below zero, (num_lvl-1-k) above.

    The reference's activation quantizer is unsigned
    (src/models/layer_helper.py:25-37 clips at zero), which saturates
    layers whose inputs carry negative mass — the measured mechanism of
    the W2A2 tail-collapse basin (docs/quantization.md).  Shifting the
    SAME number of levels below zero keeps the deployed integer conv
    exact (codes become ``q - k`` in [-k, num_lvl-1-k]; zero stays ON the
    grid, so conv zero-padding needs no correction term and the scale
    epilogue is unchanged).  ``k=0`` reduces bit-for-bit to
    :func:`fake_quant_act`.  ``k`` may be a traced scalar.
    """
    delta = 1.0 / (num_lvl - 1)
    lo = -k * delta
    return discretize(x / alpha_act, num_lvl, lo, lo + 1.0) * alpha_act


def pack_int_weight(qweight, alpha_w, num_lvl):
    """Convert a fake-quantized weight (values = alpha_w * grid) to integer
    codes for storage.  codes = round((w/alpha + 1) / delta) in [0, num_lvl-1].

    uint8 for <=256 levels, int32 otherwise.
    Mirrors PTQConv.store_int_weight (src/models/PTQConv.py:125-142).
    ``alpha_w`` may be a scalar or a per-output-channel vector
    (channel_wise); weights are torch-layout (O, I, D, H, W).
    """
    b = np.asarray(qweight) / _alpha_bcast(alpha_w, np.asarray(qweight).ndim)
    delta = 2.0 / (num_lvl - 1)
    w_int = np.round((b + 1.0) / delta)
    dtype = np.uint8 if num_lvl <= 256 else np.int32
    return w_int.astype(dtype)


def _alpha_bcast(alpha_w, ndim):
    """Scalar alpha -> float; vector alpha -> broadcast against the
    leading (output-channel) axis of a torch-layout weight."""
    a = np.asarray(alpha_w, np.float64)
    if a.ndim == 0:
        return float(a)
    return a.reshape((-1,) + (1,) * (ndim - 1))


def unpack_int_weight(w_int, alpha_w, num_lvl, dtype=np.float32):
    """Inverse of :func:`pack_int_weight`.

    Mirrors PTQConv.restore_fp_weight (src/models/PTQConv.py:144-152).
    """
    delta = 2.0 / (num_lvl - 1)
    b = np.asarray(w_int).astype(dtype) * delta - 1.0
    return (_alpha_bcast(alpha_w, b.ndim) * b).astype(dtype)


def project_by_iter_np(var, num_lvl, lo=-1.0, hi=1.0, tol=1e-5):
    """Float64 NumPy oracle of :func:`project_by_iter` (for tests/host use)."""
    v = np.asarray(var, dtype=np.float64)
    max_iter = int(num_lvl) * 100
    a = float(np.abs(v).mean())
    a_prev = -999.0
    c = 0
    delta = (hi - lo) / (num_lvl - 1)

    def disc(x):
        return np.round((np.clip(x, lo, hi) - lo) / delta) * delta + lo

    while abs(a - a_prev) > tol and c < max_iter:
        b = disc(v / a)
        a_prev = a
        den = float((b * b).sum())
        if den > 0:
            a = float((b * v).sum()) / den
        c += 1
    b = disc(v / a)
    return a, b.astype(var.dtype if hasattr(var, "dtype") else np.float32)
