"""Closed-form layer-reconstruction solver on Gram matrices.

The reference builds an explicit im2col matrix on the host with a Python
triple loop, then forms Gram matrices and calls dense ``linalg.solve`` per
ADMM iteration (src/models/solver.py:86-111, 201-345).  TPU-native rewrite:

- im2col never touches the host: patch columns are built on device from
  strided ``lax.slice`` views and consumed immediately by MXU matmuls,
  chunked over the output depth axis so peak memory stays bounded even for
  the c1k ~= 13.8k LiTS stages.
- the per-ADMM-iteration dense solve is replaced by one Cholesky
  factorization per distinct rho value (the rho schedule doubles every 50
  iterations, so 200 iterations need ~5 factorizations instead of 200
  solves) + cheap triangular solves.
- per-iteration reconstruction loss (used to select the best ADMM iterate,
  src/models/EfficientQConv.py:118-143) is evaluated via the quadratic form
  tr(W A W^T) - 2 tr(W B^T) + ||y||^2 on the precomputed Grams instead of
  re-running the convolution.

Flattened weight convention matches torch: row = out-channel, column index
= c_in * kD*kH*kW + kd * kH*kW + kh * kW + kw (src/models/solver.py:101-110),
with an optional trailing bias column (src/models/solver.py:244-256).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST


def kernel_to_flat(k: jax.Array) -> jax.Array:
    """DHWIO kernel -> (c2, c1*kD*kH*kW) in torch flat order."""
    kd, kh, kw, ci, co = k.shape
    return jnp.transpose(k, (4, 3, 0, 1, 2)).reshape(co, ci * kd * kh * kw)


def flat_to_kernel(w: jax.Array, kshape_dhwio) -> jax.Array:
    kd, kh, kw, ci, co = kshape_dhwio
    return jnp.transpose(w.reshape(co, ci, kd, kh, kw), (2, 3, 4, 1, 0))


class GramStats(NamedTuple):
    """Sufficient statistics of the weighted least-squares objective.

    A_att = sum_s att_s x_s x_s^T          (c1k', c1k')
    B_att = sum_s att_s y_s x_s^T          (c2, c1k')
    A_unw/B_unw: same with att = 1
    yy_att = sum_s att_s ||y_s||^2 ; yy_unw = sum_s ||y_s||^2
    c1k' includes the bias (all-ones) row when has_bias.
    """

    A_att: jax.Array
    B_att: jax.Array
    A_unw: jax.Array
    B_unw: jax.Array
    yy_att: jax.Array
    yy_unw: jax.Array
    has_bias: bool
    numel_y: int


def _xcol_chunk(xp: jax.Array, d0: int, dc: int, out_hw: Tuple[int, int],
                ksize, stride, dilation) -> jax.Array:
    """Patch-column matrix for output rows [d0, d0+dc): (c1k, N*dc*Ho*Wo)."""
    kD, kH, kW = ksize
    sD, sH, sW = stride
    lD, lH, lW = dilation
    Ho, Wo = out_hw
    n = xp.shape[0]
    c = xp.shape[-1]
    slices = []
    for kd in range(kD):
        for kh in range(kH):
            for kw in range(kW):
                start = (0, d0 * sD + kd * lD, kh * lH, kw * lW, 0)
                limit = (n, d0 * sD + kd * lD + (dc - 1) * sD + 1,
                         kh * lH + (Ho - 1) * sH + 1,
                         kw * lW + (Wo - 1) * sW + 1, c)
                s = jax.lax.slice(xp, start, limit, (1, sD, sH, sW, 1))
                slices.append(s)  # (N, dc, Ho, Wo, C)
    stk = jnp.stack(slices)  # (Kprod, N, dc, Ho, Wo, C)
    # row order: channel-major then (kd, kh, kw)
    stk = jnp.moveaxis(stk, -1, 0)  # (C, Kprod, N, dc, Ho, Wo)
    return stk.reshape(c * kD * kH * kW, n * dc * Ho * Wo)


def compute_gram_stats(
    x: jax.Array,
    y: jax.Array,
    att: Optional[jax.Array],
    ksize,
    stride,
    padding,
    dilation=(1, 1, 1),
    has_bias: bool = True,
    max_chunk_elems: int = 1 << 27,
    scan_threshold: int = 4,
    valid_depth=None,
) -> GramStats:
    """Build GramStats from NDHWC activation ``x`` and NDHWC target ``y``.

    ``att``: optional (N, Do, Ho, Wo) voxel importance (linear weight on the
    squared error, matching x_colH = x_col * att at src/models/solver.py:295).

    ``valid_depth``: optional scalar (static int or traced) — output-depth
    rows >= valid_depth contribute nothing (used by the mesh-sharded path,
    parallel/ptq.py, whose per-device slabs are zero-padded to equal size;
    without the mask the bias ones-row would pollute A from padded rows).

    Chunked over the output-depth axis; few chunks unroll (cheapest HLO),
    many chunks roll into a ``lax.scan`` (bounded compile time — the
    dominant cost on remote-compiled targets), with the ragged tail handled
    by zero-masking padded positions.
    """
    kD, kH, kW = ksize
    sD = stride[0]
    pD, pH, pW = padding
    n, _, _, _, c1 = x.shape
    _, Do, Ho, Wo, c2 = y.shape
    xp = jnp.pad(x, ((0, 0), (pD, pD), (pH, pH), (pW, pW), (0, 0)))
    c1k = c1 * kD * kH * kW
    dim = c1k + (1 if has_bias else 0)

    # chunk over output depth to bound the materialized column matrix
    per_row = n * Ho * Wo * dim
    chunk_d = max(1, min(Do, int(max_chunk_elems // max(per_row, 1)) or 1))
    n_chunks = -(-Do // chunk_d)

    def chunk_terms(xc, yc, ac, valid):
        """One chunk's contributions. xc: (dim, S); yc: (c2, S); ac: (1, S)
        attention (ones when att is None); valid: (1, S) 0/1 mask."""
        xc = xc * valid  # zero out padded positions entirely
        yc = yc * valid
        A_u = jnp.matmul(xc, xc.T, precision=HI)
        B_u = jnp.matmul(yc, xc.T, precision=HI)
        yy_u = jnp.sum(yc * yc)
        if att is None:
            return A_u, B_u, A_u, B_u, yy_u, yy_u
        xh = xc * ac
        A_a = jnp.matmul(xc, xh.T, precision=HI)
        B_a = jnp.matmul(yc, xh.T, precision=HI)
        yy_a = jnp.sum(ac * (yc * yc))
        return A_a, B_a, A_u, B_u, yy_a, yy_u

    def slice_chunk_static(d0, dc):
        xc = _xcol_chunk(xp, d0, dc, (Ho, Wo), ksize, stride, dilation)
        if has_bias:
            xc = jnp.concatenate(
                [xc, jnp.ones((1, xc.shape[1]), xc.dtype)], axis=0)
        yc = jnp.moveaxis(y[:, d0:d0 + dc], -1, 0).reshape(c2, -1)
        ac = (att[:, d0:d0 + dc].reshape(1, -1) if att is not None else None)
        if valid_depth is None:
            valid = jnp.ones((1, xc.shape[1]), xc.dtype)
        else:
            rows = d0 + jax.lax.broadcasted_iota(jnp.int32, (n, dc, Ho, Wo), 1)
            valid = (rows < valid_depth).astype(jnp.float32).reshape(1, -1)
        return xc, yc, ac, valid

    zeros = (jnp.zeros((dim, dim), jnp.float32),
             jnp.zeros((c2, dim), jnp.float32),
             jnp.zeros((dim, dim), jnp.float32),
             jnp.zeros((c2, dim), jnp.float32),
             jnp.float32(0.0), jnp.float32(0.0))

    if n_chunks <= scan_threshold:
        acc = zeros
        for d0 in range(0, Do, chunk_d):
            terms = chunk_terms(*slice_chunk_static(d0, min(chunk_d, Do - d0)))
            acc = tuple(a + t for a, t in zip(acc, terms))
    else:
        # rolled form: pad Do to a chunk multiple and mask the tail
        Do_pad = n_chunks * chunk_d
        y_p = jnp.pad(y, ((0, 0), (0, Do_pad - Do), (0, 0), (0, 0), (0, 0)))
        att_p = (jnp.pad(att, ((0, 0), (0, Do_pad - Do), (0, 0), (0, 0)))
                 if att is not None else None)
        # input depth needed for one chunk of output rows
        in_d = (chunk_d - 1) * sD + (kD - 1) * dilation[0] + 1
        need = (Do_pad - 1) * sD + (kD - 1) * dilation[0] + 1
        xp_p = jnp.pad(xp, ((0, 0), (0, max(0, need - xp.shape[1])),
                            (0, 0), (0, 0), (0, 0)))

        def body(acc, ci):
            d0 = ci * chunk_d
            xsl = jax.lax.dynamic_slice_in_dim(xp_p, d0 * sD, in_d, axis=1)
            xc = _xcol_chunk(xsl, 0, chunk_d, (Ho, Wo), ksize, stride,
                             dilation)
            if has_bias:
                xc = jnp.concatenate(
                    [xc, jnp.ones((1, xc.shape[1]), xc.dtype)], axis=0)
            ysl = jax.lax.dynamic_slice_in_dim(y_p, d0, chunk_d, axis=1)
            yc = jnp.moveaxis(ysl, -1, 0).reshape(c2, -1)
            ac = None
            if att is not None:
                ac = jax.lax.dynamic_slice_in_dim(att_p, d0, chunk_d,
                                                  axis=1).reshape(1, -1)
            # validity mask for the ragged tail (and the caller's valid_depth)
            rows = d0 + jax.lax.broadcasted_iota(
                jnp.int32, (n, chunk_d, Ho, Wo), 1)
            limit = (Do if valid_depth is None
                     else jnp.minimum(Do, valid_depth))
            valid = (rows < limit).astype(jnp.float32).reshape(1, -1)
            terms = chunk_terms(xc, yc, ac, valid)
            return tuple(a + t for a, t in zip(acc, terms)), None

        acc, _ = jax.lax.scan(body, zeros, jnp.arange(n_chunks))

    A_att, B_att, A_unw, B_unw, yy_att, yy_unw = acc
    return GramStats(A_att, B_att, A_unw, B_unw, yy_att, yy_unw, has_bias,
                     int(np.prod(y.shape)))


def quadratic_mse(stats: GramStats, W_ext: jax.Array, weighted: bool) -> jax.Array:
    """mean over y-elements of [att *] ||W_ext columns - y||^2 via the Grams."""
    A = stats.A_att if weighted else stats.A_unw
    B = stats.B_att if weighted else stats.B_unw
    yy = stats.yy_att if weighted else stats.yy_unw
    WA = jnp.matmul(W_ext, A, precision=HI)
    val = jnp.sum(WA * W_ext) - 2.0 * jnp.sum(W_ext * B) + yy
    return val / stats.numel_y


def make_ranking_mse(stats: GramStats):
    """Cancellation-free evaluator of the unweighted quadratic MSE, for
    best-iterate ranking (src/models/EfficientQConv.py:118-143).

    The naive form tr(WAW^T) - 2tr(WB^T) + yy subtracts numbers of size
    ~S*E[y^2] to produce a residual ~S*mse; in f32 its absolute error can
    exceed the loss spacing between near-converged ADMM iterates (measured:
    tests/test_ptq_solver.py::test_quadratic_selector_ranks_like_direct_f64).
    Exact-identity rewrite around the (ridged) least-squares solution Wls:

        q(W) = r A r^T + 2 r.(A Wls^T - B^T) + q(Wls),   r = W - Wls

    The first term is a small positive quadratic in the quantization excess,
    the second is tiny ((A Wls^T - B^T) ~ -lam Wls), and the third is a
    CONSTANT — its (cancellation-prone) f32 value shifts every candidate
    equally and cannot affect ranking.  Costs one extra Cholesky per layer.
    """
    A = stats.A_unw
    B = stats.B_unw
    dim = A.shape[0]
    eye = jnp.eye(dim, dtype=jnp.float32)
    lam = 1e-6 * (jnp.trace(A) / dim) + 1e-30
    chol = jax.scipy.linalg.cho_factor(A + lam * eye)
    Wls = jax.scipy.linalg.cho_solve(chol, B.T).T
    g = jnp.matmul(Wls, A, precision=HI) - B
    c0 = quadratic_mse(stats, Wls, weighted=False)

    def loss(W_ext: jax.Array) -> jax.Array:
        r = W_ext - Wls
        rA = jnp.matmul(r, A, precision=HI)
        val = jnp.sum(rA * r) + 2.0 * jnp.sum(r * g)
        return val / stats.numel_y + c0

    return loss


def make_system(stats: GramStats, rho, eta, mu=0.0):
    """A of the proximal system for a given rho (src/models/solver.py:316-325):
    with bias: A = 2*A_att + (rho+mu)*quasi_eye + eta*I (bias diag gets eta
    only); without: A = 2*A_att + (rho+mu+eta)*I."""
    dim = stats.A_att.shape[0]
    eye = jnp.eye(dim, dtype=jnp.float32)
    if stats.has_bias:
        quasi = eye.at[dim - 1, dim - 1].set(0.0)
        return 2.0 * stats.A_att + (rho + mu) * quasi + eta * eye
    return 2.0 * stats.A_att + (rho + mu + eta) * eye


def solve_proximal(chol, stats: GramStats, rho, eta, G_flat, W0_ext):
    """Given cho_factor(A), solve A W^T = B^T for W.

    B = 2*B_att + eta*W0_ext (+ rho*G on the weight columns)
    Returns (w_star, b_star) — b_star is zeros(c2) when no bias.
    """
    B = 2.0 * stats.B_att + eta * W0_ext
    if stats.has_bias:
        B = B.at[:, :-1].add(rho * G_flat)
    else:
        B = B + rho * G_flat
    W = jax.scipy.linalg.cho_solve(chol, B.T).T
    if stats.has_bias:
        return W[:, :-1], W[:, -1]
    return W, jnp.zeros((W.shape[0],), W.dtype)
