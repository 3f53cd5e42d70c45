"""Per-layer ADMM calibration (the EfficientQ proximal quantizer).

Mirrors EfficientQConv.ptq (src/models/EfficientQConv.py:33-166):

- rho/eta scaled by max(y_dim*y_std / (w_dim*w_std), 1) * mean(att)
- ADMM iterations: closed-form proximal solve -> project_by_iter projection
  -> dual update -> rho doubling every 50 iters (dual rescaled) -> best
  iterate tracked by unweighted reconstruction MSE
- returns the best (G, bias, alpha_w) and the final attention-weighted loss

TPU-first: the rho schedule's *multipliers* are static, so the loop is
compiled as a handful of segments — one Cholesky factorization per distinct
rho, then a ``lax.fori_loop`` of cheap triangular solves + projections per
segment.  The per-iteration loss comes from the Gram quadratic form, so no
convolution is ever re-executed inside the loop.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import project_by_iter, project_by_iter_rows
from .solver import (GramStats, compute_gram_stats, flat_to_kernel,
                     kernel_to_flat, make_ranking_mse, make_system,
                     quadratic_mse, solve_proximal)


@dataclasses.dataclass(frozen=True)
class PTQHyperParams:
    """lwq_* hyper-parameters (src/models/EfficientQConv.py:23-26)."""

    admm_iter: int = 200
    rho: float = 10.0
    rho_max: float = 1000.0
    eta: float = 1.0
    mu: float = 0.0
    rho_update_interval: int = 50
    # per-output-channel alpha_w (the 'channel_wise' the reference's
    # PTQBlock reads but no PTQConv ever defines, src/models/PTQBlock.py:15)
    channel_wise: bool = False
    # DFQ-style per-output-channel bias correction (ours — the reference
    # keeps the BN-folded bias untouched): after ADMM, absorb the
    # grid-constrained kernel's residual channel-mean error into the FP
    # bias, minimizing the same (attention-weighted) objective exactly
    # w.r.t. a per-channel shift
    bias_corr: bool = False


def rho_segments(hp: PTQHyperParams) -> List[Tuple[float, int, float]]:
    """Static (rho_multiplier, n_iters, dual_factor_after) segments.

    Replays the schedule at src/models/EfficientQConv.py:129-137: at every
    iteration with i % N == 0 (evaluated *after* the solve), rho doubles
    (dual halves) until rho_max, then clamps (dual *= rho/rho_max).
    """
    mults, factors = [], []
    r = hp.rho
    for i in range(hp.admm_iter):
        mults.append(r)
        if i % hp.rho_update_interval == 0:
            if r * 2 <= hp.rho_max:
                r = r * 2
                factors.append(0.5)
            else:
                factors.append(r / hp.rho_max)
                r = hp.rho_max
        else:
            factors.append(1.0)
    segments = []
    start = 0
    for i in range(1, hp.admm_iter + 1):
        if i == hp.admm_iter or mults[i] != mults[start]:
            segments.append((mults[start], i - start, factors[i - 1]))
            start = i
    return segments


def admm_quantize(
    w_flat0: jax.Array,
    bias0: Optional[jax.Array],
    stats: GramStats,
    qlvl_w: int,
    rho_scale: jax.Array,
    hp: PTQHyperParams,
    loss_fn=None,
):
    """Run the ADMM loop on precomputed Grams.

    ``loss_fn(W_flat, bias) -> scalar`` overrides the per-iterate loss used
    for best tracking (defaults to the Gram quadratic form; calibrate_layer
    passes a direct-convolution loss when the layer's spatial extent is
    small — cheaper there, and free of quadratic-form cancellation).

    Returns (bestG_flat, bestB, best_alpha_w, best_loss, history) where
    ``history`` is a dict of (admm_iter,) arrays — per-iteration loss,
    primal/dual residual norms and rho — the --lwq_verbose trajectory the
    reference prints every 10 iterations and dumps via plot_save
    (src/models/EfficientQConv.py:113-127, src/ptqer.py:275-279).
    """
    c2 = w_flat0.shape[0]
    has_bias = stats.has_bias
    if has_bias:
        assert bias0 is not None
        W0_ext = jnp.concatenate([w_flat0, bias0[:, None]], axis=1)
    else:
        W0_ext = w_flat0
    eta = hp.eta * rho_scale

    G = w_flat0
    dual = jnp.zeros_like(w_flat0)
    bestG = w_flat0
    bestB = bias0 if bias0 is not None else jnp.zeros((c2,), w_flat0.dtype)
    bestLoss = jnp.float32(jnp.inf)
    bestA = (jnp.ones((c2,), jnp.float32) if hp.channel_wise
             else jnp.float32(1.0))

    def project(v):
        """(alpha, alpha*codes): per-tensor or per-output-channel scale."""
        if hp.channel_wise:
            a_w, b_w = project_by_iter_rows(v, qlvl_w, -1.0, 1.0)
            return a_w, a_w[:, None] * b_w
        a_w, b_w = project_by_iter(v, qlvl_w, -1.0, 1.0)
        return a_w, a_w * b_w

    def ext(Gw, b):
        if has_bias:
            return jnp.concatenate([Gw, b[:, None]], axis=1)
        return Gw

    if loss_fn is None:
        ranked = make_ranking_mse(stats)

        def loss_fn(Gw, b):
            return ranked(ext(Gw, b))

    # The rho segments run as ONE two-level scan instead of a Python loop:
    # a Python loop duplicates the blocked Cholesky/triangular-solve
    # lowerings per segment, which at c1k ~ 6.9k inflates the TPU
    # executable to ~150 MB and the compile to ~5 min (measured) — the
    # dominant cold AND warm cost on remote-attached hosts (warm loads are
    # upload-bandwidth-bound on executable size).  Segments are padded to
    # a uniform inner length; padded iterations compute but are masked out
    # of every carry update, and the history is compacted afterwards with
    # a static index gather, so active iterations are bit-identical to the
    # unrolled form.
    segs = rho_segments(hp)
    S = len(segs)
    L = max(n for _, n, _ in segs)
    mults = jnp.asarray([m for m, _, _ in segs], jnp.float32)
    dual_factors = jnp.asarray([f for _, _, f in segs], jnp.float32)
    n_active = jnp.asarray([n for _, n, _ in segs], jnp.int32)

    def outer(carry, xs):
        mult, dfac, n_act = xs
        rho = mult * rho_scale
        A = make_system(stats, rho, eta, hp.mu)
        chol = jax.scipy.linalg.cho_factor(A)

        def body(c, i):
            G, dual, bestG, bestB, bestLoss, bestA = c
            act = i < n_act
            w_star, b_star = solve_proximal(chol, stats, rho, eta, G - dual,
                                            W0_ext)
            a_w, G_new = project(w_star + dual)
            dual_new = w_star - G_new + dual
            loss = loss_fn(G_new, b_star)
            better = act & (loss < bestLoss)
            bestG = jnp.where(better, G_new, bestG)
            bestB = jnp.where(better, b_star, bestB)
            bestA = jnp.where(better, a_w, bestA)
            bestLoss = jnp.where(better, loss, bestLoss)
            # lwq_verbose diagnostics (EfficientQConv.py:115-127): primal
            # residual |w*-G|, dual residual rho*|G-G0|
            pres = jnp.linalg.norm(w_star - G_new)
            dres = rho * jnp.linalg.norm(G_new - G)
            G = jnp.where(act, G_new, G)
            dual = jnp.where(act, dual_new, dual)
            return ((G, dual, bestG, bestB, bestLoss, bestA),
                    (loss, pres, dres, jnp.broadcast_to(rho, ())))

        carry, ys = jax.lax.scan(body, carry, jnp.arange(L))
        G, dual, bestG, bestB, bestLoss, bestA = carry
        dual = dual * dfac
        return (G, dual, bestG, bestB, bestLoss, bestA), ys

    carry = (G, dual, bestG, bestB, bestLoss, bestA)
    carry, ys_all = jax.lax.scan(outer, carry,
                                 (mults, dual_factors, n_active))
    _, _, bestG, bestB, bestLoss, bestA = carry

    keep = np.flatnonzero(np.concatenate(
        [np.arange(L) < n for _, n, _ in segs]))
    history = {
        k: ys_all[i].reshape(S * L, *ys_all[i].shape[2:])[keep]
        for i, k in enumerate(("loss", "primal_residual", "dual_residual",
                               "rho"))}
    return bestG, bestB, bestA, bestLoss, history


@partial(jax.jit, static_argnames=("ksize", "stride", "padding", "dilation",
                                   "qlvl_w", "has_bias", "hp"))
def calibrate_from_stats(
    stats,
    x_q: jax.Array,
    y_fp: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    att: Optional[jax.Array],
    *,
    ksize,
    stride,
    padding,
    dilation,
    qlvl_w: int,
    has_bias: bool,
    hp: PTQHyperParams,
):
    """ADMM calibration given precomputed GramStats.

    Factored out of ``calibrate_layer`` so the mesh-sharded path
    (parallel/ptq.py::calibrate_layer_sharded) can build the Grams across
    devices and run the same single-device ADMM on the merged statistics.
    """
    # stats crosses the jit boundary as a pytree, which traces its
    # ``has_bias`` flag — restore the static value (it gates Python-level
    # branches in the solver)
    stats = stats._replace(has_bias=has_bias)
    w_flat0 = kernel_to_flat(kernel)

    # rho scaling (EfficientQConv.py:44-61)
    y_std = jnp.std(y_fp, ddof=1)
    w_std = jnp.std(w_flat0, ddof=1)
    rho_scale = jnp.maximum(
        (y_fp.size * y_std) / (w_flat0.size * w_std), 1.0)
    if att is not None:
        rho_scale = rho_scale * jnp.mean(att)

    # per-iterate loss: for small spatial extents the direct convolution is
    # both cheaper than the c1k^2 quadratic form and free of its f32
    # cancellation (the reference always uses the conv,
    # EfficientQConv.py:118-121)
    S = int(np.prod(y_fp.shape[:-1]))
    c1k = w_flat0.shape[1]
    loss_fn = None
    if 2 * S < c1k:
        from .. import ops

        def loss_fn(Gw, b):
            k = flat_to_kernel(Gw, kernel.shape)
            out = ops.conv3d(x_q, k, b if has_bias else None, stride, padding,
                             dilation, precision=jax.lax.Precision.HIGHEST)
            return jnp.mean((out - y_fp) ** 2)

    bestG, bestB, alpha_w, best_loss, history = admm_quantize(
        w_flat0, bias, stats, qlvl_w, rho_scale, hp, loss_fn=loss_fn)

    # the layer's quantized-forward output, fused into this program so the
    # calibration sweep needs no separate conv compilation per layer
    kernel_q = flat_to_kernel(bestG, kernel.shape)
    from .. import ops

    out_q = ops.conv3d(x_q, kernel_q, bestB if has_bias else None, stride,
                       padding, dilation, precision=jax.lax.Precision.HIGHEST)

    if hp.bias_corr and has_bias:
        # per-output-channel bias correction (see PTQHyperParams.bias_corr):
        # the optimal per-channel shift for the (weighted) reconstruction
        # objective is the (weighted) mean residual over (N, D, H, W)
        err = y_fp - out_q
        if att is not None:
            w4 = att[..., None]
            delta = (jnp.sum(err * w4, axis=(0, 1, 2, 3))
                     / jnp.maximum(jnp.sum(w4), 1e-30))
        else:
            delta = jnp.mean(err, axis=(0, 1, 2, 3))
        bestB = bestB + delta
        out_q = out_q + delta

    W_ext = (jnp.concatenate([bestG, bestB[:, None]], axis=1)
             if has_bias else bestG)
    final_unw = quadratic_mse(stats, W_ext, weighted=False)
    final_att = quadratic_mse(stats, W_ext, weighted=True)

    # scale-free sensitivity: reported loss over the (same-weighted) target
    # energy — comparable ACROSS layers, which the absolute loss is not.
    # Drives the mixed-precision layer ranking (engine.run_ptq_mixed).
    yy = stats.yy_att if att is not None else stats.yy_unw
    final_rep = final_att if att is not None else final_unw
    loss_rel = final_rep * stats.numel_y / jnp.maximum(yy, 1e-30)

    return {
        "kernel": kernel_q,
        "bias": bestB if has_bias else None,
        "alpha_w": alpha_w,
        "alpha_act": None,
        "best_loss": best_loss,
        "loss_unweighted": final_unw,
        "loss_reported": final_rep,
        "loss_relative": loss_rel,
        "out_q": out_q,
        "history": history,
    }


@partial(jax.jit, static_argnames=("ksize", "stride", "padding", "dilation",
                                   "qlvl_w", "qlvl_act", "has_bias", "hp",
                                   "act_search"))
def calibrate_layer(
    x_q: jax.Array,
    y_fp: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    att: Optional[jax.Array],
    *,
    ksize,
    stride,
    padding,
    dilation,
    qlvl_w: int,
    has_bias: bool,
    hp: PTQHyperParams,
    qlvl_act: Optional[int] = None,
    act_search: int = 0,
):
    """Calibrate one conv layer.

    x_q: NDHWC input activation.  When ``qlvl_act`` is given, the optimal
    activation scale is found and the input fake-quantized *inside this
    program* (one XLA compilation per layer instead of two); when None the
    input is used as-is (already quantized, or q_act off).
    y_fp: NDHWC full-precision target output
    kernel/bias: current FP (BN-folded) parameters
    att: optional (N, Do, Ho, Wo) attention weights

    Returns dict with quantized kernel (DHWIO, values = alpha_w * grid),
    bias, alpha_w, alpha_act (None unless qlvl_act given), the layer's
    quantized output, best unweighted loss, and the final reported layer
    loss (attention-weighted when att is given, EfficientQConv.py:161-166).
    """
    alpha_act = None
    act_k = jnp.int32(0)
    if qlvl_act is not None:
        if act_search:
            # offset-grid search (quant.fake_quant_act_k): candidate grids
            # shift k of the qlvl_act levels below zero (k=0 = the
            # reference's unsigned grid); pick the k whose jointly-optimal
            # scale minimizes the input reconstruction error.  Ties keep
            # the smallest k (argmin picks the first), i.e. the unsigned
            # grid wins unless negative mass actually pays.
            delta = 1.0 / (qlvl_act - 1)
            n_cand = min(int(act_search), qlvl_act - 1) + 1
            errs, alphas = [], []
            for k in range(n_cand):
                lo = -k * delta
                a_k, b_k = project_by_iter(x_q, qlvl_act, lo, lo + 1.0)
                d = (x_q - a_k * b_k).ravel()
                errs.append(jnp.vdot(d, d,
                                     precision=jax.lax.Precision.HIGHEST))
                alphas.append(a_k)
            best = jnp.argmin(jnp.stack(errs))
            act_k = best.astype(jnp.int32)
            alpha_act = jnp.stack(alphas)[best]
            lo_b = -act_k.astype(jnp.float32) * delta
            from ..quant import discretize

            x_q = discretize(x_q / alpha_act, qlvl_act, lo_b,
                             lo_b + 1.0) * alpha_act
        else:
            a_act, b_act = project_by_iter(x_q, qlvl_act, 0.0, 1.0)
            alpha_act = a_act
            x_q = a_act * b_act

    stats = compute_gram_stats(x_q, y_fp, att, ksize, stride, padding,
                               dilation, has_bias=has_bias)
    res = calibrate_from_stats(stats, x_q, y_fp, kernel, bias, att,
                               ksize=ksize, stride=stride, padding=padding,
                               dilation=dilation, qlvl_w=qlvl_w,
                               has_bias=has_bias, hp=hp)
    return {**res, "alpha_act": alpha_act, "act_k": act_k}
