"""Mesh-sharded PTQ calibration statistics.

The reference accumulates the per-layer least-squares Grams sample-by-sample
on one GPU (src/models/solver.py:282-314).  The single-chip TPU rewrite
already chunks the output-depth axis on device (ptq/solver.py); here the
same decomposition is spread across a ``jax.sharding.Mesh``:

- the activation/target are sharded along the output-depth axis BEFORE any
  device computation (host->device transfers move only each device's slab,
  never the whole volume to one chip);
- each device needs ``(kD-1)*dilation+1-stride`` halo rows from its
  neighbor, fetched with one ``ppermute`` over the ICI;
- each device im2cols its slab and accumulates a local A/B Gram, then ONE
  ``psum`` merges the accumulators — the collective moves O(c1k^2) bytes,
  never the activation columns.

This makes calibration of very large volumes (LiTS whole-liver crops,
c1k ~= 13.8k) scale to a pod slice: no device ever materializes more than
its own slab plus the halo.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ptq.solver import GramStats, compute_gram_stats


_project_jit = None


def _jitted_project(x, qlvl, lo, hi):
    """One module-level jit wrapper so repeat same-shape layers hit the
    trace cache (a fresh jax.jit per call would retrace every layer)."""
    global _project_jit
    if _project_jit is None:
        from ..quant import project_by_iter

        _project_jit = jax.jit(project_by_iter, static_argnums=(1,))
    return _project_jit(x, qlvl, lo, hi)


def sharded_gram_stats(
    mesh: Mesh,
    x: jax.Array,
    y: jax.Array,
    att: Optional[jax.Array],
    ksize,
    stride,
    padding,
    dilation=(1, 1, 1),
    has_bias: bool = True,
    axis_name: str = "data",
) -> GramStats:
    """``compute_gram_stats`` with the output-depth axis sharded over the
    mesh.  Bit-compatible contributions; devices may sum chunks in a
    different order than the single-chip path (f32 associativity), which is
    within the same tolerance class as the single-chip chunking itself.

    x: (N, D, H, W, C) calibration activation; y: (N, Do, Ho, Wo, C2) FP
    target; att: optional (N, Do, Ho, Wo) voxel weights.
    """
    kD, kH, kW = ksize
    sD = stride[0]
    lD = dilation[0]
    pD, pH, pW = padding
    n_dev = int(np.prod([mesh.shape[a] for a in ([axis_name]
                         if isinstance(axis_name, str) else axis_name)]))
    Do = y.shape[1]

    # per-device output-depth chunk (ragged tail masked off inside
    # compute_gram_stats via valid_depth)
    k = -(-Do // n_dev)
    in_d = (k - 1) * sD + (kD - 1) * lD + 1   # input rows per device's chunk
    own = k * sD                              # rows owned by each device
    halo = max(0, in_d - own)                 # rows borrowed from neighbor
    if halo > own:
        # a device would need rows from >1 neighbor (volume too shallow for
        # this mesh: own < halo).  One ppermute can't deliver that, and a
        # volume this small has nothing to gain from sharding — build the
        # Grams on one device.
        return compute_gram_stats(x, y, att, ksize, stride, padding,
                                  dilation, has_bias=has_bias)

    # host-side (NumPy) padding so device_put moves each shard directly to
    # its device — the full padded volume never lands on a single chip
    xp = np.pad(np.asarray(x), ((0, 0), (pD, pD), (pH, pH), (pW, pW),
                                (0, 0)))
    need = n_dev * own + halo
    if need > xp.shape[1]:
        xp = np.pad(xp, ((0, 0), (0, need - xp.shape[1]),
                         (0, 0), (0, 0), (0, 0)))
    # rows past the last even shard boundary still belong to the last
    # device's receptive field — shipped replicated (it's <= halo rows) and
    # substituted for its (zero) ppermute receive below
    tail_halo = np.ascontiguousarray(
        xp[:, n_dev * own:n_dev * own + halo]) if halo else None
    xp = xp[:, :n_dev * own]                  # even shards; halo via ppermute
    y_pad = np.pad(np.asarray(y), ((0, 0), (0, n_dev * k - Do),
                                   (0, 0), (0, 0), (0, 0)))
    with_att = att is not None
    if with_att:
        a_pad = np.pad(np.asarray(att), ((0, 0), (0, n_dev * k - Do),
                                         (0, 0), (0, 0)))
    else:  # dummy for uniform arity; never read
        a_pad = np.zeros((1, n_dev), np.float32)
    n_valid = np.clip(Do - k * np.arange(n_dev), 0, k).astype(np.int32)

    shard_d = NamedSharding(mesh, P(None, axis_name))
    shard_0 = NamedSharding(mesh, P(axis_name))

    def local(x_s, y_s, a_s, nv, tail):
        # x_s: (N, own, Hp, Wp, C) — this device's rows.  Fetch the halo
        # (the neighbor's first `halo` rows) over the ICI; the last device
        # takes the replicated tail rows instead of its (zero) receive.
        if halo:
            head = x_s[:, :halo]
            perm = [(i + 1, i) for i in range(n_dev - 1)]
            recv = jax.lax.ppermute(head, axis_name, perm)
            last = jax.lax.axis_index(axis_name) == n_dev - 1
            recv = jnp.where(last, tail, recv)
            x_s = jnp.concatenate([x_s, recv], axis=1)
        s = compute_gram_stats(
            x_s[:, :in_d], y_s, a_s if with_att else None,
            ksize, stride, (0, 0, 0), dilation, has_bias,
            valid_depth=nv[0])
        parts = (s.A_att, s.B_att, s.A_unw, s.B_unw, s.yy_att, s.yy_unw)
        return tuple(jax.lax.psum(p, axis_name) for p in parts)

    if tail_halo is None:
        tail_halo = np.zeros((1,), np.float32)  # dummy; never read
    run = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name),
                  P(None, axis_name), P(axis_name), P()),
        out_specs=P()))
    A_a, B_a, A_u, B_u, yy_a, yy_u = run(
        jax.device_put(xp, shard_d), jax.device_put(y_pad, shard_d),
        jax.device_put(a_pad, shard_d), jax.device_put(n_valid, shard_0),
        jax.device_put(tail_halo, NamedSharding(mesh, P())))
    return GramStats(A_a, B_a, A_u, B_u, yy_a, yy_u, has_bias,
                     int(np.prod(y.shape)))


def calibrate_layer_sharded(
    mesh: Mesh,
    x: jax.Array,
    y_fp: jax.Array,
    kernel: jax.Array,
    bias,
    att,
    *,
    ksize,
    stride,
    padding,
    dilation,
    qlvl_w: int,
    has_bias: bool,
    hp,
    qlvl_act=None,
    act_search: int = 0,
    axis_name: str = "data",
):
    """Mesh-parallel variant of ``ptq.admm.calibrate_layer``: the Gram
    statistics accumulate across the mesh (one psum over ICI), then the
    same ADMM runs on the merged stats.  Same return contract.

    The per-layer ADMM itself is O(c1k^2) on small matrices and stays
    single-program; the device-memory-bound part of calibration — im2col +
    Gram accumulation over the calibration volume — is what scales
    (src/models/solver.py:282-314 is the loop being spread out)."""
    from ..ptq.admm import calibrate_from_stats

    alpha_act = None
    act_k = jnp.int32(0)
    if qlvl_act is not None:
        if act_search:
            # offset-grid search, mirroring ptq.admm.calibrate_layer: pick
            # the shift k whose jointly-optimal scale minimizes the input
            # reconstruction error (ties keep the unsigned grid)
            delta = 1.0 / (qlvl_act - 1)
            best = (None, None, None)
            for k in range(min(int(act_search), qlvl_act - 1) + 1):
                lo = -k * delta
                a_k, b_k = _jitted_project(x, qlvl_act, lo, lo + 1.0)
                d = (x - a_k * b_k).ravel()
                err = float(jnp.vdot(d, d,
                                     precision=jax.lax.Precision.HIGHEST))
                if best[0] is None or err < best[0]:
                    best = (err, k, (a_k, b_k))
            _, k, (a_act, b_act) = best
            act_k = jnp.int32(k)
        else:
            a_act, b_act = _jitted_project(x, qlvl_act, 0.0, 1.0)
        alpha_act = a_act
        x = a_act * b_act
    stats = sharded_gram_stats(mesh, x, y_fp, att, ksize, stride, padding,
                               dilation, has_bias=has_bias,
                               axis_name=axis_name)
    if jax.process_count() > 1:
        # the merged Grams are mesh-global (replicated) arrays; the ADMM
        # below runs as a process-local jit over local operands, which
        # cannot mix with non-addressable-device arrays — pull the
        # (replicated, hence locally materializable) stats to host first
        stats = GramStats(
            *[np.asarray(l) for l in (stats.A_att, stats.B_att, stats.A_unw,
                                      stats.B_unw, stats.yy_att,
                                      stats.yy_unw)],
            stats.has_bias, stats.numel_y)
    res = calibrate_from_stats(stats, x, y_fp, kernel, bias, att,
                               ksize=ksize, stride=stride, padding=padding,
                               dilation=dilation, qlvl_w=qlvl_w,
                               has_bias=has_bias, hp=hp)
    return {**res, "alpha_act": alpha_act, "act_k": act_k}
