"""Mesh-sharded PTQ calibration statistics.

The reference accumulates the per-layer least-squares Grams sample-by-sample
on one GPU (src/models/solver.py:282-314).  The single-chip TPU rewrite
already chunks the output-depth axis on device (ptq/solver.py); here the
same decomposition is spread across a ``jax.sharding.Mesh``: each device
im2cols its own depth slab (with kernel halo) and accumulates a local
A/B Gram, then ONE ``psum`` over the mesh axis merges the accumulators —
the collective moves O(c1k^2) bytes once, never the activation columns.

This makes calibration of very large volumes (LiTS whole-liver crops,
c1k ~= 13.8k) scale to a pod slice: activations stay sharded, only the
sufficient statistics ride the ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ptq.solver import GramStats, compute_gram_stats


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
    N = x.shape[0]
    Do, Ho, Wo = y.shape[1:4]
    c2 = y.shape[-1]

    # per-device output-depth chunk (last device's tail is masked off via
    # compute_gram_stats(valid_depth=...))
    k = -(-Do // n_dev)
    in_d = (k - 1) * sD + (kD - 1) * lD + 1

    xp = jnp.pad(x, ((0, 0), (pD, pD), (pH, pH), (pW, pW), (0, 0)))
    need = (n_dev * k - 1) * sD + (kD - 1) * lD + 1
    if need > xp.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1]),
                          (0, 0), (0, 0), (0, 0)))
    # stack per-device slabs along a leading mesh axis
    x_slabs = jnp.stack([
        jax.lax.slice_in_dim(xp, i * k * sD, i * k * sD + in_d, axis=1)
        for i in range(n_dev)])                       # (n_dev, N, in_d, ...)
    y_pad = jnp.pad(y, ((0, 0), (0, n_dev * k - Do), (0, 0), (0, 0), (0, 0)))
    y_slabs = jnp.stack([y_pad[:, i * k:(i + 1) * k] for i in range(n_dev)])
    if att is not None:
        a_pad = jnp.pad(att, ((0, 0), (0, n_dev * k - Do), (0, 0), (0, 0)))
        a_slabs = jnp.stack([a_pad[:, i * k:(i + 1) * k]
                             for i in range(n_dev)])
    else:
        a_slabs = None
    n_valid = jnp.clip(Do - k * jnp.arange(n_dev), 0, k).astype(jnp.int32)

    sharded = NamedSharding(mesh, P(axis_name))
    with_att = a_slabs is not None

    def local(x_s, y_s, a_s, nv):
        s = compute_gram_stats(
            x_s[0], y_s[0], a_s[0] if with_att else None,
            ksize, stride, (0, 0, 0), dilation, has_bias,
            valid_depth=nv[0])
        parts = (s.A_att, s.B_att, s.A_unw, s.B_unw, s.yy_att, s.yy_unw)
        return tuple(jax.lax.psum(p, axis_name) for p in parts)

    if not with_att:  # keep a uniform arity; the dummy is never read
        a_slabs = jnp.zeros((n_dev, 1), jnp.float32)
    run = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis_name),) * 4, out_specs=P()))
    A_a, B_a, A_u, B_u, yy_a, yy_u = run(
        jax.device_put(x_slabs, sharded), jax.device_put(y_slabs, sharded),
        jax.device_put(a_slabs, sharded), jax.device_put(n_valid, sharded))
    return GramStats(A_a, B_a, A_u, B_u, yy_a, yy_u, has_bias,
                     int(np.prod(y.shape)))
