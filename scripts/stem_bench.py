#!/usr/bin/env python3
"""Microbench: the unquantized stem conv vs its space-to-depth rewrite.

The int8 serving graph's largest remaining device cost is the FP stem
(docs/kernels.md: 6.0 ms/volume at 18x128^3x4, stride 2) — MXU-starved at
4 input channels.  Measures, on the real chip:

  A  ops.conv3d stride-2 (current serving stem)
  B  ops.stem_s2d_conv3d (phase-into-channels rewrite)
  +Q variants with the relu+act-quant epilogue fused (emitting the first
     interior conv's int8 codes), approximating the deployed neighborhood.

Timing returns a scalar checksum (sync numbers through the dev tunnel are
transfer-bound otherwise).
"""
import sys
import time
import os.path as P

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import ops


def timeit(fn, *args, iters=20):
    fn(*args).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    r.block_until_ready()
    return (time.time() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("brats 18x128^3x4 s(2,2,2)", (18, 128, 128, 128, 4), 32, (2, 2, 2)),
        ("lits 18x(192,128,64)x1 s(2,2,1)", (18, 192, 128, 64, 1), 32,
         (2, 2, 1)),
    ]
    for name, xshape, o, s in cases:
        x = jnp.asarray(rng.standard_normal(xshape), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, xshape[-1], o)),
                        jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
        alpha = jnp.float32(0.7)

        @jax.jit
        def conv_a(x, k, b):
            y = ops.conv3d(x, k, b, stride=s, padding=1,
                           preferred_element_type=jnp.float32)
            return jnp.sum(y[..., 0])

        @jax.jit
        def conv_b(x, k, b):
            y = ops.stem_s2d_conv3d(x, k, b, stride=s,
                                    preferred_element_type=jnp.float32)
            return jnp.sum(y[..., 0])

        @jax.jit
        def conv_aq(x, k, b):
            y = ops.conv3d(x, k, b, stride=s, padding=1,
                           preferred_element_type=jnp.float32)
            q = jnp.round(jnp.clip(y / alpha, 0., 1.) * 3).astype(jnp.int8)
            return jnp.sum(q.astype(jnp.int32))

        @jax.jit
        def conv_bq(x, k, b):
            y = ops.stem_s2d_conv3d(x, k, b, stride=s,
                                    preferred_element_type=jnp.float32)
            q = jnp.round(jnp.clip(y / alpha, 0., 1.) * 3).astype(jnp.int8)
            return jnp.sum(q.astype(jnp.int32))

        # rewrite correctness on hardware (bf16 operands)
        ya = jax.jit(lambda x, k, b: ops.conv3d(
            x, k, b, stride=s, padding=1,
            preferred_element_type=jnp.float32))(x, k, b)
        yb = jax.jit(lambda x, k, b: ops.stem_s2d_conv3d(
            x, k, b, stride=s,
            preferred_element_type=jnp.float32))(x, k, b)
        err = float(jnp.abs(ya - yb).max())

        ta = timeit(conv_a, x, k, b)
        tb = timeit(conv_b, x, k, b)
        taq = timeit(conv_aq, x, k, b)
        tbq = timeit(conv_bq, x, k, b)
        print(f"{name}: conv {ta:.2f} ms -> s2d {tb:.2f} ms "
              f"({ta / tb:.2f}x); +quant {taq:.2f} -> {tbq:.2f} ms "
              f"({taq / tbq:.2f}x); max|diff| {err:.3g}", flush=True)


if __name__ == "__main__":
    main()
