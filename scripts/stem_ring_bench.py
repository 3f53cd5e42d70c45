#!/usr/bin/env python3
"""Microbench: s2d stem kernel, z-tiled (2x plane reads at tz=1) vs ring
(each plane read once, both kd2 taps in one packed dot).

Flagship serving geometry: 8 patches x (65 planes, 64, 64, 32ch) bf16 in,
dual (bf16, int8) out.  One (mode) per process — multi-config timing
through the dev tunnel returns garbage (see .claude/skills/verify).

Usage: python scripts/stem_ring_bench.py {off|force}
"""
import sys
import os.path as P

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu.pallas.stem import stem_s2d_conv


def main():
    mode = sys.argv[1]
    b, d, h, w, c8, o = 8, 64, 64, 64, 32, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, d + 1, h, w, c8), jnp.bfloat16)
    par = jnp.asarray((np.arange(b) % 2).astype(np.int32))
    we = jnp.asarray(rng.randn(2, 4 * c8, o) * 0.1, jnp.bfloat16)
    wo = jnp.asarray(rng.randn(2, 4 * c8, o) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(o), jnp.float32)

    ITERS = 16

    @jax.jit
    def run(x, seed):
        xs = x + seed.astype(jnp.bfloat16) * 1e-3

        def body(carry, _):
            y, q = stem_s2d_conv(carry, par, we, wo, bias, 1.7, 4,
                                 out_dtype=jnp.bfloat16, ring=mode)
            # feed back: rebuild a (d+1)-plane bf16 input from the output
            nxt = jnp.concatenate([y[:, :1], y], axis=1)
            return nxt.astype(jnp.bfloat16), jnp.sum(q.astype(jnp.int32))

        out, sums = jax.lax.scan(body, xs, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32)) + jnp.sum(sums)

    run(x, jnp.int32(0)).block_until_ready()
    import tempfile

    from profile_serving import top_device_ops

    logdir = tempfile.mkdtemp(prefix=f"stem_ring_{mode}_")
    with jax.profiler.trace(logdir):
        run(x, jnp.int32(1)).block_until_ready()
    ops, total = top_device_ops(logdir, top=6)
    kern = sum(ms for name, ms in ops if "stem" in name)
    print(f"{mode:6s} {kern / ITERS:7.3f} ms/call stem kernel, "
          f"{total / ITERS:7.3f} ms/call device total  "
          f"(checksum={float(run(x, jnp.int32(1))):.1f})")
    for name, ms in ops:
        print(f"   {ms / ITERS:7.3f} ms/call  {name[:90]}")


if __name__ == "__main__":
    main()
