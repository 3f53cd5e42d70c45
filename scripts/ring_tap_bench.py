#!/usr/bin/env python3
"""Microbench: ring int8 conv, concat-im2col vs tap-dot im2col.

docs/kernels.md's roofline puts the 64^3 ring convs ~1.8x over their HBM
stream floor; the named residual is per-program VPU im2col (the 3-way
lane-shuffle concats).  The tap-dot variant (ring='taps') drops the
concats at the price of 3x padded MXU work (~us-scale).  This times one
(mode, case) pair per process — multi-config timing through the dev
tunnel returns garbage (see .claude/skills/verify).

Usage: python scripts/ring_tap_bench.py {force|taps} {quant|res|pool}
"""
import sys
import time
import os.path as P

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu.pallas.qconv3d import qconv3x3_int8_ndhwc


def main():
    mode, case = sys.argv[1], sys.argv[2]
    # the serving graph's 64^3 stage: 8 patches x 64^3, C=32 -> O=32
    n, d, h, w, c, o = 8, 64, 64, 64, 32, 32
    rng = np.random.RandomState(0)
    qa = jnp.asarray(rng.randint(0, 4, size=(n, d, h, w, c)), jnp.int8)
    codes = jnp.asarray(rng.randint(-3, 4, size=(3, 3, 3, c, o)), jnp.int8)
    b = jnp.asarray(rng.randn(o), jnp.float32)
    res = jnp.asarray(rng.randn(n, d, h, w, o), jnp.bfloat16)
    kw = dict(x_quantized=True, ring=mode)
    if case == "quant":     # qconv3x3_int8_ndhwc.10/.18 (1.571 ms each)
        kw.update(quant_alpha=1.7, quant_qlvl=4)
    elif case == "res":     # .19 (2.145 ms): residual+relu, bf16 out
        kw.update(residual=res, residual_relu=True, out_dtype=jnp.bfloat16)
    elif case == "pool":    # .11 (3.004 ms): dual-output pool epilogue
        kw.update(residual=res, pool=True, out_dtype=jnp.bfloat16)
    else:
        raise SystemExit(f"unknown case {case}")

    ITERS = 16

    @jax.jit
    def run(qa, codes, b, seed):
        # seed perturbation: the runtime memoizes (executable, args) pairs
        # across calls, so every timed call must differ in SOME argument
        qa = jnp.clip(qa + seed.astype(jnp.int8), 0, 3)
        # chain ITERS kernel calls with a data dependency: per-call timing
        # through the tunnel is unusable (the runtime memoizes identical
        # pure executions — 20 same-args dispatches return in ~0 device
        # time), so measure one scan whose carry feeds the next call
        def body(carry, _):
            y = qconv3x3_int8_ndhwc(carry, codes, b, 1.0, 0.37, 4, **kw)
            if isinstance(y, tuple):
                y = y[0]
            if y.dtype != jnp.int8:  # re-quantize bf16 outs to feed back
                y = jnp.round(jnp.clip(y.astype(jnp.float32) / 1.7, 0.0,
                                       1.0) * 3).astype(jnp.int8)
            return y, ()

        out, _ = jax.lax.scan(body, qa, None, length=ITERS)
        return jnp.sum(out.astype(jnp.int32))

    run(qa, codes, b, jnp.int32(0)).block_until_ready()
    # wall timing through the dev tunnel is unusable (async + memoized);
    # read device time from the xplane trace like profile_serving.py
    import tempfile

    from profile_serving import top_device_ops

    logdir = tempfile.mkdtemp(prefix=f"ring_tap_{mode}_{case}_")
    with jax.profiler.trace(logdir):
        run(qa, codes, b, jnp.int32(1)).block_until_ready()
    ops, total = top_device_ops(logdir, top=6)
    kern = sum(ms for name, ms in ops if "qconv" in name)
    print(f"{mode:6s} {case:6s} {kern / ITERS:7.3f} ms/call kernel, "
          f"{total / ITERS:7.3f} ms/call device total  "
          f"(checksum={int(run(qa, codes, b, jnp.int32(1)))})")
    for name, ms in ops:
        print(f"   {ms / ITERS:7.3f} ms/call  {name[:90]}")


if __name__ == "__main__":
    main()
