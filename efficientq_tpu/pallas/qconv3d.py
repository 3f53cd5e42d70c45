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


def _qconv3d_kernel(scale_ref, *refs, H, W, D, dil, tz, out_dtype,
                    has_res, res_relu, quant_qlvl, pool):
    """refs = tz + 2*dil int8 plane refs, [res_ref], then w_ref, b_ref,
    o_ref[, pool_ref].

    Each program computes ``tz`` output z-planes from tz + 2*dil input
    planes (z-tiling: an input plane is fetched by ~(tz+2dil)/tz programs
    instead of 3, cutting HBM read amplification).

    Padding is handled HERE, not by an XLA jnp.pad pass: plane taps arrive
    UNPADDED with z-clamped index maps, the H/W halo is padded in VMEM,
    and out-of-range z taps are masked off the accumulator.  The XLA pad
    was measured at ~1 ms per 64-cube conv (sublane-shift-bound, ~50x the
    bandwidth cost) — one per int8 conv in the serving graph.

    Epilogues (graph-fused by pallas/epilogue.py so the custom call stops
    being an XLA fusion barrier):
      has_res    — residual operand streamed in at the output tiling,
                   added before the cast (the ResBlock 'add').
      quant_qlvl — emit the NEXT int8 conv's activation codes directly:
                   round(clip(y*(n-1)/alpha_next, 0, n-1)) as int8.  The
                   relu preceding an act-quant folds into the clip-at-0,
                   so conv->relu->act-quant leaves the kernel as one int8
                   write (4x less HBM than a f32 write + re-read)."""
    plane_refs = refs[:tz + 2 * dil]
    rest = refs[tz + 2 * dil:]
    res_ref = rest[0] if has_res else None
    pool_ref = None
    if pool:
        *head, pool_ref = rest[1 if has_res else 0:]
        w_ref, sb_ref, o_ref = head
    else:
        w_ref, sb_ref, o_ref = rest[1 if has_res else 0:]
    # sb_ref: (2, O) f32 — row 0 the scale (per-tensor broadcast or
    # per-output-channel under channel_wise), row 1 the bias.  Elementwise
    # f32 multiply, so the broadcast form is bit-identical to the old
    # scalar-SMEM scale.
    zi = pl.program_id(1)
    # H/W halo in VMEM, once per fetched plane (shared by its (z, kd) uses)
    padded = [jnp.pad(p[0, 0], ((dil, dil), (dil, dil), (0, 0)))
              for p in plane_refs]
    for z in range(tz):
        acc = None
        for kd in range(3):
            qa = padded[z + kd * dil]  # (Hp, Wp, C) int8
            # one dot per kh tap (K = 3C) instead of one K = 9C dot: the
            # padded MXU work is identical (K pads to 128-lane tiles either
            # way) but the im2col scratch shrinks 3x, which is what lets
            # the 64^3-plane residual epilogue fit the VMEM budget
            part = None
            for kh in range(3):
                cols = jnp.concatenate(
                    [qa[kh * dil:kh * dil + H, kw * dil:kw * dil + W, :]
                     .reshape(H * W, -1) for kw in range(3)], axis=1)
                d_kh = jnp.dot(cols, w_ref[kd, kh],
                               preferred_element_type=jnp.int32)
                part = d_kh if part is None else part + d_kh
            # zero the contribution when this tap's z-plane is out of range
            # (the index map clamped it to a valid plane)
            z_in = zi * tz + z + (kd - 1) * dil
            part = jnp.where((z_in >= 0) & (z_in <= D - 1), part, 0)
            acc = part if acc is None else acc + part
        y = (acc.astype(jnp.float32) * sb_ref[0] + sb_ref[1]).reshape(H, W, -1)
        if has_res:
            r = res_ref[0, z].astype(jnp.float32)
            if res_relu:
                # the streamed operand is the PRE-relu stage activation
                # (pallas/epilogue.py::_elide_relus); relu commutes with the
                # bf16 cast, so this matches relu-then-stream exactly
                r = jnp.maximum(r, 0.0)
            y = y + r
        if quant_qlvl:
            # same op sequence as the XLA act-quant (divide, clip, scale,
            # round) so a f32 producer is bit-exact with the unfused path;
            # scale_ref[0] = the consumer's alpha_act
            q = jnp.clip(y / scale_ref[0], 0.0, 1.0) * (quant_qlvl - 1)
            o_ref[0, z] = jnp.round(q).astype(jnp.int8)
        else:
            o_ref[0, z] = y.astype(out_dtype)
        if pool:
            # TransDown maxpool(2) epilogue: the encoder's downsample pass
            # re-reads this conv's full-stage output (~1 ms at 64^3);
            # emitting the pooled planes here removes that pass.  max
            # commutes with the monotone out_dtype cast, so pooling the f32
            # accumulator equals pooling the cast output bit-for-bit.
            yp = jnp.max(y.reshape(H // 2, 2, W // 2, 2, -1), axis=(1, 3))
            if tz == 1:
                # z-pairs span two consecutive programs: the pooled output
                # block's index map (zi // 2) keeps ONE block live across
                # both (the TPU grid runs sequentially), so the odd program
                # read-modify-writes the even program's row
                @pl.when(zi % 2 == 0)
                def _store():
                    pool_ref[0, 0] = yp.astype(out_dtype)

                @pl.when(zi % 2 != 0)
                def _merge():
                    pool_ref[0, 0] = jnp.maximum(pool_ref[0, 0],
                                                 yp.astype(out_dtype))
            elif z % 2 == 0:
                pool_row = yp
            else:
                pool_ref[0, z // 2] = jnp.maximum(pool_row,
                                                  yp).astype(out_dtype)


def _qconv3d_ring_kernel(scale_ref, plane_ref, *refs, H, W, D, out_dtype,
                         has_res, res_relu, quant_qlvl, pool, O, taps,
                         k9=False):
    """Ring-accumulator variant (dil=1): ONE program per INPUT plane.

    The plane-per-output formulation wastes the MXU's N dimension on
    narrow nets: a (H·W, 3C)×(3C, O) dot at O=32 uses 32 of 128 output
    lanes, and every input plane is im2col'd + multiplied by up to 3
    programs.  This kernel instead computes each input plane's partial
    contribution ONCE, with the three kd taps PACKED INTO N — a single
    (H·W, 3C)×(3C, 3O) dot per kh tap (N = 96/128 lanes at O=32, 3× the
    MXU efficiency) — and scatters the three kd slices into a rotating
    3-slot int32 accumulator held in VMEM scratch across the sequential
    grid.  Output plane z finalizes (scale/bias + epilogues) one program
    after its last contributing input plane.

    Column packing: the weight matrix is pre-permuted per plane-residue
    r = u mod 3 (w_ref[r]) so that tap kd's columns land at slot
    (u + 1 - kd) mod 3 — the accumulate is ONE full-width add, no dynamic
    lane slicing (Mosaic cannot express that).

    Integer accumulation is exact, so outputs are bit-identical to the
    plane-per-output kernel and to the XLA integer conv.

    refs = [res_ref], w_ref (3, 3, 3C, 3O), sb_ref, o_ref[, pool_ref],
    acc_ref (scratch: (H·W, 3O) int32)."""
    rest = list(refs)
    res_ref = rest.pop(0) if has_res else None
    w_ref, sb_ref, o_ref = rest[0], rest[1], rest[2]
    pool_ref = rest[3] if pool else None
    acc_ref = rest[-1]
    zi = pl.program_id(1)

    @pl.when(zi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # 1) accumulate input plane u = zi (when it exists): one padded im2col,
    #    3 kh dots at N = 3O (or one K=9C dot under k9), one full-width add
    #    into the rotating slots.  The pad + im2col stay INSIDE the residue
    #    branches: hoisting them out (r5 experiment) kept all three kh
    #    blocks live at once — +0.26 ms/call measured AND a scoped-vmem
    #    compile OOM on the pool variant.  Do not re-hoist.
    for r in range(3):
        @pl.when((zi < D) & (zi % 3 == r))
        def _accum(r=r):
            qa = jnp.pad(plane_ref[0, 0], ((1, 1), (1, 1), (0, 0)))
            part = None
            if k9:
                # K-packed im2col: ONE (H·W, 9C) block and ONE dot — the
                # MXU accumulates across the K tiles internally, so the
                # two full-width partial adds of the per-kh form (each a
                # VMEM read-modify-write of the (H·W, 3O) i32 part)
                # disappear
                cols9 = jnp.concatenate(
                    [qa[kh:kh + H, kw:kw + W, :].reshape(H * W, -1)
                     for kh in range(3) for kw in range(3)], axis=1)
                part = jnp.dot(cols9, w_ref[r],
                               preferred_element_type=jnp.int32)
            elif taps:
                # tap-dot form: one (H·W, C) x (C, 3O) dot per (kh, kw) tap,
                # NO lane-dim concatenate.  MEASURED 1.69x SLOWER than the
                # concat form at the serving geometry (docs/kernels.md,
                # scripts/ring_tap_bench.py): at K = C = 32 every dot still
                # pads K to 128 lanes, so MXU passes triple while each
                # shifted-slice reshape still materializes its copy.  Kept
                # behind ring='taps' for re-testing on future toolchains.
                for kh in range(3):
                    for kw in range(3):
                        d = jnp.dot(
                            qa[kh:kh + H, kw:kw + W, :].reshape(H * W, -1),
                            w_ref[r, kh, kw],
                            preferred_element_type=jnp.int32)
                        part = d if part is None else part + d
            else:
                for kh in range(3):
                    cols = jnp.concatenate(
                        [qa[kh:kh + H, kw:kw + W, :].reshape(H * W, -1)
                         for kw in range(3)], axis=1)
                    d_kh = jnp.dot(cols, w_ref[r, kh],
                                   preferred_element_type=jnp.int32)
                    part = d_kh if part is None else part + d_kh
            if r == 0:
                # plane 0's kd=2 tap targets output z = -1 (conv zero
                # padding): its packed columns (slot 2) must not pollute
                # the slot that z=2 will reuse.  The symmetric case — the
                # last plane's kd=0 tap targeting z = D — lands in a slot
                # that never finalizes again, so it needs no mask.
                col = jax.lax.broadcasted_iota(jnp.int32, part.shape, 1)
                part = jnp.where((zi == 0) & (col >= 2 * O), 0, part)
            acc_ref[...] = acc_ref[...] + part

    # 2) finalize output plane z = zi - 1 (its kd=2 tap was plane zi);
    #    slot (z mod 3) is complete — epilogue, write, zero for reuse
    for s in range(3):
        @pl.when((zi >= 1) & ((zi - 1) % 3 == s))
        def _finalize(s=s):
            z = zi - 1
            acc = acc_ref[:, s * O:(s + 1) * O]
            y = (acc.astype(jnp.float32) * sb_ref[0]
                 + sb_ref[1]).reshape(H, W, -1)
            if has_res:
                rr = res_ref[0, 0].astype(jnp.float32)
                if res_relu:
                    rr = jnp.maximum(rr, 0.0)
                y = y + rr
            if quant_qlvl:
                q = jnp.clip(y / scale_ref[0], 0.0, 1.0) * (quant_qlvl - 1)
                o_ref[0, 0] = jnp.round(q).astype(jnp.int8)
            else:
                o_ref[0, 0] = y.astype(out_dtype)
            if pool:
                yp = jnp.max(y.reshape(H // 2, 2, W // 2, 2, -1),
                             axis=(1, 3))

                @pl.when(z % 2 == 0)
                def _store():
                    pool_ref[0, 0] = yp.astype(out_dtype)

                @pl.when(z % 2 != 0)
                def _merge():
                    pool_ref[0, 0] = jnp.maximum(pool_ref[0, 0],
                                                 yp.astype(out_dtype))
            acc_ref[:, s * O:(s + 1) * O] = jnp.zeros(
                (H * W, O), jnp.int32)


def _qconv3d_ring_tz_kernel(scale_ref, p0_ref, *refs, H, W, D, out_dtype,
                            has_res, res_relu, quant_qlvl, pool, O, TZ,
                            k9=False):
    """Multi-plane ring kernel: TZ input planes + TZ output planes per
    program, grid (n, D // TZ).

    Same ring-slot algebra as `_qconv3d_ring_kernel` (slot = output z mod
    3, kd taps packed into the dot's N dim via `_ring_weight_perm`), but
    the per-program fixed costs — DMA issue, grid sequencing, the
    revisited-output-block handling — amortize over TZ planes, and the
    output/residual/pool blocks become ALIGNED (1, TZ, ...) blocks with
    no cross-program revisits (measured r4: the single-plane ring's
    per-program overhead was ~2-4 us against a ~1-3 us data floor, i.e.
    the 64^3 serving convs ran 1.8-2.8x over their stream floor).

    Program zi:
        accumulate plane 0                    (zi == 0 only; extra ref)
        for k in 0..TZ-1:
            accumulate input plane u = zi*TZ + k + 1     (skipped at u=D)
            finalize output z = u - 1 into o_ref[0, k]

    Every input plane is read exactly once across the grid; outputs are
    bit-identical to the other kernels (integer accumulation is exact).

    refs = TZ plane refs, [res_ref], w_ref (3, 3, 3C, 3O), sb_ref,
    o_ref[, pool_ref][, pool_scratch], acc_ref."""
    rest = list(refs)
    planes = [rest.pop(0) for _ in range(TZ)]
    res_ref = rest.pop(0) if has_res else None
    w_ref, sb_ref, o_ref = rest[0], rest[1], rest[2]
    pool_ref = rest[3] if pool else None
    pool_scr = rest[-2] if pool else None
    acc_ref = rest[-1]
    zi = pl.program_id(1)

    @pl.when(zi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def im2col(raw):
        qa = jnp.pad(raw, ((1, 1), (1, 1), (0, 0)))
        if k9:
            # K-packed form: one (H·W, 9C) block, one dot per plane (the
            # MXU accumulates across K tiles — no partial adds)
            return jnp.concatenate(
                [qa[kh:kh + H, kw:kw + W, :].reshape(H * W, -1)
                 for kh in range(3) for kw in range(3)], axis=1)
        return [jnp.concatenate(
            [qa[kh:kh + H, kw:kw + W, :].reshape(H * W, -1)
             for kw in range(3)], axis=1) for kh in range(3)]

    def tap_dot(cols, r):
        if k9:
            return jnp.dot(cols, w_ref[r], preferred_element_type=jnp.int32)
        part = None
        for kh in range(3):
            d_kh = jnp.dot(cols[kh], w_ref[r, kh],
                           preferred_element_type=jnp.int32)
            part = d_kh if part is None else part + d_kh
        return part

    @pl.when(zi == 0)
    def _first_plane():
        # plane 0 (residue 0), with its kd=2 tap (output z = -1, the conv's
        # zero padding) masked off slot 2 — same mask as the 1-plane kernel
        part = tap_dot(im2col(p0_ref[0, 0]), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, part.shape, 1)
        part = jnp.where(col >= 2 * O, 0, part)
        acc_ref[...] = acc_ref[...] + part

    for k in range(TZ):
        u = zi * TZ + k + 1
        # im2col INSIDE the residue branches: hoisting it out keeps all
        # kh blocks live together — measured +0.26 ms/call and a
        # scoped-vmem compile OOM on the pool variant (r5)
        for r in range(3):
            @pl.when((u < D) & (u % 3 == r))
            def _acc(r=r, k=k):
                acc_ref[...] = acc_ref[...] + tap_dot(
                    im2col(planes[k][0, 0]), r)
        # finalize output z = u - 1 (all three of its taps accumulated)
        z = zi * TZ + k
        for s in range(3):
            @pl.when(z % 3 == s)
            def _fin(s=s, k=k):
                acc = acc_ref[:, s * O:(s + 1) * O]
                y = (acc.astype(jnp.float32) * sb_ref[0]
                     + sb_ref[1]).reshape(H, W, -1)
                if has_res:
                    rr = res_ref[0, k].astype(jnp.float32)
                    if res_relu:
                        rr = jnp.maximum(rr, 0.0)
                    y = y + rr
                if quant_qlvl:
                    q = (jnp.clip(y / scale_ref[0], 0.0, 1.0)
                         * (quant_qlvl - 1))
                    o_ref[0, k] = jnp.round(q).astype(jnp.int8)
                else:
                    o_ref[0, k] = y.astype(out_dtype)
                if pool:
                    # TZ is even: the z-pair lives within one program —
                    # stash the even plane's pooled rows in VMEM scratch,
                    # merge + write on the odd plane (k parity == z parity
                    # since TZ is even)
                    yp = jnp.max(y.reshape(H // 2, 2, W // 2, 2, -1),
                                 axis=(1, 3))
                    if k % 2 == 0:
                        pool_scr[...] = yp
                    else:
                        pool_ref[0, k // 2] = jnp.maximum(
                            pool_scr[...], yp).astype(out_dtype)
                acc_ref[:, s * O:(s + 1) * O] = jnp.zeros(
                    (H * W, O), jnp.int32)


def _ring_weight_perm(w_mat: jax.Array, o: int) -> jax.Array:
    """(3, 3, 3C, O) per-(kd, kh) im2col weights -> (3, 3, 3C, 3O) packed
    variants: w_perm[r] places tap kd's columns at slot (r + 1 - kd) % 3,
    so a plane with residue r scatters its kd partials into the ring
    accumulator with ONE aligned add."""
    parts = []
    for r in range(3):
        blocks = [None] * 3
        for kd in range(3):
            blocks[(r + 1 - kd) % 3] = w_mat[kd]
        parts.append(jnp.concatenate(blocks, axis=-1))
    return jnp.stack(parts)


def _ring_weight_perm_k9(w_codes: jax.Array, o: int) -> jax.Array:
    """(3, 3, 3, C, O) DHWIO codes -> (3, 9C, 3O) per-residue K-packed
    matrices: rows ordered (kh, kw, c) to match the single 9C im2col
    concat; tap kd's columns at slot (r + 1 - kd) % 3 (same ring slot
    algebra as `_ring_weight_perm`)."""
    w9 = w_codes.reshape(3, -1, o)  # (kd, 9C, O), kh-major rows
    parts = []
    for r in range(3):
        blocks = [None] * 3
        for kd in range(3):
            blocks[(r + 1 - kd) % 3] = w9[kd]
        parts.append(jnp.concatenate(blocks, axis=-1))  # (9C, 3O)
    return jnp.stack(parts)


def _ring_weight_perm_taps(w_codes: jax.Array, o: int) -> jax.Array:
    """(3, 3, 3, C, O) DHWIO codes -> (3, 3, 3, C, 3O) per-residue tap
    matrices for the tap-dot ring kernel: w[r, kh, kw] places tap kd's
    columns at slot (r + 1 - kd) % 3 (same ring slot algebra as
    `_ring_weight_perm`, without the kw-minor im2col concat)."""
    parts = []
    for r in range(3):
        blocks = [None] * 3
        for kd in range(3):
            blocks[(r + 1 - kd) % 3] = w_codes[kd]  # (3, 3, C, O)
        parts.append(jnp.concatenate(blocks, axis=-1))  # (3, 3, C, 3O)
    return jnp.stack(parts)


@functools.partial(jax.jit, static_argnames=("qlvl_act", "dilation",
                                             "interpret", "out_dtype",
                                             "quant_qlvl", "x_quantized",
                                             "residual_relu", "pool",
                                             "ring"))
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
    residual: Optional[jax.Array] = None,
    quant_alpha=None,
    quant_qlvl: int = 0,
    x_quantized: bool = False,
    residual_relu: bool = False,
    pool: bool = False,
    ring: str = "auto",
) -> jax.Array:
    """y = conv3d(int8_codes(x), w_codes) * scale + bias, stride 1,
    padding = dilation ('same'), one fused Pallas program per output plane.

    x: (N, D, H, W, C) float32; w_codes: (3, 3, 3, C, O) int8 (DHWIO codes
    from ptq/deploy.py); scale = alpha_act*alpha_w/((na-1)(nw-1)).

    Fused epilogues (see pallas/epilogue.py):
      residual               — (N, D, H, W, O) operand added to y in VMEM
      quant_alpha/quant_qlvl — emit relu+act-quant int8 codes for the next
                               conv (output dtype int8); quant_alpha is its
                               alpha_act
      x_quantized            — x already holds int8 codes (the producer
                               emitted them); skip the XLA act-quant
      pool                   — ALSO emit maxpool-2x2x2 planes as a second
                               output (the TransDown downsample); returns
                               (y, y_pool).  Never combined with the quant
                               epilogue (different consumers).

    ring selects the accumulator formulation (bit-exact in every case):
      'auto'  — ring kernel where the kd-packed dot reduces padded MXU
                work (narrow nets, dil 1, VMEM fits), else z-tiled kernel;
                multi-plane (TZ) ring where depth/VMEM allow
      'off'   — always the z-tiled kernel
      'force' — always the ring kernel (multi-plane where it fits)
      'ring1' — ring kernel pinned to ONE plane per program (the r4
                kernel; kept for A/B against the multi-plane form)
      'taps'  — single-plane ring with tap-dot im2col (9 small dots, no
                lane concat) — measured 1.69x SLOWER on this toolchain
                (scripts/ring_tap_bench.py); kept for future-toolchain A/B

    A fused-lane (H, W*C) layout variant was tried for the low-C stages
    (it would remove the C->128 lane padding): Mosaic cannot lower its
    (H, W*C)->(H*W, C) shape cast (lane-dim change), so the layout is a
    dead end as of this toolchain — don't re-attempt without checking.
    """
    n, d, h, w_sp, c = x.shape
    kd, kh, kw, c2, o = w_codes.shape
    assert (kd, kh, kw) == (3, 3, 3) and c2 == c
    dil = int(dilation)
    if bias is None:
        bias = jnp.zeros((o,), jnp.float32)

    if x_quantized:
        qa = x  # int8 codes from the producer's fused epilogue
    else:
        # act-quant in XLA (fuses into one pass over the producing op's
        # output); int8 thereafter.  NO jnp.pad here — the kernel pads in
        # VMEM (see _qconv3d_kernel docstring).
        qa = jnp.round(jnp.clip(x / alpha_act, 0.0, 1.0)
                       * (qlvl_act - 1)).astype(jnp.int8)
    # per-(kd, kh) im2col weight layout: (kw, C) rows, matching the
    # kernel's kw-minor concat of C-column slices
    w_mat = w_codes.reshape(3, 3, 3 * c, o)
    # (2, O) VMEM row pair: [scale, bias].  scale may be per-tensor
    # (broadcast) or per-output-channel (channel_wise deploy)
    sb = jnp.stack([jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32), (o,)), bias.astype(jnp.float32)])
    # SMEM meta: the consumer's alpha_act for the quant epilogue
    qalpha = (jnp.asarray(quant_alpha, jnp.float32) if quant_qlvl
              else jnp.float32(1.0))
    scale1 = qalpha.reshape(1)
    hp, wp = h + 2 * dil, w_sp + 2 * dil
    out_bytes = 1 if quant_qlvl else jnp.dtype(out_dtype).itemsize
    res_bytes = jnp.dtype(residual.dtype).itemsize if residual is not None else 0

    # z-tile: TZ output planes per program, bounded by a VMEM budget that
    # accounts for the 128-lane channel padding (C=32 tiles pad 4x)
    def _pad128(v):
        return -(-v // 128) * 128

    def est_vmem(t, rb):
        return ((t + 2 * dil) * h * w_sp * _pad128(c) * 2  # raw planes x2
                + (t + 2 * dil) * hp * wp * _pad128(c)     # padded copies
                + t * h * w_sp * _pad128(o) * out_bytes * 2  # out x2
                + t * h * w_sp * _pad128(o) * rb * 2         # residual x2
                + h * w_sp * _pad128(3 * c)                  # im2col block
                + h * w_sp * _pad128(o) * 4                  # i32 accumulator
                + (t * h * w_sp * _pad128(o) * out_bytes // 4
                   if pool else 0))                          # pooled out x2

    assert not (pool and quant_qlvl), \
        "pool and quant epilogues have different consumers"

    tz = 1
    if h * w_sp >= 1024:  # tiny planes: per-z overhead beats the read saving
        for t in (8, 4, 2):
            if d % t == 0 and est_vmem(t, res_bytes) < 9 * 1024 * 1024:
                tz = t
                break

    if est_vmem(1, 0) > 12 * 1024 * 1024 or (
            not interpret and (c < 32 or o < 32)):
        # Route to the XLA realization of the same fused semantics when
        # (a) the plane exceeds the per-program VMEM budget even at tz=1
        # (e.g. 128x128 planes of a whole-volume 256^2 serving pass —
        # H/W-splitting would need 1-row halos that block-granular
        # BlockSpec offsets cannot express), or (b) the channel counts are
        # below a vector register (C/O < 32): Mosaic fails to lower the
        # im2col reshape at toy widths (measured: the 4-channel tiny-net
        # drive dies in the remote compiler), and such layers are a
        # rounding error of the FLOPs anyway — every preset's 3^3 convs
        # are >= 32 channels.
        return _xla_qconv3x3(qa, w_codes, bias, scale, dil, out_dtype,
                             residual, residual_relu, qalpha, quant_qlvl,
                             pool)

    if pool and (d % 2 or h % 2 or w_sp % 2):
        # pooling needs even dims (tz=1 pairs planes ACROSS programs via
        # the revisited output block); otherwise conv then pool in XLA
        y = qconv3x3_int8_ndhwc(
            x, w_codes, bias, alpha_act, scale, qlvl_act, dilation=dilation,
            interpret=interpret, out_dtype=out_dtype, residual=residual,
            x_quantized=x_quantized, residual_relu=residual_relu)
        return y, _xla_maxpool2(y)

    # Ring-accumulator variant (see _qconv3d_ring_kernel): engage where the
    # kd-packed dot reduces padded MXU work — narrow nets (pad128(3O) <
    # 3·pad128(O), i.e. O <= 85: 3× at O<=42, 1.5× at O<=64), dil 1, real
    # planes — and the rotating accumulator fits VMEM.  Bit-exact either
    # way; 'force'/'off' pin the choice (tests, A/B timing).
    def est_ring_vmem(rb):
        return (h * w_sp * _pad128(3 * o) * 4 * 2  # ring acc + dot temp
                + h * w_sp * _pad128(c) * 2        # raw plane x2
                + hp * wp * _pad128(c)             # padded copy
                + h * w_sp * _pad128(3 * c)        # im2col block
                + h * w_sp * _pad128(o) * 4        # y f32
                + h * w_sp * _pad128(o) * out_bytes * 2  # out x2
                + h * w_sp * _pad128(o) * rb * 2         # residual x2
                + (h * w_sp * _pad128(o) * out_bytes // 2 if pool else 0))

    use_ring = _HAS_PLTPU and dil == 1 and d >= 2 and (
        ring in ("force", "taps", "ring1", "k9")
        or (ring == "auto" and h * w_sp >= 1024
            and _pad128(3 * o) < 3 * _pad128(o)
            and est_ring_vmem(res_bytes) < 13 * 1024 * 1024))
    # 'taps' forces the ring with tap-dot im2col (9 small dots, no lane
    # concat); 'ring1' pins one plane per program (A/B vs multi-plane);
    # 'k9' packs all 9 taps into ONE K=9C dot (no partial adds)
    use_taps = ring == "taps"
    use_k9 = ring == "k9"

    # multi-plane ring (TZ input + TZ output planes per program): the
    # per-program fixed cost (~2-4 us measured r4) amortizes over TZ and
    # the out/residual blocks become aligned — engaged when depth divides
    # and the extra live blocks fit VMEM (budget tuned on hardware)
    def est_ring_tz_vmem(t, rb):
        return ((t + 1) * h * w_sp * _pad128(c) * 2      # plane refs + p0
                + t * hp * wp * _pad128(c)               # padded copies
                + 3 * h * w_sp * _pad128(3 * c)          # hoisted im2col
                + h * w_sp * _pad128(3 * o) * 4 * 2      # ring acc + temp
                + h * w_sp * _pad128(o) * 4              # y f32
                + t * h * w_sp * _pad128(o) * out_bytes * 2   # out block x2
                + t * h * w_sp * _pad128(o) * rb * 2          # residual x2
                + (h * w_sp * _pad128(o) * (4 + out_bytes) // 4
                   if pool else 0))                      # pool scr + out

    ring_tz = 1
    if use_ring and not use_taps and ring != "ring1":
        import os as _os

        pin = _os.environ.get("EFFQ_RING_TZ")  # A/B: pin TZ, skip the est
        if pin:
            t = int(pin)
            if d % t == 0 and d > t:
                ring_tz = t
        else:
            for t in (4, 2):
                if (d % t == 0 and d > t
                        and est_ring_tz_vmem(t, res_bytes)
                        < 14 * 1024 * 1024):
                    ring_tz = t
                    break
    if use_ring and ring_tz > 1:
        kernel = functools.partial(
            _qconv3d_ring_tz_kernel, H=h, W=w_sp, D=d, out_dtype=out_dtype,
            has_res=residual is not None, res_relu=residual_relu,
            quant_qlvl=quant_qlvl, pool=pool, O=o, TZ=ring_tz, k9=use_k9)
        plane_spec = [
            pl.BlockSpec((1, 1, h, w_sp, c),
                         lambda ni, zi, _k=k: (
                             ni, jnp.clip(zi * ring_tz + _k + 1, 0, d - 1),
                             0, 0, 0))
            for k in range(ring_tz)
        ]
        res_spec = ([pl.BlockSpec((1, ring_tz, h, w_sp, o),
                                  lambda ni, zi: (ni, zi, 0, 0, 0))]
                    if residual is not None else [])
        res_arg = [residual] if residual is not None else []
        out_specs = [pl.BlockSpec((1, ring_tz, h, w_sp, o),
                                  lambda ni, zi: (ni, zi, 0, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct(
            (n, d, h, w_sp, o), jnp.int8 if quant_qlvl else out_dtype)]
        scratch = [pltpu.VMEM((h * w_sp, 3 * o), jnp.int32)]
        if pool:
            out_specs.append(pl.BlockSpec(
                (1, ring_tz // 2, h // 2, w_sp // 2, o),
                lambda ni, zi: (ni, zi, 0, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct(
                (n, d // 2, h // 2, w_sp // 2, o), out_dtype))
            scratch.insert(0, pltpu.VMEM((h // 2, w_sp // 2, o),
                                         jnp.float32))
        out = pl.pallas_call(
            kernel,
            grid=(n, d // ring_tz),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret
                else pl.BlockSpec((1,), lambda ni, zi: (0,)),
                pl.BlockSpec((1, 1, h, w_sp, c),
                             lambda ni, zi: (ni, 0, 0, 0, 0)),
                *plane_spec,
                *res_spec,
                (pl.BlockSpec((3, 9 * c, 3 * o),
                              lambda ni, zi: (0, 0, 0)) if use_k9
                 else pl.BlockSpec((3, 3, 3 * c, 3 * o),
                                   lambda ni, zi: (0, 0, 0, 0))),
                pl.BlockSpec((2, o), lambda ni, zi: (0, 0)),
            ],
            out_specs=out_specs if pool else out_specs[0],
            out_shape=out_shape if pool else out_shape[0],
            scratch_shapes=scratch,
            interpret=interpret,
        )(scale1, qa, *([qa] * ring_tz), *res_arg,
          _ring_weight_perm_k9(w_codes, o) if use_k9
          else _ring_weight_perm(w_mat, o), sb)
        return tuple(out) if pool else out
    if use_ring:
        kernel = functools.partial(_qconv3d_ring_kernel, H=h, W=w_sp, D=d,
                                   out_dtype=out_dtype,
                                   has_res=residual is not None,
                                   res_relu=residual_relu,
                                   quant_qlvl=quant_qlvl, pool=pool, O=o,
                                   taps=use_taps, k9=use_k9)
        res_spec = ([pl.BlockSpec(
            (1, 1, h, w_sp, o),
            lambda ni, zi: (ni, jnp.clip(zi - 1, 0, d - 1), 0, 0, 0))]
            if residual is not None else [])
        res_arg = [residual] if residual is not None else []
        out_specs = [pl.BlockSpec(
            (1, 1, h, w_sp, o),
            lambda ni, zi: (ni, jnp.maximum(zi - 1, 0), 0, 0, 0))]
        out_shape = [jax.ShapeDtypeStruct(
            (n, d, h, w_sp, o), jnp.int8 if quant_qlvl else out_dtype)]
        if pool:
            # pooled block index (zi-1)//2 stays live across the z-pair's
            # two programs (sequential grid); odd z max-merges the even row
            out_specs.append(pl.BlockSpec(
                (1, 1, h // 2, w_sp // 2, o),
                lambda ni, zi: (ni, jnp.maximum(zi - 1, 0) // 2, 0, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct(
                (n, d // 2, h // 2, w_sp // 2, o), out_dtype))
        out = pl.pallas_call(
            kernel,
            grid=(n, d + 1),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret
                else pl.BlockSpec((1,), lambda ni, zi: (0,)),
                pl.BlockSpec((1, 1, h, w_sp, c),
                             lambda ni, zi: (ni, jnp.clip(zi, 0, d - 1),
                                             0, 0, 0)),
                *res_spec,
                (pl.BlockSpec((3, 3, 3, c, 3 * o),
                              lambda ni, zi: (0, 0, 0, 0, 0)) if use_taps
                 else pl.BlockSpec((3, 9 * c, 3 * o),
                                   lambda ni, zi: (0, 0, 0)) if use_k9
                 else pl.BlockSpec((3, 3, 3 * c, 3 * o),
                                   lambda ni, zi: (0, 0, 0, 0))),
                pl.BlockSpec((2, o), lambda ni, zi: (0, 0)),
            ],
            out_specs=out_specs if pool else out_specs[0],
            out_shape=out_shape if pool else out_shape[0],
            scratch_shapes=[pltpu.VMEM((h * w_sp, 3 * o), jnp.int32)],
            interpret=interpret,
        )(scale1, qa, *res_arg,
          _ring_weight_perm_taps(w_codes, o) if use_taps
          else _ring_weight_perm_k9(w_codes, o) if use_k9
          else _ring_weight_perm(w_mat, o), sb)
        return tuple(out) if pool else out

    if residual is not None and est_vmem(tz, res_bytes) > 12 * 1024 * 1024:
        # residual block doesn't fit VMEM at this geometry (e.g. 64^3
        # planes with an f32 operand): run the kernel without it and let
        # XLA do the add — one extra elementwise pass, still correct
        assert not quant_qlvl, "residual+quant epilogues are never combined"
        y = qconv3x3_int8_ndhwc(
            x, w_codes, bias, alpha_act, scale, qlvl_act, dilation=dilation,
            interpret=interpret, out_dtype=out_dtype,
            x_quantized=x_quantized)
        res = residual.astype(y.dtype)
        if residual_relu:
            res = jnp.maximum(res, 0)
        y = y + res
        return (y, _xla_maxpool2(y)) if pool else y

    kernel = functools.partial(_qconv3d_kernel, H=h, W=w_sp, D=d, dil=dil,
                               tz=tz, out_dtype=out_dtype,
                               has_res=residual is not None,
                               res_relu=residual_relu,
                               quant_qlvl=quant_qlvl, pool=pool)
    # z taps clamped into range; the kernel masks the out-of-range ones
    plane_spec = [
        pl.BlockSpec((1, 1, h, w_sp, c),
                     lambda ni, zi, _k=k: (ni, jnp.clip(zi * tz + _k - dil,
                                                        0, d - 1), 0, 0, 0))
        for k in range(tz + 2 * dil)
    ]
    res_spec = ([pl.BlockSpec((1, tz, h, w_sp, o),
                              lambda ni, zi: (ni, zi, 0, 0, 0))]
                if residual is not None else [])
    res_arg = [residual] if residual is not None else []
    out = pl.pallas_call(
        kernel,
        grid=(n, d // tz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM) if _HAS_PLTPU and not interpret
            else pl.BlockSpec((1,), lambda ni, zi: (0,)),
            *plane_spec,
            *res_spec,
            pl.BlockSpec((3, 3, 3 * c, o), lambda ni, zi: (0, 0, 0, 0)),
            pl.BlockSpec((2, o), lambda ni, zi: (0, 0)),
        ],
        out_specs=(
            [pl.BlockSpec((1, tz, h, w_sp, o),
                          lambda ni, zi: (ni, zi, 0, 0, 0)),
             pl.BlockSpec((1, max(tz // 2, 1), h // 2, w_sp // 2, o),
                          (lambda ni, zi: (ni, zi, 0, 0, 0)) if tz > 1
                          else (lambda ni, zi: (ni, zi // 2, 0, 0, 0)))]
            if pool else
            pl.BlockSpec((1, tz, h, w_sp, o),
                         lambda ni, zi: (ni, zi, 0, 0, 0))),
        out_shape=(
            [jax.ShapeDtypeStruct((n, d, h, w_sp, o), out_dtype),
             jax.ShapeDtypeStruct((n, d // 2, h // 2, w_sp // 2, o),
                                  out_dtype)]
            if pool else
            jax.ShapeDtypeStruct(
                (n, d, h, w_sp, o), jnp.int8 if quant_qlvl else out_dtype)),
        interpret=interpret,
    )(scale1, *([qa] * (tz + 2 * dil)), *res_arg, w_mat, sb)
    return tuple(out) if pool else out


def _xla_qconv3x3(qa, w_codes, bias, scale, dil, out_dtype, residual,
                  residual_relu, qalpha, quant_qlvl, pool):
    """XLA realization of the kernel's exact semantics (integer conv +
    scale/bias + residual/quant/pool epilogues) for geometries whose planes
    exceed the per-program VMEM budget.  Same math, same dtypes — the
    pallas_call is an optimization, never a requirement."""
    from .. import ops

    y = ops.conv3d(qa, w_codes, None, (1, 1, 1), (dil, dil, dil),
                   (dil, dil, dil), 1, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * jnp.asarray(scale, jnp.float32) + bias
    if residual is not None:
        r = residual.astype(jnp.float32)
        if residual_relu:
            r = jnp.maximum(r, 0.0)
        y = y + r
    if quant_qlvl:
        q = jnp.clip(y / qalpha, 0.0, 1.0) * (quant_qlvl - 1)
        return jnp.round(q).astype(jnp.int8)
    y = y.astype(out_dtype)
    return (y, _xla_maxpool2(y)) if pool else y


def _xla_maxpool2(y: jax.Array) -> jax.Array:
    """2x2x2/2 max pool (the fallback for the pool epilogue)."""
    return jax.lax.reduce_window(
        y, (jnp.finfo(y.dtype).min if jnp.issubdtype(y.dtype, jnp.floating)
            else jnp.iinfo(y.dtype).min),
        jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")
