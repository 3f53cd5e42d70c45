"""Pallas TPU kernel: the space-to-depth stem conv (serving fast path).

The network's init conv (src/models/model_blk.py:109-124; ours
models/uresq.py conv0) is a 3x3x3 stride-2 conv on the raw C=4 volume.
On TPU this geometry is hostile three ways (profiled on the flagship
serving graph, docs/kernels.md):

  - the XLA conv wants a bespoke input layout -> a 3.8 ms relayout copy
    of the patch stack,
  - C_in=4 starves the 128-lane MXU tiles -> 6.0 ms for 14.5 GFLOP,
  - its f32 output feeds a separate relu + act-quant dual-output pass
    (bf16 residual branch + int8 codes for block1) -> 3.0 ms.

The fix is algebraic: a stride-2 3^3 conv equals a stride-1 2^3 conv on
the space-to-depth transform of the input (each 2x2x2 phase block becomes
8C=32 channels, kernel taps redistributed over the phases; 27 of the 64
dense 2^3-kernel slots are nonzero).  That moves the stem onto exactly
the geometry this package's int8 kernels already win at — 64^3 planes,
32 channels, K=128 im2col dots — and the whole chain

    s2d(volume) -> extract patches -> conv+bias+relu -> (bf16, int8 codes)

becomes one volume-level XLA pass plus one fused Pallas kernel with a
dual-output epilogue.

Grid alignment: H/W patch starts must be even (true for the standard
128-overlap-16 grids); z starts may be odd — odd-start patches read the
same s2d volume with the z-taps' phase roles swapped, implemented as a
second weight layout selected per patch by a parity scalar (plus a
phase-lane mask on the first output plane, where the kd=0 tap falls on
the conv's zero padding but the s2d plane holds real out-of-patch data).
This keeps the patch grid bit-identical to the reference's rule
(eval/sliding.py::grid_starts) — no alignment compromise.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


# (tap, phase) -> original kernel index along one axis, for a patch whose
# start is even/odd on that axis.  Derivation: output voxel z' taps original
# offsets 2z'+k-1 (k in 0..2); in (plane u, phase p) coordinates with a
# leading zero-pad plane for the even case, both cases read planes
# {t, t+1} at t = z'.  None = structurally zero slot.
_MAP_EVEN = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
_MAP_ODD = {(0, 0): 0, (0, 1): 1, (1, 0): 2}


def s2d_stem_weights(w3: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(3,3,3,C,O) stem kernel -> two (2, 32C, O) s2d-space im2col weight
    matrices (even-z-start and odd-z-start patch variants).

    Row order matches the kernel's im2col lanes: (kh2, kw2, pz, py, px, c)
    — the s2d channel index is ((pz*2+py)*2+px)*C + c."""
    kd, kh, kw, c, o = w3.shape
    assert (kd, kh, kw) == (3, 3, 3)

    def build(mz):
        w2 = np.zeros((2, 2, 2, 2, 2, 2, c, o), w3.dtype)
        for kd2 in range(2):
            for pz in range(2):
                k0 = mz.get((kd2, pz))
                if k0 is None:
                    continue
                for kh2 in range(2):
                    for py in range(2):
                        k1 = _MAP_EVEN.get((kh2, py))
                        if k1 is None:
                            continue
                        for kw2 in range(2):
                            for px in range(2):
                                k2 = _MAP_EVEN.get((kw2, px))
                                if k2 is None:
                                    continue
                                w2[kd2, kh2, kw2, pz, py, px] = w3[k0, k1, k2]
        # (kd2, (kh2, kw2, pz, py, px, c), o)
        return w2.reshape(2, 2 * 2 * 8 * c, o)

    return build(_MAP_EVEN), build(_MAP_ODD)


def s2d_volume(image: jax.Array, min_planes: int = 0,
               dtype=jnp.bfloat16) -> jax.Array:
    """(N, D, H, W, C) -> (N, ceil(D/2), H/2, W/2, 8C) space-to-depth,
    zero-padding D to even (and to ``min_planes``, for odd-start patches
    whose last tap reaches one plane past ceil(D/2)).

    Measured TPU cost of this pass on a BraTS volume, standalone: 14.9 ms
    as written (XLA materializes a channel-minor relayout + a full-volume
    pad first) or 6.3 ms expressed as a stride-2 one-hot conv — and both
    get WORSE embedded in the serving graph (layout assignment flips the
    neighbors); see docs/kernels.md for why the s2d serving path is
    opt-in."""
    n, d, h, w, c = image.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    dp = max(d + (d % 2), 2 * min_planes)
    if dp != d:
        image = jnp.pad(image, ((0, 0), (0, dp - d), (0, 0), (0, 0), (0, 0)))
    x = image.reshape(n, dp // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, dp // 2, h // 2, w // 2, 8 * c).astype(dtype)


def s2d_supported(starts, patch_size, vol_shape, attrs) -> bool:
    """The fast path covers the standard stem geometry: 3^3 stride-2 pad-1
    dense conv, even patch dims, even H/W grid starts."""
    pd, ph, pw = patch_size
    return (attrs["kernel_size"] == (3, 3, 3)
            and attrs["stride"] == (2, 2, 2)
            and attrs["padding"] == (1, 1, 1)
            and attrs["dilation"] == (1, 1, 1) and attrs["groups"] == 1
            and pd % 2 == 0 and ph % 2 == 0 and pw % 2 == 0
            and vol_shape[1] % 2 == 0 and vol_shape[2] % 2 == 0
            and all(j % 2 == 0 and k % 2 == 0 for (_, j, k) in starts))


def s2d_need_planes(starts, patch_size) -> int:
    """s2d planes required to serve this grid (odd-z-start patches read one
    plane past ceil(D/2)) — the ``min_planes`` for the host transform."""
    pd = patch_size[0]
    return max(((i - 1) // 2 + pd // 2 + 1) for (i, _, _) in starts)


def extract_pre_s2d_patches(svol: jax.Array, starts,
                            patch_size) -> Tuple[jax.Array, jax.Array]:
    """extract_s2d_patches for a volume ALREADY in s2d space (the host
    transform path, data/native.py::s2d_bf16): no device-side
    pad/reshape/transpose — the 14.9 ms pass that made on-device s2d a
    net loss (docs/kernels.md) never runs.  Use with
    ``sliding_window_inference(extract_fn=..., vol_shape=<original>)``."""
    pd = patch_size[0]
    assert svol.shape[1] >= s2d_need_planes(starts, patch_size), \
        (svol.shape, "s2d volume too shallow for this grid — pass " \
         "min_planes=s2d_need_planes(...) to the host transform")
    return _slice_s2d(svol, starts, patch_size)


def prestacked_s2d_extract(stack: jax.Array, starts,
                           patch_size) -> Tuple[jax.Array, jax.Array]:
    """extract_fn for a patch stack ALREADY built on the host
    (data/native.py::s2d_patches_bf16): the device runs zero extraction —
    no slicing, no plane-minor DUS assembly, no relayout copy for the
    Pallas stem operand (~2.1 ms/volume on the flagship).  ``stack`` is
    (P*N, pd/2+1, ph/2, pw/2, 8C); only the parity vector is derived."""
    pd = patch_size[0]
    assert stack.shape[1] == pd // 2 + 1, (stack.shape, patch_size)
    n = stack.shape[0] // len(starts)
    parities = np.asarray([i % 2 for (i, _, _) in starts], np.int32)
    return stack, jnp.asarray(np.repeat(parities, n))


def extract_s2d_patches(image: jax.Array, starts,
                        patch_size) -> Tuple[jax.Array, jax.Array]:
    """Extract the patch grid directly in s2d space.

    Returns (patches (P*N, pd/2+1, ph/2, pw/2, 8C), parities (P*N,)).
    Each patch carries pd/2+1 planes: plane t and t+1 are the two z-taps of
    output plane t.  Even-z-start patches prepend a physical zero plane
    (their kd=0 tap at z'=0 is the conv's zero padding); odd-z-start
    patches start one plane early in real data and mask in-kernel."""
    pd, ph, pw = patch_size
    svol = s2d_volume(image, min_planes=s2d_need_planes(starts, patch_size))
    return _slice_s2d(svol, starts, patch_size)


def _slice_s2d(svol: jax.Array, starts,
               patch_size) -> Tuple[jax.Array, jax.Array]:
    pd, ph, pw = patch_size
    n = svol.shape[0]
    zero = jnp.zeros((n, 1, ph // 2, pw // 2, svol.shape[-1]), svol.dtype)
    pieces: List[jax.Array] = []
    for (i, j, k) in starts:
        js, ks = j // 2, k // 2
        if i % 2 == 0:
            body = svol[:, i // 2:i // 2 + pd // 2,
                        js:js + ph // 2, ks:ks + pw // 2]
            pieces.append(jnp.concatenate([zero, body], axis=1))
        else:
            pieces.append(svol[:, (i - 1) // 2:(i - 1) // 2 + pd // 2 + 1,
                          js:js + ph // 2, ks:ks + pw // 2])
    patches = jnp.stack(pieces)  # (P, N, pd/2+1, ...)
    parities = np.asarray([i % 2 for (i, _, _) in starts], np.int32)
    parities = jnp.asarray(np.repeat(parities, n))
    return patches.reshape(-1, *patches.shape[2:]), parities


def _stem_kernel(meta_ref, par_ref, *refs, H, W, C8, tz, qlvl, out_dtype):
    """refs = tz+1 plane refs, w_even, w_odd, b, o_bf, o_s8.

    Per output plane: two K=4*C8 im2col dots (kd2 taps) on the MXU with f32
    accumulation, + bias + relu; emits BOTH the bf16/f32 activation (the
    ResBlock residual branch) and the next conv's int8 activation codes
    (relu folded into the quantize clip) — the XLA path needs a separate
    dual-output pass over 8x64^3x32 for this."""
    planes = refs[:tz + 1]
    w_even, w_odd, b_ref, obf_ref, os8_ref = refs[tz + 1:]
    ni = pl.program_id(0)
    zi = pl.program_id(1)
    par = par_ref[ni]
    alpha = meta_ref[0]
    w = jnp.where(par > 0, w_odd[:], w_even[:])  # (2, 4*C8, O)
    padded = [jnp.pad(p[0, 0], ((1, 0), (1, 0), (0, 0))) for p in planes]
    for z in range(tz):
        acc = None
        for kd2 in range(2):
            qa = padded[z + kd2]  # (H+1, W+1, C8)
            cols = jnp.concatenate(
                [qa[kh2:kh2 + H, kw2:kw2 + W, :].reshape(H * W, -1)
                 for kh2 in range(2) for kw2 in range(2)], axis=1)
            if kd2 == 0:
                # odd-parity patches: at z'=0 this tap's pz=0 phase is the
                # conv's zero padding but holds real (out-of-patch) volume
                # data — mask it.  Even patches carry a physically zero
                # plane there instead (extract_s2d_patches).
                zp = zi * tz + z
                lane = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1)
                keep = (zp > 0) | (par == 0) | (lane % C8 >= C8 // 2)
                cols = jnp.where(keep, cols, jnp.zeros_like(cols))
            d = jnp.dot(cols, w[kd2], preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        y = jnp.maximum(acc + b_ref[:], 0.0).reshape(H, W, -1)
        yd = y.astype(out_dtype)
        obf_ref[0, z] = yd
        # quantize the OUT_DTYPE-rounded value: the direct path emits the
        # stem conv at compute_dtype (nnir._eval_conv) and the consumer
        # quantizes that, so rounding first keeps the codes bit-identical
        # (no-op at f32)
        q = jnp.clip(yd.astype(jnp.float32) / alpha, 0.0, 1.0) * (qlvl - 1)
        os8_ref[0, z] = jnp.round(q).astype(jnp.int8)


def _stem_ring_weights(w_even, w_odd):
    """(2, 4C8, O) kd2-tap matrices -> per-residue packed forms for the
    ring kernel.

    Plane u contributes tap kd2=0 to output u (slot u%2) and tap kd2=1 to
    output u-1 (slot (u-1)%2), so the residue-r pack places tap 0 at slot
    r and tap 1 at slot 1-r; a single (H·W, 4C8) x (4C8, 2O) dot then
    lands both taps with ONE full-width accumulate.  ``w_first`` covers
    plane 0 (tap 0 -> slot 0 only; its tap-1 target, output -1, is the
    conv's zero padding and must not pollute slot 1)."""
    def pack(w):
        return jnp.stack([jnp.concatenate([w[0], w[1]], axis=-1),
                          jnp.concatenate([w[1], w[0]], axis=-1)])

    w_first = jnp.concatenate([w_odd[0], jnp.zeros_like(w_odd[0])], axis=-1)
    return pack(w_even), pack(w_odd), w_first


def _stem_ring_kernel(meta_ref, par_ref, p0_ref, plane_ref, wpe_ref,
                      wpo_ref, wf_ref, b_ref, obf_ref, os8_ref, acc_ref,
                      *, H, W, C8, D, qlvl, out_dtype, O):
    """Ring-accumulator stem: ONE program per INPUT plane (grid (b, D)).

    The z-tiled kernel reads each s2d plane twice (taps of outputs t-1 and
    t) at tz=1 — the VMEM budget at the 64^2 flagship geometry blocks
    tz>1, so the stem ran at its 2x-read-amplified floor (2.82 ms vs a
    1.7 ms single-read floor, r5 profile).  Here program zi accumulates
    plane u=zi+1's BOTH taps with one packed dot (see _stem_ring_weights)
    into a 2-slot f32 ring and finalizes output z=zi — every plane read
    once, half the dots.  f32 accumulation order matches the z-tiled
    kernel (tap 0 then tap 1), so outputs are bit-identical."""
    ni = pl.program_id(0)
    zi = pl.program_id(1)
    par = par_ref[ni]
    alpha = meta_ref[0]

    @pl.when(zi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def im2col(raw):
        qa = jnp.pad(raw, ((1, 0), (1, 0), (0, 0)))
        return jnp.concatenate(
            [qa[kh2:kh2 + H, kw2:kw2 + W, :].reshape(H * W, -1)
             for kh2 in range(2) for kw2 in range(2)], axis=1)

    @pl.when(zi == 0)
    def _p0():
        # plane 0: even-parity patches carry a physical zero plane (its
        # contribution is exactly zero whatever the weights); odd-parity
        # patches hold real data whose pz=0 phase lanes are the conv's
        # zero padding at z'=0 — masked, same keep-rule as _stem_kernel
        cols = im2col(p0_ref[0, 0])
        lane = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1)
        cols = jnp.where(lane % C8 >= C8 // 2, cols,
                         jnp.zeros_like(cols))
        acc_ref[...] = acc_ref[...] + jnp.dot(
            cols, wf_ref[...], preferred_element_type=jnp.float32)

    cols = im2col(plane_ref[0, 0])
    for r in range(2):
        @pl.when((zi + 1) % 2 == r)
        def _acc(r=r):
            w = jnp.where(par > 0, wpo_ref[r], wpe_ref[r])
            acc_ref[...] = acc_ref[...] + jnp.dot(
                cols, w, preferred_element_type=jnp.float32)

    for s in range(2):
        @pl.when(zi % 2 == s)
        def _fin(s=s):
            y = jnp.maximum(acc_ref[:, s * O:(s + 1) * O] + b_ref[:],
                            0.0).reshape(H, W, -1)
            yd = y.astype(out_dtype)
            obf_ref[0, 0] = yd
            q = jnp.clip(yd.astype(jnp.float32) / alpha, 0.0, 1.0) \
                * (qlvl - 1)
            os8_ref[0, 0] = jnp.round(q).astype(jnp.int8)
            acc_ref[:, s * O:(s + 1) * O] = jnp.zeros((H * W, O),
                                                      jnp.float32)


@functools.partial(jax.jit, static_argnames=("qlvl_next", "interpret",
                                             "out_dtype", "ring"))
def stem_s2d_conv(
    x: jax.Array,
    parities: jax.Array,
    w_even: jax.Array,
    w_odd: jax.Array,
    bias: jax.Array,
    alpha_next,
    qlvl_next: int,
    interpret: bool = False,
    out_dtype=jnp.float32,
    ring: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Fused s2d stem: (relu(conv(x) + b), int8 codes of the same).

    x: (B, D+1, H, W, 8C) s2d patches from extract_s2d_patches (plane t
    and t+1 are output plane t's z-taps); parities: (B,) int32 z-start
    parity per patch; w_even/w_odd: (2, 32C, O) from s2d_stem_weights;
    alpha_next/qlvl_next: the consumer conv's activation quantizer."""
    b, d1, h, w_sp, c8 = x.shape
    d = d1 - 1
    o = w_even.shape[-1]
    meta = jnp.asarray(alpha_next, jnp.float32).reshape(1)
    par = parities.astype(jnp.int32)

    def _pad128(v):
        return -(-v // 128) * 128

    def est_vmem(t):
        plane = h * w_sp * _pad128(c8) * 2
        padded = (h + 1) * (w_sp + 1) * _pad128(c8) * 2
        out = t * h * w_sp * _pad128(o)
        return ((t + 1) * plane * 2 + (t + 1) * padded
                + out * 2 * 2 + out * 1 * 2       # bf16 + s8 outputs, x2
                + h * w_sp * _pad128(4 * c8) * 2  # im2col block
                + 2 * h * w_sp * _pad128(o) * 4)  # f32 acc + y

    tz = 1
    for t in (8, 4, 2):
        if d % t == 0 and est_vmem(t) < 10 * 1024 * 1024:
            tz = t
            break

    # ring variant (see _stem_ring_kernel): each plane read ONCE, both
    # kd2 taps in one packed dot — engaged when the z-tiled kernel is
    # stuck at tz=1 (its 2x read amplification is then the floor) and the
    # ring working set fits VMEM.  Bit-identical outputs.
    def est_ring_vmem():
        plane = h * w_sp * _pad128(c8) * 2
        return (3 * plane                            # plane ref x2 + p0
                + (h + 1) * (w_sp + 1) * _pad128(c8) * 2   # padded copy
                + h * w_sp * _pad128(4 * c8) * 2     # im2col block
                + 2 * h * w_sp * _pad128(2 * o) * 4  # ring acc + dot out
                + h * w_sp * _pad128(o) * 4          # y f32
                + h * w_sp * _pad128(o) * 2 * 2 * 2  # bf16 out x2 (+ yd)
                + h * w_sp * _pad128(o) * 1 * 2)     # s8 out x2

    # budget calibrated on hardware (scripts/stem_ring_bench.py): the
    # flagship geometry (64^2 planes, C8=O=32) estimates 16.8M here and
    # COMPILES (Mosaic's true stack stays under its 16M scoped limit —
    # the estimate double-counts transients); measured 2.831 -> 2.500
    # ms/volume vs the tz=1 z-tiled kernel.  Larger planes (128^2) blow
    # the estimate 4x and fall back to the z-tiled form.
    use_ring = ring == "force" or (
        ring == "auto" and tz == 1 and d >= 2
        and est_ring_vmem() < 17 * 1024 * 1024 + 512 * 1024)
    if use_ring:
        smem = (pl.BlockSpec(memory_space=pltpu.SMEM)
                if _HAS_PLTPU and not interpret else None)
        wpe, wpo, wf = _stem_ring_weights(w_even, w_odd)
        out = pl.pallas_call(
            functools.partial(_stem_ring_kernel, H=h, W=w_sp, C8=c8, D=d,
                              qlvl=qlvl_next, out_dtype=out_dtype, O=o),
            grid=(b, d),
            in_specs=[
                smem or pl.BlockSpec((1,), lambda ni, zi: (0,)),
                smem or pl.BlockSpec((b,), lambda ni, zi: (0,)),
                pl.BlockSpec((1, 1, h, w_sp, c8),
                             lambda ni, zi: (ni, 0, 0, 0, 0)),
                pl.BlockSpec((1, 1, h, w_sp, c8),
                             lambda ni, zi: (ni, zi + 1, 0, 0, 0)),
                pl.BlockSpec((2, 4 * c8, 2 * o), lambda ni, zi: (0, 0, 0)),
                pl.BlockSpec((2, 4 * c8, 2 * o), lambda ni, zi: (0, 0, 0)),
                pl.BlockSpec((4 * c8, 2 * o), lambda ni, zi: (0, 0)),
                pl.BlockSpec((1, o), lambda ni, zi: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, h, w_sp, o),
                             lambda ni, zi: (ni, zi, 0, 0, 0)),
                pl.BlockSpec((1, 1, h, w_sp, o),
                             lambda ni, zi: (ni, zi, 0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, d, h, w_sp, o), out_dtype),
                jax.ShapeDtypeStruct((b, d, h, w_sp, o), jnp.int8),
            ],
            scratch_shapes=[pltpu.VMEM((h * w_sp, 2 * o), jnp.float32)],
            interpret=interpret,
        )(meta, par, x, x, wpe, wpo, wf,
          bias.reshape(1, o).astype(jnp.float32))
        return tuple(out)

    kernel = functools.partial(_stem_kernel, H=h, W=w_sp, C8=c8, tz=tz,
                               qlvl=qlvl_next, out_dtype=out_dtype)
    plane_spec = [
        pl.BlockSpec((1, 1, h, w_sp, c8),
                     lambda ni, zi, _k=k: (ni, zi * tz + _k, 0, 0, 0))
        for k in range(tz + 1)
    ]
    smem = (pl.BlockSpec(memory_space=pltpu.SMEM)
            if _HAS_PLTPU and not interpret else None)
    out = pl.pallas_call(
        kernel,
        grid=(b, d // tz),
        in_specs=[
            smem or pl.BlockSpec((1,), lambda ni, zi: (0,)),
            smem or pl.BlockSpec((b,), lambda ni, zi: (0,)),
            *plane_spec,
            pl.BlockSpec((2, 4 * c8, o), lambda ni, zi: (0, 0, 0)),
            pl.BlockSpec((2, 4 * c8, o), lambda ni, zi: (0, 0, 0)),
            pl.BlockSpec((1, o), lambda ni, zi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tz, h, w_sp, o), lambda ni, zi: (ni, zi, 0, 0, 0)),
            pl.BlockSpec((1, tz, h, w_sp, o), lambda ni, zi: (ni, zi, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, h, w_sp, o), out_dtype),
            jax.ShapeDtypeStruct((b, d, h, w_sp, o), jnp.int8),
        ],
        interpret=interpret,
    )(meta, par, *([x] * (tz + 1)), w_even, w_odd,
      bias.reshape(1, o).astype(jnp.float32))
    return tuple(out)
