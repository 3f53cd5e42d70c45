"""XLA-native 3D NN primitives in NDHWC layout.

The TPU-friendly layout is channels-last (channels ride the 128-wide lane
dimension; spatial dims fold into sublanes), so every op here takes/returns
``(N, D, H, W, C)`` tensors and conv kernels in ``(kD, kH, kW, Cin, Cout)``
(DHWIO).  The reference uses torch NCDHW + OIDHW; converters live in
``models/torch_io.py``.

Oracle parity (verified in tests/test_ops.py against torch CPU):
- conv3d       <-> F.conv3d            (src/models/PTQConv.py:156)
- max_pool3d   <-> nn.MaxPool3d        (src/models/factory_blk.py:105-107)
- upsample3d   <-> nn.Upsample(mode='trilinear', align_corners=False)
                                        (src/models/model_blk.py:186)
- avg_pool3d / max_pool3d on masks <-> F.avg_pool3d / F.max_pool3d
                                        (src/ptqer.py:149-150,166-167)
- batch_norm   <-> nn.BatchNorm3d      (eval + train modes)
- dropout3d    <-> nn.Dropout3d        (channelwise)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntOr3 = Union[int, Sequence[int]]


def triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, (int, np.integer)):
        return (int(v),) * 3
    t = tuple(int(x) for x in v)
    if len(t) == 1:
        return t * 3
    assert len(t) == 3, f"expected 3-tuple, got {v}"
    return t


_DIMNUMS_CACHE = {}


def conv3d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    dilation: IntOr3 = 1,
    groups: int = 1,
    precision=None,
    preferred_element_type=None,
) -> jax.Array:
    """3D convolution, NDHWC activations x DHWIO kernel -> NDHWC.

    ``precision``: None lets XLA pick (bf16 multiplies on MXU, f32 accumulate)
    — right for training; pass ``jax.lax.Precision.HIGHEST`` for calibration
    paths that need f32-exact parity.
    """
    stride = triple(stride)
    padding = triple(padding)
    dilation = triple(dilation)
    pad = [(p, p) for p in padding]
    key = (len(x.shape), len(kernel.shape))
    dn = _DIMNUMS_CACHE.get(key)
    if dn is None:
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
        _DIMNUMS_CACHE[key] = dn
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
    if bias is not None:
        y = y + bias
    return y


def stem_s2d_conv3d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOr3 = 2,
    precision=None,
    preferred_element_type=None,
) -> jax.Array:
    """The strided 3^3 stem conv, reformulated as space-to-depth + a small
    stride-1 conv — same arithmetic, MXU-friendly shapes.

    The network's first conv (src/models/UResQNet.py conv0: 1-4 input
    channels, stride 2) starves the MXU: its contraction reads 4 lanes of
    the 128-lane systolic array.  Decomposing each stride-2 dim into
    (block, phase) and folding the phase into channels turns it into a
    2-tap valid conv over 8x the channels (e.g. BraTS: K = 4 x 27 taps
    spread over 4 lanes  ->  K = 32 x 8 taps over 32 lanes), which XLA
    tiles onto the MXU like any interior conv.  Exact up to f32 summation
    order.

    Requirements: kernel (3, 3, 3, C, O), dilation 1, 'same' padding for
    the given stride (pad 1), per-dim stride in {1, 2}.

    Status: library op, NOT wired into the serving stem.  Measured on a
    v5e (scripts/stem_bench.py) the rewrite is 2.5-3.3x SLOWER than
    XLA's native strided conv at the UResQ stem geometries — the phase
    slices/concat of 4-lane channel-minor tensors cost more than the MXU
    starvation they fix (docs/kernels.md "remaining int8 top costs").
    Kept for geometries with deeper stems where the trade may flip.
    """
    s = triple(stride)
    assert kernel.shape[:3] == (3, 3, 3) and all(st in (1, 2) for st in s)
    n, d, h, w_sp, c = x.shape
    o = kernel.shape[4]
    dims = (d, h, w_sp)
    outs = [(dim + 1) // 2 if st == 2 else dim for dim, st in zip(dims, s)]
    # padded length: stride 2 -> 2*(out+1) so phase slices give out+1
    # blocks (valid 2-tap conv -> out); stride 1 -> dim+2 ('same', 3 taps)
    pads = ([(0, 0)]
            + [(1, 2 * ou + 1 - dim) if st == 2 else (1, 1)
               for dim, st, ou in zip(dims, s, outs)]
            + [(0, 0)])
    xp = jnp.pad(x, pads)

    # phase combos, outermost dim first; slice order must match the
    # channel-block order used to assemble the equivalent kernel below
    phase_sets = [tuple(range(2)) if st == 2 else (0,) for st in s]
    kb = [2 if st == 2 else 3 for st in s]  # block-tap counts
    phases = [(pd, ph, pw) for pd in phase_sets[0] for ph in phase_sets[1]
              for pw in phase_sets[2]]
    parts = []
    for pd, ph, pw in phases:
        sl = xp
        if s[0] == 2:
            sl = sl[:, pd::2]
        if s[1] == 2:
            sl = sl[:, :, ph::2]
        if s[2] == 2:
            sl = sl[:, :, :, pw::2]
        parts.append(sl)
    x2 = jnp.concatenate(parts, axis=-1)

    # equivalent kernel (traceable jnp assembly — `kernel` is a live
    # parameter): block tap b at phase p covers the original tap
    # t = 2b + p (stride 2) / t = b (stride 1); taps beyond the 3-tap
    # support contribute zero
    zero = jnp.zeros((c, o), kernel.dtype)
    rows = []
    for bd in range(kb[0]):
        cols_h = []
        for bh in range(kb[1]):
            cols_w = []
            for bw in range(kb[2]):
                chunks = []
                for pd, ph, pw in phases:
                    td = 2 * bd + pd if s[0] == 2 else bd
                    th = 2 * bh + ph if s[1] == 2 else bh
                    tw = 2 * bw + pw if s[2] == 2 else bw
                    chunks.append(kernel[td, th, tw]
                                  if td <= 2 and th <= 2 and tw <= 2
                                  else zero)
                cols_w.append(jnp.concatenate(chunks, axis=0))
            cols_h.append(jnp.stack(cols_w))
        rows.append(jnp.stack(cols_h))
    w2 = jnp.stack(rows)  # (kb_d, kb_h, kb_w, P*C, O)
    return conv3d(x2, w2, bias, stride=1, padding=0, dilation=1,
                  precision=precision,
                  preferred_element_type=preferred_element_type)


def max_pool3d(x: jax.Array, kernel: IntOr3, stride: Optional[IntOr3] = None) -> jax.Array:
    """Max pooling over D,H,W of an NDHWC tensor (VALID padding, like torch
    MaxPool3d with padding=0, ceil_mode=False)."""
    k = triple(kernel)
    s = triple(stride) if stride is not None else k
    window = (1, k[0], k[1], k[2], 1)
    strides = (1, s[0], s[1], s[2], 1)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(x, init, jax.lax.max, window, strides, "VALID")


def avg_pool3d(x: jax.Array, kernel: IntOr3, stride: Optional[IntOr3] = None) -> jax.Array:
    """Average pooling over D,H,W of an NDHWC tensor (VALID padding)."""
    k = triple(kernel)
    s = triple(stride) if stride is not None else k
    window = (1, k[0], k[1], k[2], 1)
    strides = (1, s[0], s[1], s[2], 1)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, "VALID")
    return summed / float(np.prod(k))


def upsample3d(x: jax.Array, scale_factor: IntOr3) -> jax.Array:
    """Trilinear upsampling of an NDHWC tensor by integer factors.

    Matches torch ``nn.Upsample(scale_factor, mode='trilinear',
    align_corners=False)`` — both use the half-pixel-center convention.
    """
    f = triple(scale_factor)
    n, d, h, w, c = x.shape
    new_shape = (n, d * f[0], h * f[1], w * f[2], c)
    return jax.image.resize(x, new_shape, method="trilinear")


def upsample3d_cf(x: jax.Array, scale_factor: IntOr3) -> jax.Array:
    """Trilinear upsampling of an NCDHW tensor (channels-first serving tail;
    see nnir ``upsample_cf``).  Same half-pixel convention as upsample3d."""
    f = triple(scale_factor)
    n, c, d, h, w = x.shape
    new_shape = (n, c, d * f[0], h * f[1], w * f[2])
    return jax.image.resize(x, new_shape, method="trilinear")


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Inference-mode batch norm over the channel (last) axis."""
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + bias


def batch_norm_train(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """Training-mode batch norm: normalize with biased batch stats, update
    running stats with the *unbiased* batch variance (torch semantics).

    Returns (y, new_running_mean, new_running_var).
    """
    axes = (0, 1, 2, 3)
    batch_mean = jnp.mean(x, axis=axes)
    batch_var = jnp.mean(jnp.square(x - batch_mean), axis=axes)
    count = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    unbiased = batch_var * (count / max(count - 1, 1))
    y = (x - batch_mean) * jax.lax.rsqrt(batch_var + eps) * scale + bias
    new_mean = (1.0 - momentum) * running_mean + momentum * batch_mean
    new_var = (1.0 - momentum) * running_var + momentum * unbiased
    return y, new_mean, new_var


def dropout3d(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Channelwise (Dropout3d) dropout for NDHWC: zero whole (sample, channel)
    feature volumes with prob ``rate``, scale survivors by 1/(1-rate)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0], 1, 1, 1, x.shape[-1])
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return jnp.where(mask, x / keep, 0.0)


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


# ---------------------------------------------------------------------------
# layout converters (host-side boundaries; data arrives NCDHW like torch)
# ---------------------------------------------------------------------------

def ncdhw_to_ndhwc(x):
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def ndhwc_to_ncdhw(x):
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def oidhw_to_dhwio(k):
    """torch conv3d kernel (O, I, kD, kH, kW) -> JAX DHWIO."""
    return jnp.transpose(k, (2, 3, 4, 1, 0))


def dhwio_to_oidhw(k):
    return jnp.transpose(k, (4, 3, 0, 1, 2))
