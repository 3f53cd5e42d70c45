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
