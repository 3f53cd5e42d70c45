"""Pallas kernels in interpreter mode vs the XLA reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import ops
from efficientq_tpu.pallas import fused_qact_matmul, qconv1x1_ndhwc
from efficientq_tpu.quant import fake_quant_act


def test_fused_qact_matmul_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.abs(rng.randn(100, 24)).astype(np.float32))
    w = jnp.asarray(rng.randn(24, 40).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(40).astype(np.float32))
    alpha = 1.3
    ref = fake_quant_act(x, alpha, 4) @ w + b
    got = fused_qact_matmul(x, w, b, alpha, 4, tile_m=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_qconv1x1_matches_conv3d():
    rng = np.random.RandomState(1)
    x = jnp.asarray(np.abs(rng.randn(2, 4, 5, 6, 8)).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 1, 8, 16).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    alpha = 0.9
    # exact oracle: explicit matmul over the channel axis
    ref = jnp.einsum("ndhwc,co->ndhwo", fake_quant_act(x, alpha, 16),
                     k[0, 0, 0], precision=jax.lax.Precision.HIGHEST) + b
    got = qconv1x1_ndhwc(x, k, b, alpha, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)
    # XLA's CPU conv is itself only ~1e-2-close to the exact result, so only
    # sanity-bound against it
    conv = ops.conv3d(fake_quant_act(x, alpha, 16), k, b,
                      precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(conv), atol=2e-2,
                               rtol=2e-2)


def test_fused_int8_matmul_matches_deploy_semantics():
    """Pallas int8 kernel == the deploy-path math (exact integer conv)."""
    from efficientq_tpu.pallas import fused_int8_matmul

    rng = np.random.RandomState(3)
    M, K, N = 70, 12, 20
    na, nw = 4, 4
    x = jnp.asarray(np.abs(rng.randn(M, K)).astype(np.float32))
    alpha_a, alpha_w = 1.1, 0.3
    codes = rng.randint(-(nw - 1), nw, (K, N))
    codes = codes - (codes % 2 == 0)          # odd symmetric codes
    codes = np.clip(codes, -(nw - 1), nw - 1).astype(np.int8)
    b = jnp.asarray(rng.randn(N).astype(np.float32))
    scale = alpha_a * alpha_w / ((na - 1) * (nw - 1))

    qa = np.round(np.clip(np.asarray(x) / alpha_a, 0, 1) * (na - 1))
    ref = (qa @ codes.astype(np.int64)) * scale + np.asarray(b)

    got = fused_int8_matmul(x, jnp.asarray(codes), b, alpha_a, scale, na,
                            tile_m=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)
