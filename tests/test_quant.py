"""Quant math core: golden-value and oracle tests (reference formulas at
src/models/layer_helper.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientq_tpu.quant import (
    discretize, fake_quant_act, fake_quant_weight, pack_int_weight,
    project_by_iter, project_by_iter_np, ste_round, unpack_int_weight,
)


def test_discretize_grid_values():
    x = jnp.array([-2.0, -1.0, -0.4, -0.1, 0.0, 0.3, 0.6, 1.0, 5.0])
    # 4 levels in [-1, 1]: grid {-1, -1/3, 1/3, 1}
    q = discretize(x, 4, -1.0, 1.0)
    grid = np.array([-1, -1 / 3, 1 / 3, 1])
    for v in np.asarray(q):
        assert np.min(np.abs(grid - v)) < 1e-6
    # clamping
    assert q[0] == -1.0 and q[-1] == 1.0
    # unsigned 4-level in [0,1]: grid {0, 1/3, 2/3, 1}
    qa = discretize(jnp.array([0.49, 0.51, -3.0, 3.0]), 4, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(qa), [1 / 3, 2 / 3, 0.0, 1.0], atol=1e-6)


def test_discretize_matches_naive_torch_formula():
    # mirror layer_helper.py:25-37 numerically with numpy
    rng = np.random.RandomState(0)
    x = rng.randn(1000).astype(np.float32)
    for num_lvl, lo, hi in [(4, -1, 1), (16, -1, 1), (256, 0, 1), (2, 0, 1)]:
        delta = (hi - lo) / (num_lvl - 1)
        ref = np.round((np.clip(x, lo, hi) - lo) / delta) * delta + lo
        got = np.asarray(discretize(jnp.asarray(x), num_lvl, lo, hi))
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_ste_round_gradient_passthrough():
    g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(jnp.array([0.2, 1.7]))
    np.testing.assert_allclose(np.asarray(g), [3.0, 3.0])
    gd = jax.grad(lambda x: jnp.sum(discretize(x, 4, -1.0, 1.0)))(
        jnp.array([0.2, -0.7]))
    np.testing.assert_allclose(np.asarray(gd), [1.0, 1.0])


@pytest.mark.parametrize("num_lvl,lo,hi", [(4, -1.0, 1.0), (16, -1.0, 1.0),
                                           (4, 0.0, 1.0), (256, -1.0, 1.0)])
def test_project_by_iter_matches_f64_oracle(num_lvl, lo, hi):
    rng = np.random.RandomState(42)
    if lo == 0.0:
        var = np.abs(rng.randn(8, 16, 3)).astype(np.float32)
    else:
        var = rng.randn(8, 16, 3).astype(np.float32)
    a_ref, b_ref = project_by_iter_np(var, num_lvl, lo, hi)
    a, b = jax.jit(lambda v: project_by_iter(v, num_lvl, lo, hi))(jnp.asarray(var))
    assert abs(float(a) - a_ref) / abs(a_ref) < 1e-3
    # codes should agree almost everywhere (boundary ties can differ)
    agree = np.mean(np.abs(np.asarray(b) - b_ref) < 1e-5)
    assert agree > 0.99


def test_project_by_iter_reduces_mse_vs_naive_scale():
    rng = np.random.RandomState(7)
    var = rng.randn(64, 27).astype(np.float32) * 0.1
    a, b = project_by_iter(jnp.asarray(var), 4, -1.0, 1.0)
    opt_err = float(jnp.mean((a * b - var) ** 2))
    naive_a = float(np.abs(var).max())
    naive_q = np.asarray(discretize(jnp.asarray(var) / naive_a, 4, -1, 1)) * naive_a
    naive_err = float(np.mean((naive_q - var) ** 2))
    assert opt_err < naive_err


def test_int_pack_roundtrip():
    rng = np.random.RandomState(3)
    for num_lvl in (4, 16, 256, 1024):
        alpha = 0.37
        w = rng.randn(4, 3, 3, 3, 8).astype(np.float32)
        qw = np.asarray(fake_quant_weight(jnp.asarray(w), alpha, num_lvl))
        packed = pack_int_weight(qw, alpha, num_lvl)
        assert packed.dtype == (np.uint8 if num_lvl <= 256 else np.int32)
        restored = unpack_int_weight(packed, alpha, num_lvl)
        np.testing.assert_allclose(restored, qw, atol=1e-5)


def test_fake_quant_act_levels():
    x = jnp.linspace(-1, 3, 100)
    q = np.asarray(fake_quant_act(x, 2.0, 4))
    grid = np.array([0.0, 2 / 3, 4 / 3, 2.0])
    assert np.all(np.min(np.abs(q[:, None] - grid[None, :]), axis=1) < 1e-5)
