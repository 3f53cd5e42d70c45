"""apply(remat=N): segmented jax.checkpoint execution.

The remat engine must be a pure memory/FLOPs trade: identical outputs,
identical gradients, identical BN-state updates and dropout streams — and
a measurably smaller backward working set (XLA CompiledMemoryStats).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.train.losses import (cross_entropy, head_loss_weights,
                                         multi_output_loss)


def small(drop=0.5):
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=drop, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return graph, variables


@pytest.mark.parametrize("n", [1, 4, 9])
def test_remat_inference_exact(n):
    graph, variables = small(drop=0.0)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 8, 8, 8, 1).astype(np.float32))
    ref = nnir.apply(graph, variables, x)
    out = nnir.apply(graph, variables, x, remat=n)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_remat_negative_rejected():
    graph, variables = small(drop=0.0)
    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    with pytest.raises(ValueError, match="remat"):
        nnir.apply(graph, variables, x, remat=-2)


def test_remat_train_bitwise_state_and_dropout():
    """train=True: BN-state updates and the dropout masks (global node
    index folded into the rng) must not depend on segment boundaries."""
    graph, variables = small(drop=0.5)
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(2, 8, 8, 8, 1).astype(np.float32))
    rng = jax.random.PRNGKey(7)
    ref, ns_ref = nnir.apply(graph, variables, x, train=True, rng=rng)
    out, ns = nnir.apply(graph, variables, x, train=True, rng=rng, remat=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert set(ns) == set(ns_ref)
    for k in ns_ref:
        for f in ("mean", "var"):
            np.testing.assert_array_equal(np.asarray(ns_ref[k][f]),
                                          np.asarray(ns[k][f]))


def _loss_fn(graph, remat):
    hw = head_loss_weights(len(graph.outputs))

    def loss(params, state, x, y, rng):
        out, _ = nnir.apply(graph, {"params": params, "state": state}, x,
                            train=True, rng=rng, remat=remat)
        total, _ = multi_output_loss(cross_entropy, hw,
                                     jnp.moveaxis(out, -1, 2), y)
        return total

    return loss


def test_remat_gradients_match():
    graph, variables = small(drop=0.5)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 8, 8, 1).astype(np.float32))
    y = jnp.asarray(rs.randint(0, 3, (2, 8, 8, 8)))
    rng = jax.random.PRNGKey(3)
    g_ref = jax.grad(_loss_fn(graph, 0))(variables["params"],
                                         variables["state"], x, y, rng)
    g_rm = jax.grad(_loss_fn(graph, 4))(variables["params"],
                                        variables["state"], x, y, rng)
    for (kr, lr), (km, lm) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_rm)):
        assert kr == km
        np.testing.assert_allclose(np.asarray(lr), np.asarray(lm),
                                   rtol=1e-6, atol=1e-7, err_msg=str(kr))


def test_remat_shrinks_saved_residuals():
    """The autodiff tape must shrink under remat — the whole point of the
    feature.  Asserted on jax's own residual accounting (what the backward
    keeps alive), not on XLA:CPU temp stats: the CPU scheduler fuses/frees
    aggressively enough that its temp metric doesn't reflect the tape."""
    saved_residuals = pytest.importorskip(
        "jax._src.ad_checkpoint").saved_residuals

    graph, variables = small(drop=0.0)
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 16, 16, 16, 1).astype(np.float32))
    y = jnp.asarray(rs.randint(0, 3, (2, 16, 16, 16)))
    rng = jax.random.PRNGKey(5)

    def tape_bytes(remat):
        loss = _loss_fn(graph, remat)
        res = saved_residuals(
            lambda p: loss(p, variables["state"], x, y, rng),
            variables["params"])
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a, _ in res if hasattr(a, "shape"))

    plain, rematted = tape_bytes(0), tape_bytes(4)
    assert rematted < 0.75 * plain, (plain, rematted)
