"""BN folding: folded graph must reproduce eval-mode outputs exactly
(reference math at src/models/fold_bn.py:14-34)."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import fold_bn


def randomized_variables(graph, seed=0):
    variables = nnir.init(graph, jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    for name, p in variables["params"].items():
        for k in p:
            if p[k].ndim > 0:
                p[k] = jnp.asarray(rng.randn(*p[k].shape).astype(np.float32) * 0.3)
    for name, s in variables["state"].items():
        s["mean"] = jnp.asarray(rng.randn(*s["mean"].shape).astype(np.float32))
        s["var"] = jnp.asarray(
            np.abs(rng.randn(*s["var"].shape)).astype(np.float32) + 0.5)
    return variables


def test_fold_bn_preserves_eval_output_mid():
    cfg = UResQConfig(num_mod=2, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = randomized_variables(graph)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 8, 2).astype(np.float32))
    ref = nnir.apply(graph, variables, x, precision=jax.lax.Precision.HIGHEST)
    fgraph, fvars = fold_bn(graph, variables)
    got = nnir.apply(fgraph, fvars, x, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-3)
    # all block bns folded away in 'mid' ordering
    assert not any(n.op == "bn" for n in fgraph.nodes)
    # folded convs gained biases
    assert "bias" in fvars["params"]["conv0.conv"]


def test_fold_bn_pre_keeps_preceding_bns():
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(1, 1, 1), drop_rate=0.0, blk_type="pre",
                      ds=None, fuse_bn=True)
    graph = build_uresq(cfg)
    variables = randomized_variables(graph, 2)
    fgraph, fvars = fold_bn(graph, variables)
    # 'pre' ordering: BN precedes conv, so nothing to fold
    assert any(n.op == "bn" for n in fgraph.nodes)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 8, 8, 8, 1).astype(np.float32))
    ref = nnir.apply(graph, variables, x, precision=jax.lax.Precision.HIGHEST)
    got = nnir.apply(fgraph, fvars, x, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
