"""Coverage for the less-used model variants: 'pre'/'post' block orderings,
'complex' deep supervision, anisotropic pooling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq


@pytest.mark.parametrize("blk", ["pre", "post"])
def test_pre_post_orderings_forward(blk):
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(1, 1, 1), drop_rate=0.0, blk_type=blk,
                      ds=None, fuse_bn=True)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8, 1)
                    .astype(np.float32))
    out = jax.jit(lambda v, x: nnir.apply(graph, v, x))(variables, x)
    assert out.shape == (1, 1, 8, 8, 8, 2)
    assert np.isfinite(np.asarray(out)).all()
    # fuse_bn branch norms exist for non-'mid' orderings
    assert any("bn_x" in n.name for n in graph.nodes)


def test_complex_deep_supervision():
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1] * 5,
                      width_config=[2, 4, 8, 4, 2], dilation_config=[1] * 5,
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="complex", ds_depth_limit=3)
    graph = build_uresq(cfg)
    # complex heads contain upsampler chains
    assert any("AuxClassifier" in n.name and ".up1." in n.name
               for n in graph.nodes)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 16, 1)
                    .astype(np.float32))
    out = jax.jit(lambda v, x: nnir.apply(graph, v, x))(variables, x)
    assert out.shape[0] == len(graph.outputs)
    assert out.shape[2:] == (16, 16, 16, 2)


def test_aniso_pooling_path():
    # aniso_pool_depth=0 forces the (2,2,1) anisotropic transitions
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(1, 1, 1), drop_rate=0.0, blk_type="mid",
                      ds=None, aniso_pool_depth=0, aniso_pool_stride=(2, 2, 1))
    graph = build_uresq(cfg)
    pool = next(n for n in graph.nodes if n.op == "maxpool")
    assert pool.attrs["kernel"] == (2, 2, 1)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 4, 1)
                    .astype(np.float32))
    out = nnir.apply(graph, variables, x)
    assert out.shape == (1, 1, 8, 8, 4, 2)
