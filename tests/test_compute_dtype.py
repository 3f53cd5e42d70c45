"""bf16 compute path: close to f32 but actually lower precision."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import fold_bn


def test_bf16_inference_close_to_f32():
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fgraph, fvars = fold_bn(graph, variables)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8, 1)
                    .astype(np.float32))
    o32 = nnir.apply(fgraph, fvars, x)
    o16 = nnir.apply(fgraph, fvars, x, compute_dtype=jnp.bfloat16)
    assert o16.dtype == jnp.float32
    d = float(jnp.max(jnp.abs(o32 - o16)))
    scale = float(jnp.std(o32))
    assert 0 < d < 0.1 * scale + 0.05, (d, scale)
