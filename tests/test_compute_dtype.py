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


def test_validate_seg_bf16_close_to_f32():
    """--serve_dtype bf16 through the product eval path: hard-prediction
    dice within tolerance of the f32 run (borderline voxels may flip)."""
    from efficientq_tpu.eval.validate import validate_seg

    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fgraph, fvars = fold_bn(graph, variables)

    rs = np.random.RandomState(1)
    vols = rs.randn(2, 1, 16, 16, 16).astype(np.float32)
    labs = rs.randint(0, 3, (2, 16, 16, 16))
    loader = [(vols[i:i + 1], labs[i:i + 1]) for i in range(2)]

    kw = dict(patch_size=(8, 8, 8), overlap=(4, 4, 4), patch_batch=4)
    sm32 = validate_seg(fgraph, fvars, loader, ["s0", "s1"],
                        len(fgraph.outputs), 3, **kw)
    sm16 = validate_seg(fgraph, fvars, loader, ["s0", "s1"],
                        len(fgraph.outputs), 3,
                        compute_dtype=jnp.bfloat16, **kw)
    m32 = sm32[-1].get_metric()
    m16 = sm16[-1].get_metric()
    for k in ("dsc", "acc"):
        assert abs(m32[k] - m16[k]) < 0.05, (k, m32[k], m16[k])
