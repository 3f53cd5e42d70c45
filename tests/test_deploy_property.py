"""Config-space property test for the deployment rewrite stack.

The int8 deployment path is a chain of graph rewrites — ``fold_bn`` →
``to_int8_inference`` (code packing) → ``fuse_int8_epilogues`` (relu /
residual / next-act-quant fusion + relu elision) → ``to_pallas_inference``
(kernel flagging) — each pattern-matching on graph structure.  The existing
tests pin parity on specific graphs; this one sweeps the *configuration
space* the product can build (block orderings, deep-supervision styles,
anisotropic strides, hetero widths, per-channel scales, mixed serving) and
asserts every variant's deployed forward matches the plain fake-quant
forward.  Rationale: the rewrites are where latent miswirings live — the
r3 review found exactly such an ordering bug in the opt-in s2d path.

Reference behavior being preserved: the quantized forward semantics of
src/models/PTQConv.py:110-116,157-170 across the model variants of
src/models/UResQNet.py / factory_blk.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import fold_bn
from efficientq_tpu.ptq.deploy import to_int8_inference
from efficientq_tpu.quant import fake_quant_weight

CASES = [
    # (name, cfg kwargs, channel_wise)
    ("pre_simple", dict(blk_type="pre", ds="simple", ds_depth_limit=3,
                        init_stride=(2, 2, 2)), False),
    ("mid_complex_aniso", dict(blk_type="mid", ds="complex",
                               init_stride=(2, 2, 1),
                               aniso_pool_depth=1), False),
    ("post_nods", dict(blk_type="post", ds=None,
                       init_stride=(2, 2, 2)), False),
    ("mid_5stage_hetero", dict(blk_type="mid", ds="simple", ds_depth_limit=5,
                               depth_config=[1, 1, 1, 1, 1],
                               width_config=[4, 8, 16, 8, 4],
                               dilation_config=[1, 1, 2, 1, 1],
                               init_stride=(2, 2, 2)), False),
    ("pre_channelwise", dict(blk_type="pre", ds="simple", ds_depth_limit=3,
                             init_stride=(2, 2, 2)), True),
    ("mid_channelwise_aniso", dict(blk_type="mid", ds=None,
                                   init_stride=(1, 2, 2)), True),
]


def _build(case_kwargs, channel_wise, seed):
    kw = dict(num_mod=2, num_classes=3, depth_config=[1, 1, 1],
              width_config=[4, 8, 4], dilation_config=[1, 1, 1],
              drop_rate=0.0, fuse_bn=True, quantize=True,
              qlvl_w=4, qlvl_act=4, q_first=(256, -1), q_last=(256, -1))
    kw.update(case_kwargs)
    graph = build_uresq(UResQConfig(**kw))
    variables = nnir.init(graph, jax.random.PRNGKey(seed))
    fg, fv = fold_bn(graph, variables)
    # emulate the post-PTQ state: kernels on the alpha grid (scalar or
    # per-output-channel), activation scales set
    for node in fg.qconv_nodes():
        q = node.attrs["qcfg"]
        p = fv["params"][node.name]
        if q.q_weight:
            if channel_wise:
                a = jnp.maximum(
                    jnp.max(jnp.abs(p["kernel"]), axis=(0, 1, 2, 3)), 1e-8)
            else:
                a = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], a, q.qlvl_w)
            p["alpha_w"] = a
        if q.q_act:
            p["alpha_act"] = jnp.float32(0.8)
    return fg, fv


@pytest.mark.parametrize("name,case_kwargs,channel_wise",
                         CASES, ids=[c[0] for c in CASES])
def test_deployed_forward_matches_fake_quant(name, case_kwargs, channel_wise):
    fg, fv = _build(case_kwargs, channel_wise, seed=hash(name) % (2 ** 31))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 2).astype(np.float32))
    ref = nnir.apply(fg, fv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)

    # full int8 deployment: code packing + epilogue fusion + relu elision +
    # Pallas flags (interpret-mode kernels on CPU)
    ig, iv = to_int8_inference(fg, fv, pallas=True)
    got = nnir.apply(ig, iv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    for h, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"{name}: head {h} (int8)")

    # mixed serving: int8 only for the 3^3 convs, fake-quant elsewhere
    mg, mv = to_int8_inference(fg, fv, pallas=True,
                               only_kernel_sizes={(3, 3, 3)})
    gotm = nnir.apply(mg, mv, x, mode="quantized",
                      precision=jax.lax.Precision.HIGHEST)
    for h, (r, g) in enumerate(zip(ref, gotm)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"{name}: head {h} (mixed)")
