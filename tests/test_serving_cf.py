"""Channels-first serving tail (ptq/deploy.py::channels_first_tail).

The rewrite must be a pure layout change: same logits (up to f32
reduction-order noise) and bit-identical hard predictions as the standard
NDHWC path, including with the unnormalized (sum) stitch, whose
positive-count invariance the serving path relies on.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientq_tpu import nnir
from efficientq_tpu.eval.sliding import (patch_grid, sliding_window_inference,
                                         visit_counter)
from efficientq_tpu.models import build_uresq
from efficientq_tpu.models.uresq import UResQConfig
from efficientq_tpu.ptq import fold_bn
from efficientq_tpu.ptq.attention import pred_brats_con_merge
from efficientq_tpu.ptq.deploy import channels_first_tail, to_int8_inference
from efficientq_tpu.quant import fake_quant_weight


@pytest.fixture(scope="module")
def served():
    cfg = UResQConfig(num_mod=4, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[8, 16, 8], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fgraph, fvars = fold_bn(graph, variables)
    for node in fgraph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        p = fvars["params"][node.name]
        if qcfg.q_weight:
            alpha = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], alpha, qcfg.qlvl_w)
            p["alpha_w"] = alpha
        if qcfg.q_act:
            p["alpha_act"] = jnp.float32(1.0)
    ig, iv = to_int8_inference(fgraph, fvars, pallas=False)
    vol = np.random.RandomState(0).randn(1, 40, 48, 48, 4).astype(np.float32)
    return ig, iv, jnp.asarray(vol)


def _run(graph, variables, vol, cf, normalize=True):
    def model_fn(xb):
        return nnir.apply(graph, variables, xb, mode="quantized")

    return sliding_window_inference(
        model_fn, vol, (32, 32, 32), (8, 8, 8), patch_batch=4,
        heads=None if cf else slice(-1, None), channels_first=cf,
        normalize=normalize)


def test_cf_tail_matches_standard_serving(served):
    ig, iv, vol = served
    cg = channels_first_tail(ig)
    assert cg.outputs == [ig.outputs[-1]]
    assert cg.node(cg.outputs[0]).op in ("upsample_cf", "conv_cf")

    std = _run(ig, iv, vol, cf=False)       # (1, N, D, H, W, C)
    cf = _run(cg, iv, vol, cf=True)         # (1, N, C, D, H, W)
    np.testing.assert_allclose(np.moveaxis(np.asarray(cf), 2, -1),
                               np.asarray(std), atol=1e-5)
    p_std = pred_brats_con_merge(std[-1])
    p_cf = pred_brats_con_merge(cf[-1], axis=1)
    assert bool(jnp.all(p_std == p_cf))


def test_sum_stitch_pred_invariance(served):
    ig, iv, vol = served
    cg = channels_first_tail(ig)
    avg = _run(cg, iv, vol, cf=True, normalize=True)
    raw = _run(cg, iv, vol, cf=True, normalize=False)
    p_avg = pred_brats_con_merge(avg[-1], axis=1)
    p_raw = pred_brats_con_merge(raw[-1], axis=1)
    assert bool(jnp.all(p_avg == p_raw))
    # the counter is a host-side constant; check it matches the raw/avg ratio
    counter = visit_counter(patch_grid((40, 48, 48), (32, 32, 32), (8, 8, 8)),
                            (32, 32, 32), (40, 48, 48))
    np.testing.assert_allclose(np.asarray(raw[-1]) / counter[None, None],
                               np.asarray(avg[-1]), rtol=1e-6)


def test_cf_tail_noop_on_unexpected_graphs(served):
    ig, _, _ = served
    # a graph whose last head is not a 1x1-conv(+upsample) tail is returned
    # unchanged rather than silently mis-rewritten
    from efficientq_tpu.nnir import Graph

    relu_out = next(n.name for n in ig.nodes if n.op == "relu")
    g2 = Graph(list(ig.nodes), [relu_out], ig.input_name)
    assert channels_first_tail(g2) is g2
