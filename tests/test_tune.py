"""Activation-range tuning reduces reconstruction error."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import fold_bn
from efficientq_tpu.ptq.tune import tune_activation_range
from efficientq_tpu.quant import fake_quant_weight


def test_tune_activation_range_improves_reconstruction():
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    fgraph, fvars = fold_bn(graph, variables)
    # pre-quantize weights; deliberately bad alpha_act init
    for node in fgraph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        p = fvars["params"][node.name]
        if qcfg.q_weight:
            a = jnp.maximum(jnp.max(jnp.abs(p["kernel"])), 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], a, qcfg.qlvl_w)
            p["alpha_w"] = a
        if qcfg.q_act:
            p["alpha_act"] = jnp.float32(5.0)

    x = jnp.asarray(np.abs(np.random.RandomState(0).randn(1, 8, 8, 8, 1))
                    .astype(np.float32))
    out_fp = nnir.apply(fgraph, fvars, x, mode="fp")
    tuned, losses, info = tune_activation_range(fgraph, fvars, x, out_fp,
                                                max_iter=60, lr=5e-2)
    assert info == {}  # no scoring requested
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
    # alphas actually moved
    moved = any(
        abs(float(tuned["params"][n.name]["alpha_act"]) - 5.0) > 1e-3
        for n in fgraph.qconv_nodes() if n.attrs["qcfg"].q_act)
    assert moved

    # validated early stopping: with a score that says tuning only HURTS,
    # the returned alphas are exactly the untouched iteration-0 ones —
    # the overfitting guard (the 2-bit calibration matrix measured recon
    # MSE anti-correlating with held-out dice)
    calls = []

    def hostile_score(v):
        calls.append(1)
        return float(-len(calls))  # strictly decreasing: iter 0 wins

    tuned0, losses0, info0 = tune_activation_range(
        fgraph, fvars, x, out_fp, max_iter=25, lr=5e-2,
        score_fn=hostile_score, score_every=10)
    assert info0["best_iter"] == 0
    assert [it for it, _ in info0["scores"]] == [0, 10, 20, 25]
    for n in fgraph.qconv_nodes():
        if n.attrs["qcfg"].q_act:
            assert float(tuned0["params"][n.name]["alpha_act"]) == 5.0

    # and with a score that rewards tuning, a later iterate is kept
    def mse_score(v):
        out = nnir.apply(fgraph, v, x, mode="quantized")
        return -float(jnp.mean((out - out_fp) ** 2))

    _, _, info1 = tune_activation_range(
        fgraph, fvars, x, out_fp, max_iter=25, lr=5e-2,
        score_fn=mse_score, score_every=10)
    assert info1["best_iter"] > 0
