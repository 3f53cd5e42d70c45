"""End-to-end PTQ smoke test: tiny quantized UResQ, random-but-structured
data; the calibrated quantized network must reconstruct the FP output far
better than naive on-the-fly fake quantization."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq


def build_tiny():
    cfg = UResQConfig(
        num_mod=2, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid", ds="simple",
        ds_depth_limit=3, quantize=True, qlvl_w=4, qlvl_act=4,
        q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    # randomize BN state a little so folding is non-trivial
    rng = np.random.RandomState(0)
    for s in variables["state"].values():
        s["mean"] = jnp.asarray(rng.randn(*s["mean"].shape).astype(np.float32) * 0.1)
        s["var"] = jnp.asarray(
            (np.abs(rng.randn(*s["var"].shape)) * 0.2 + 0.9).astype(np.float32))
    return cfg, graph, variables


def test_ptq_pipeline_runs_and_improves_over_naive():
    cfg, graph, variables = build_tiny()
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 2).astype(np.float32))

    hp = PTQHyperParams(admm_iter=40)
    fgraph, qvars, report = run_ptq(graph, variables, x, task="lits",
                                    init_stride=cfg.init_stride, hp=hp)

    # report integrity
    assert len(report.layer_losses) == len(fgraph.qconv_nodes())
    assert all(np.isfinite(l) for _, l in report.layer_losses)
    assert len(report.class_voxel_nums) == 3
    assert report.time_cost_line().endswith("min.")
    assert len(report.layer_loss_lines()) == len(report.layer_losses)

    out_fp = report.output_fp
    # quantized inference via stored weights + alpha_act
    out_q = nnir.apply(fgraph, qvars, x, mode="quantized",
                       precision=jax.lax.Precision.HIGHEST)
    # matches the sweep's own output (the last layer sees identical inputs)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(report.output_q),
                               atol=1e-3, rtol=1e-3)

    # naive baseline: fold, project every weight directly (mode='fq'), with
    # alpha_act from the calibrated run
    from efficientq_tpu.ptq import fold_bn
    nfgraph, nfvars = fold_bn(graph, variables)
    for name, p in nfvars["params"].items():
        if "alpha_act" in p:
            p["alpha_act"] = qvars["params"][name]["alpha_act"]
    out_naive = nnir.apply(nfgraph, nfvars, x, mode="fq",
                           precision=jax.lax.Precision.HIGHEST)

    err_q = float(jnp.mean((out_q[-1] - out_fp[-1]) ** 2))
    err_naive = float(jnp.mean((out_naive[-1] - out_fp[-1]) ** 2))
    assert np.isfinite(err_q)
    assert err_q < err_naive, (err_q, err_naive)


def test_quantized_weights_on_grid():
    cfg, graph, variables = build_tiny()
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 16, 2)
                    .astype(np.float32))
    hp = PTQHyperParams(admm_iter=10)
    fgraph, qvars, _ = run_ptq(graph, variables, x, task="lits",
                               init_stride=cfg.init_stride, hp=hp)
    for node in fgraph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        if not qcfg.q_weight:
            continue
        p = qvars["params"][node.name]
        alpha = float(p["alpha_w"])
        vals = np.asarray(p["kernel"]).ravel()
        grid = np.linspace(-1, 1, qcfg.qlvl_w) * alpha
        dist = np.min(np.abs(vals[:, None] - grid[None, :]), axis=1)
        assert dist.max() < 1e-4, node.name
