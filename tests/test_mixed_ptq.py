"""Sensitivity-driven mixed-precision PTQ (--mixed_frac / --mixed_qlvl).

Ours — no reference counterpart: the reference fixes one (qlvl_w, qlvl_act)
per layer class (src/models/PTQConv.py:12-23).  run_ptq_mixed ranks layers
by relative reconstruction loss (reported loss / target energy, computed
inside the calibration program) and recalibrates the worst fraction at a
finer grid.  Serving cost is unchanged: every grid <= 256 levels packs into
the same int8 codes and runs the same fused Pallas kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq, run_ptq_mixed


def _tiny(qlvl=4):
    cfg = UResQConfig(
        num_mod=2, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid", ds="simple",
        ds_depth_limit=3, quantize=True, qlvl_w=qlvl, qlvl_act=qlvl,
        q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return cfg, graph, variables


def _calib():
    rng = np.random.RandomState(7)
    return jnp.asarray(rng.randn(1, 16, 16, 16, 2).astype(np.float32))


def test_qlvl_overrides_rewrite_is_pure_and_applied():
    cfg, graph, variables = _tiny()
    x = _calib()
    hp = PTQHyperParams(admm_iter=10)
    target = [n.name for n in graph.qconv_nodes()
              if n.attrs["qcfg"].q_weight][1]
    fg, qv, _ = run_ptq(graph, variables, x, task="lits",
                        init_stride=cfg.init_stride, hp=hp,
                        qlvl_overrides={target: (16, 16)})
    # the returned graph carries the override; the input graph is untouched
    assert fg.node(target).attrs["qcfg"].qlvl_w == 16
    assert fg.node(target).attrs["qcfg"].qlvl_act == 16
    assert graph.node(target).attrs["qcfg"].qlvl_w == 4
    # other qconvs keep their original grids (incl. the q_first 256-level)
    for n in fg.qconv_nodes():
        if n.name != target:
            assert (n.attrs["qcfg"].qlvl_w
                    == graph.node(n.name).attrs["qcfg"].qlvl_w)
    # the overridden kernel really uses the finer grid: > 4 distinct codes
    k = qv["params"][target]["kernel"]
    a = qv["params"][target]["alpha_w"]
    codes = np.unique(np.round(np.asarray(k / a) * (16 - 1) / 2))
    assert len(codes) > 4

    import pytest

    with pytest.raises(ValueError):
        run_ptq(graph, variables, x, task="lits",
                init_stride=cfg.init_stride, hp=hp,
                qlvl_overrides={"no_such_node": (16, 16)})


def test_mixed_improves_reconstruction_and_reports_ranking():
    cfg, graph, variables = _tiny()
    x = _calib()
    hp = PTQHyperParams(admm_iter=40)
    _, _, rep_low = run_ptq(graph, variables, x, task="lits",
                            init_stride=cfg.init_stride, hp=hp)
    # relative losses populated, finite, one per weight-quantized layer
    assert len(rep_low.layer_rel_losses) == len(rep_low.layer_losses)
    rels = dict(rep_low.layer_rel_losses)
    assert all(np.isfinite(v) and v >= 0 for v in rels.values())

    mg, mv, rep_mixed = run_ptq_mixed(
        graph, variables, x, task="lits", init_stride=cfg.init_stride,
        hp=hp, mixed_frac=0.34, mixed_qlvl=16, mixed_tail=False)
    n_q = len(rep_low.layer_losses)
    assert len(rep_mixed.mixed_upgraded) == max(1, round(0.34 * n_q))
    # with mixed_tail off, the upgraded set IS the worst-relative-loss set
    expect = [n for n, _ in sorted(rep_low.layer_rel_losses,
                                   key=lambda t: -t[1])]
    assert set(rep_mixed.mixed_upgraded) == set(
        expect[:len(rep_mixed.mixed_upgraded)])
    # finer grids on the worst layers must not hurt whole-net recon
    err_low = float(jnp.linalg.norm(rep_low.output_q - rep_low.output_fp))
    err_mix = float(jnp.linalg.norm(rep_mixed.output_q - rep_mixed.output_fp))
    assert err_mix <= err_low * 1.02, (err_mix, err_low)


def test_mixed_deploys_bit_exact_int8():
    from efficientq_tpu.ptq.deploy import to_int8_inference

    cfg, graph, variables = _tiny()
    x = _calib()
    mg, mv, rep = run_ptq_mixed(
        graph, variables, x, task="lits", init_stride=cfg.init_stride,
        hp=PTQHyperParams(admm_iter=10), mixed_frac=0.34, mixed_qlvl=16)
    ref = nnir.apply(mg, mv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    for pallas in (False, True):
        ig, iv = to_int8_inference(mg, mv, pallas=pallas)
        out = nnir.apply(ig, iv, x, mode="quantized",
                         precision=jax.lax.Precision.HIGHEST)
        scale = float(jnp.std(ref))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3 * scale + 1e-4, rtol=1e-3)


def test_tail_sensitive_convs_is_last_block():
    """tail_sensitive_convs returns the final ResBlock's convs — the W2A2
    basin-cascade trigger set (scripts/basin_probe.py: every calibration
    draw's prefix dice collapses at the last decoder block's entry conv;
    docs/quantization.md)."""
    from efficientq_tpu.ptq import tail_sensitive_convs

    cfg, graph, variables = _tiny()
    tail = tail_sensitive_convs(graph)
    assert tail == ["u_blocks.UResBlock3.Layer1.block1.conv",
                    "u_blocks.UResBlock3.Layer1.block2.conv"]
    # never the classifier heads (q_last covers those) and never empty
    assert all("cls" not in n for n in tail)


def test_mixed_tail_forces_final_stage_into_lift_set():
    cfg, graph, variables = _tiny()
    x = _calib()
    hp = PTQHyperParams(admm_iter=10)
    from efficientq_tpu.ptq import tail_sensitive_convs

    tail = set(tail_sensitive_convs(graph))
    # small frac: the pure ranking would pick 1 layer; the tail forces 2
    mg, mv, rep = run_ptq_mixed(
        graph, variables, x, task="lits", init_stride=cfg.init_stride,
        hp=hp, mixed_frac=0.1, mixed_qlvl=16)
    assert tail <= set(rep.mixed_upgraded)
    for name in tail:
        assert mg.node(name).attrs["qcfg"].qlvl_w == 16


def test_cli_mixed_flags():
    from efficientq_tpu.cli.entrance import build_parser

    args = build_parser().parse_args(["ptq", "--mixed_frac", "0.25",
                                      "--mixed_qlvl", "64"])
    assert args.mixed_frac == 0.25 and args.mixed_qlvl == 64
    assert args.mixed_tail == "on"
    args = build_parser().parse_args(["ptq", "--mixed_tail", "off"])
    assert args.mixed_frac == 0.0 and args.mixed_tail == "off"
