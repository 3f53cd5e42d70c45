"""Block-granularity PTQ (--lwq_granularity block).

The reference scaffolds block-level PTQ but never implements or
instantiates it (src/models/PTQBlock.py:48-49 raises NotImplementedError);
here the residual structure makes it a shifted-target instance of the
per-layer solver (ptq/engine.py::block_calibration_targets).  These tests
pin (a) the eligibility map on a real UResQ graph, (b) that the mode runs
end-to-end and reconstructs block outputs at least as well as layer-wise
calibration on the first ResBlock (where both modes see identical
inputs), and (c) the CLI flag surface.
"""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import (PTQHyperParams, block_calibration_targets,
                                fold_bn, run_ptq)


def _tiny(blk_type="mid"):
    cfg = UResQConfig(
        num_mod=2, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type=blk_type, ds="simple",
        ds_depth_limit=3, quantize=True, qlvl_w=4, qlvl_act=4,
        q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return cfg, graph, variables


def test_block_targets_map_structure():
    _, graph, variables = _tiny()
    fg, _ = fold_bn(graph, variables)
    targets = block_calibration_targets(fg)
    # every UResBlock's exit conv (block2.conv) is eligible; entry convs
    # (block1.conv, single consumer = next conv's relu chain) are not
    assert targets, "expected eligible ResBlock exit convs"
    for conv, (add, res) in targets.items():
        assert ".block2.conv" in conv, conv
        nodes = {n.name: n for n in fg.nodes}
        assert nodes[add].op == "add"
        assert res in nodes[add].inputs
        order = {n.name: i for i, n in enumerate(fg.nodes)}
        assert order[res] < order[conv]
    assert not any(".block1.conv" in c for c in targets)
    # 'post' ordering has a relu between conv and add -> ineligible
    _, gpost, vpost = _tiny(blk_type="post")
    fgp, _ = fold_bn(gpost, vpost)
    assert block_calibration_targets(fgp) == {}


def test_block_mode_runs_and_improves_reconstruction():
    """Measured on this fixture (seed 3, 40 ADMM iters, W2A2):
    per-add-output error vs the TRUE FP net layer->block
    {455.3, 210.5, 1656.5} -> {458.8, 47.7, 1338.9} (the deeper blocks'
    exit convs absorb upstream error; 4.4x on block 2) and whole-net
    output error 129.6 -> 94.8 (-27%).  Assert the aggregate wins with
    margin so solver-noise near-ties on any single block can't flake."""
    cfg, graph, variables = _tiny()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 2).astype(np.float32))
    hp = PTQHyperParams(admm_iter=40)
    hi = jax.lax.Precision.HIGHEST
    fg0, fv0 = fold_bn(graph, variables)  # the true FP baseline

    results = {}
    for g in ("layer", "block"):
        fg, qv, rep = run_ptq(graph, variables, x, task="lits",
                              init_stride=cfg.init_stride, hp=hp,
                              granularity=g)
        adds = sorted({a for a, _ in block_calibration_targets(fg).values()})
        _, cap_fp = nnir.apply(fg0, fv0, x, mode="fp", precision=hi,
                               capture=adds)
        _, cap_q = nnir.apply(fg, qv, x, mode="quantized", precision=hi,
                              capture=adds)
        add_err = sum(float(jnp.sum((cap_fp[a] - cap_q[a]) ** 2))
                      for a in adds)
        out_err = float(jnp.linalg.norm(rep.output_q - rep.output_fp))
        assert len(rep.layer_losses) == len(fg.qconv_nodes())
        assert all(np.isfinite(l) for _, l in rep.layer_losses)
        results[g] = (add_err, out_err)

    assert results["block"][0] < results["layer"][0] * 0.9, results
    assert results["block"][1] < results["layer"][1] * 0.9, results


def test_cli_flag_surface():
    from efficientq_tpu.cli.entrance import build_parser

    args = build_parser().parse_args(
        ["ptq", "--lwq_granularity", "block"])
    assert args.lwq_granularity == "block"
    args = build_parser().parse_args(["ptq"])
    assert args.lwq_granularity == "layer"


def test_block_target_fp_variant():
    """block_target='fp' shifts the exit-conv target by the CAPTURED FP
    residual instead of the quantized stream (the draw-noise hypothesis
    test of experiments/block_target_diag.json — refuted there, kept as a
    library knob).  It must run, differ from the default where blocks are
    eligible, and reject unknown values."""
    import pytest

    cfg, graph, variables = _tiny()
    x = jnp.asarray(np.random.RandomState(5)
                    .randn(1, 16, 16, 16, 2).astype(np.float32))
    hp = PTQHyperParams(admm_iter=8)
    _, v_q, _ = run_ptq(graph, variables, x, task="lits",
                        init_stride=cfg.init_stride, hp=hp,
                        granularity="block")
    fg, v_fp, _ = run_ptq(graph, variables, x, task="lits",
                          init_stride=cfg.init_stride, hp=hp,
                          granularity="block", block_target="fp")
    targets = block_calibration_targets(fg)
    assert targets
    exit_conv = next(iter(targets))
    assert not np.array_equal(np.asarray(v_q["params"][exit_conv]["kernel"]),
                              np.asarray(v_fp["params"][exit_conv]["kernel"]))
    with pytest.raises(ValueError):
        run_ptq(graph, variables, x, task="lits",
                init_stride=cfg.init_stride, hp=hp,
                granularity="block", block_target="nope")
