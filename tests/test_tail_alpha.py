"""Validated tail activation-clip sweep (--tail_alpha_sweep).

The measured W2A2 basin fix (experiments/tail_alpha_probe.json): the
reconstruction-optimal tail alpha_act clips too tightly for downstream
dice; a validated sweep of clip factors recovers it.  Factor 1.0 is
always a candidate, so the sweep has zero regret by its own score.
"""
import glob
import os.path as P

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq.tune import sweep_tail_alpha

TINY = [
    "--width", "4,8,4", "--depth", "1,1,1", "--dilation", "1,1,1",
    "--init_stride", "2,2,1", "--blk", "mid", "--ds", "simple",
    "--hetero_dim", "--drop_rate", "0.0", "--nMod", "1", "--nClass", "3",
]


def _tiny_qnet():
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    g = build_uresq(cfg)
    from efficientq_tpu.ptq import fold_bn

    return fold_bn(g, nnir.init(g, jax.random.PRNGKey(0)))


def test_sweep_keeps_score_best_factor():
    fg, fv = _tiny_qnet()
    from efficientq_tpu.ptq.engine import tail_sensitive_convs

    tail = tail_sensitive_convs(fg)
    assert tail
    base_alpha = {n: float(np.asarray(fv["params"][n]["alpha_act"]))
                  for n in tail}

    # a score that peaks at factor 1.7 of the calibrated alphas
    def score(v):
        f = float(np.asarray(v["params"][tail[0]]["alpha_act"])
                  / base_alpha[tail[0]])
        return -abs(f - 1.7)

    v2, info = sweep_tail_alpha(fg, fv, score)
    assert info["best_factor"] == 1.7
    for n in tail:
        got = float(np.asarray(v2["params"][n]["alpha_act"]))
        assert got == pytest.approx(base_alpha[n] * 1.7, rel=1e-6)
    # non-tail alphas untouched
    others = [n.name for n in fg.qconv_nodes()
              if n.name not in tail and "alpha_act" in fv["params"][n.name]]
    for n in others:
        assert np.asarray(v2["params"][n]["alpha_act"]) == \
            np.asarray(fv["params"][n]["alpha_act"])

    # zero regret: with a score that prefers the calibrated alphas,
    # factor 1.0 wins and the ORIGINAL variables object is returned
    v3, info3 = sweep_tail_alpha(fg, fv, lambda v: -float(
        np.asarray(v["params"][tail[0]]["alpha_act"])))
    assert info3["best_factor"] == 1.0
    assert v3 is fv


def test_cli_tail_alpha_sweep(tmp_path, monkeypatch):
    from efficientq_tpu.cli.entrance import main
    from efficientq_tpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path)
    data_dir, split_dir = make_synthetic_dataset(
        root, task="lits", n_subjects=4, vol_shape=(16, 16, 16))
    monkeypatch.chdir(root)
    snap = main([
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--patch_size", "8,8,8",
        "--batch_size", "2", "--crop_type", "random", "--loss", "ce",
        "--lr", "0.01", "--max_epoch", "2", "--test_interval", "5",
        "--disp_interval", "1", "--no_test", *TINY,
    ])
    ckpt = glob.glob(P.join(snap, "state_0002.pkl"))[0]
    snap_ptq = main([
        "ptq", "--task", "lits", "--data_dir", data_dir, "--split_dir",
        split_dir, "--round", "1", "--pretrain", ckpt, "--patch_size",
        "8,8,8", "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "3", "--no_test",
        "--tail_alpha_sweep", "--tail_alpha_factors", "1.0,1.7",
        *TINY,
    ])
    sink = P.join(snap_ptq, "tail_alpha_sweep.txt")
    assert P.isfile(sink)
    lines = open(sink).read().strip().splitlines()
    assert len(lines) == 2 and sum("<- kept" in l for l in lines) == 1
