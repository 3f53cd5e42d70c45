"""Checkpoint interop: int8 export reload + validate_vs_label utility."""
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.eval.metrics import validate_vs_label
from efficientq_tpu.models import UResQConfig, build_uresq, torch_io
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.quant import pack_int_weight


def test_int8_checkpoint_roundtrip(tmp_path):
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8, 1)
                    .astype(np.float32))
    fgraph, qvars, _ = run_ptq(graph, variables, x, task="lits",
                               init_stride=(2, 2, 2),
                               hp=PTQHyperParams(admm_iter=5))

    sd = torch_io.to_torch_state_dict(fgraph, qvars)
    sd_int = dict(sd)
    for node in fgraph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        if qcfg.q_weight:
            key = f"{node.name}.weight"
            sd_int[key] = pack_int_weight(sd[key],
                                          float(sd[f"{node.name}.alpha_w"]),
                                          qcfg.qlvl_w)
    path = str(tmp_path / "int8.pkl")
    with open(path, "wb") as f:
        pickle.dump({"state_dict": sd_int}, f)

    restored = torch_io.load_int8_checkpoint(
        fgraph, nnir.init(fgraph, jax.random.PRNGKey(1)), path)
    for node in fgraph.qconv_nodes():
        if node.attrs["qcfg"].q_weight:
            got = np.asarray(restored["params"][node.name]["kernel"])
            want = np.asarray(qvars["params"][node.name]["kernel"])
            np.testing.assert_allclose(got, want, atol=1e-5), node.name


def test_validate_vs_label_lits_and_brats():
    rng = np.random.RandomState(0)
    # lits path: perfect prediction -> all dice 1
    target = rng.randint(0, 3, (1, 6, 6, 6))
    logits = np.zeros((1, 3, 6, 6, 6), np.float32)
    for c in range(3):
        logits[0, c][target[0] == c] = 10.0
    m = validate_vs_label(logits, target, "lits")
    assert all(abs(v - 1.0) < 1e-5 for v in m)
    # multi-head input recurses
    mm = validate_vs_label(logits[None], target, "lits")
    assert len(mm) == 1 and len(mm[0]) == 3
    # brats path returns bkg + per-channel
    t2 = (rng.rand(1, 3, 6, 6, 6) > 0.5).astype(np.int32)
    l2 = np.where(t2 > 0, 10.0, -10.0).astype(np.float32)
    m2 = validate_vs_label(l2, t2, "brats")
    assert len(m2) == 4 and all(abs(v - 1.0) < 1e-5 for v in m2)


def test_int8_checkpoint_grid_mismatch_raises(tmp_path):
    """Mixed-precision export safety: reloading packed codes onto a graph
    whose qcfg grid disagrees must raise, not silently unpack out of
    range (the __qlvl_overrides__ / code-range checks in
    torch_io.load_int8_checkpoint)."""
    import pytest

    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8, 1)
                    .astype(np.float32))
    fgraph, qvars, _ = run_ptq(graph, variables, x, task="lits",
                               init_stride=(2, 2, 2),
                               hp=PTQHyperParams(admm_iter=5))

    # export as if calibrated at qlvl 16 for one layer (a mixed run):
    # codes 0..15 with the matching override recorded
    node = next(n for n in fgraph.qconv_nodes()
                if n.attrs["qcfg"].q_weight
                and n.attrs["qcfg"].qlvl_w == 4)  # not the q_first conv
    sd = torch_io.to_torch_state_dict(fgraph, qvars)
    rng = np.random.RandomState(1)
    sd[f"{node.name}.weight"] = rng.randint(
        0, 16, sd[f"{node.name}.weight"].shape).astype(np.uint8)
    sd["__qlvl_overrides__"] = {node.name: (16, 16)}
    path = str(tmp_path / "mixed_int8.pkl")
    with open(path, "wb") as f:
        pickle.dump({"state_dict": sd}, f)

    fresh = nnir.init(fgraph, jax.random.PRNGKey(1))
    # graph still at qlvl_w=4 -> override mismatch must raise
    with pytest.raises(ValueError, match="packed at qlvl_w=16"):
        torch_io.load_int8_checkpoint(fgraph, fresh, path)

    # same codes WITHOUT the override map: the range check must catch it
    sd.pop("__qlvl_overrides__")
    with open(path, "wb") as f:
        pickle.dump({"state_dict": sd}, f)
    with pytest.raises(ValueError, match="exceeds qlvl_w-1"):
        torch_io.load_int8_checkpoint(fgraph, fresh, path)

    # with the graph rebuilt on the export's grids, the load succeeds
    from efficientq_tpu.ptq import apply_qlvl_overrides

    sd["__qlvl_overrides__"] = {node.name: (16, 16)}
    with open(path, "wb") as f:
        pickle.dump({"state_dict": sd}, f)
    assert torch_io.read_export_qlvl_overrides(path) == {node.name: (16, 16)}
    g16 = apply_qlvl_overrides(fgraph, {node.name: (16, 16)})
    restored = torch_io.load_int8_checkpoint(g16, fresh, path)
    got = np.asarray(restored["params"][node.name]["kernel"])
    assert np.isfinite(got).all()
