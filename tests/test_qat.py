"""QAT fine-tuning (ptq/qat.py): STE-differentiable fq training, epoch
selection, grid snapping, and the --qat_epochs CLI surface.

Beyond-reference capability: the reference stops at PTQ calibration
(src/ptqer.py:282-387); a QAT stage is the standard escape hatch when
sub-4-bit calibration lands in a bad basin (docs/quantization.md)."""
import glob
import os.path as P

import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.ptq.qat import run_qat, snap_to_grid


def build_tiny_q(n_mod=1):
    cfg = UResQConfig(
        num_mod=n_mod, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid", ds="simple",
        ds_depth_limit=3, quantize=True, qlvl_w=4, qlvl_act=4,
        q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return cfg, graph, variables


def make_hub(tmp_path):
    data_dir, split_dir = make_synthetic_dataset(
        str(tmp_path), task="lits", n_subjects=3, vol_shape=(16, 16, 16))
    return DataHub(
        data_dir, task_modalities("lits"),
        train_split=f"{split_dir}/round1/train.txt",
        val_split=f"{split_dir}/round1/val.txt",
        train_batchsize=2, test_batchsize=1, access_type="npy",
        crop_type="random", crop_size_img=(8, 8, 8),
        slide_patch_size=(8, 8, 8), slide_overlap=(2, 2, 2))


def _calibrate(graph, variables, n_mod=1):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, n_mod).astype(np.float32))
    hp = PTQHyperParams(admm_iter=10)
    return run_ptq(graph, variables, x, task="lits",
                   init_stride=(2, 2, 2), hp=hp), x


def test_fq_train_mode_is_ste_differentiable():
    """grad through apply(train=True, mode='fq') reaches kernels AND the
    quantization ranges (alpha_w / alpha_act), finite and nonzero."""
    cfg, graph, variables = build_tiny_q()
    (fgraph, qvars, _), x = _calibrate(graph, variables)

    def loss(params):
        out, _ = nnir.apply(fgraph, {"params": params, "state": {}}, x,
                            train=True, rng=jax.random.PRNGKey(1),
                            mode="fq")
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(qvars["params"])
    qnode = next(n for n in fgraph.qconv_nodes()
                 if n.attrs["qcfg"].q_weight and n.attrs["qcfg"].q_act)
    g = grads[qnode.name]
    for key in ("kernel", "alpha_w", "alpha_act"):
        arr = np.asarray(g[key])
        assert np.all(np.isfinite(arr)), key
        assert np.any(arr != 0.0), f"{key} got zero gradient (STE broken?)"


def test_run_qat_trains_and_snaps_to_grid(tmp_path):
    cfg, graph, variables = build_tiny_q()
    (fgraph, qvars, _), x = _calibrate(graph, variables)
    hub = make_hub(tmp_path)

    out_vars, log = run_qat(
        fgraph, qvars, hub, num_mo=len(fgraph.outputs), n_class=3,
        loss_name="hybrid", epochs=3, lr=3e-3,
        snapshot_root=str(tmp_path / "qat"))

    # sinks + log integrity
    assert P.isfile(str(tmp_path / "qat" / "qat_loss.txt"))
    assert len(log["history"]) == 3
    assert all(np.isfinite(h["loss"]) for h in log["history"])
    assert 0 <= log["kept_epoch"] <= 3
    # STE training moves the latent weights (epoch params differ from PTQ)
    # and the train loss is finite and responsive
    assert log["history"][-1]["loss"] != log["history"][0]["loss"]

    # the returned params are deployment-exact: on-grid weights mean
    # fq re-quantization is a no-op, so 'quantized' == 'fq' forward
    out_q = nnir.apply(fgraph, out_vars, x, mode="quantized",
                       precision=jax.lax.Precision.HIGHEST)
    out_fq = nnir.apply(fgraph, out_vars, x, mode="fq",
                        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_fq),
                               atol=1e-5, rtol=1e-5)
    # alphas stayed positive (deployment guard)
    for node in fgraph.qconv_nodes():
        p = out_vars["params"][node.name]
        if "alpha_act" in p:
            assert float(np.min(np.asarray(p["alpha_act"]))) > 0
        if "alpha_w" in p:
            assert float(np.min(np.asarray(p["alpha_w"]))) > 0


def test_snap_to_grid_idempotent_after_ptq():
    """PTQ output weights are already on the grid: snapping is a no-op."""
    cfg, graph, variables = build_tiny_q()
    (fgraph, qvars, _), x = _calibrate(graph, variables)
    before = jax.tree.map(np.asarray, qvars["params"])
    snap_to_grid(fgraph, qvars)
    for name, p in qvars["params"].items():
        np.testing.assert_allclose(np.asarray(p["kernel"]),
                                   before[name]["kernel"],
                                   atol=1e-6, rtol=1e-6)


def test_qat_cli_surface(tmp_path, monkeypatch):
    """--qat_epochs runs inside the ptq mission and writes its sink."""
    from efficientq_tpu.cli.entrance import main

    root = str(tmp_path)
    data_dir, split_dir = make_synthetic_dataset(
        root, task="lits", n_subjects=3, vol_shape=(16, 16, 16))
    monkeypatch.chdir(root)
    tiny = ["--width", "4,8,4", "--depth", "1,1,1", "--dilation", "1,1,1",
            "--init_stride", "2,2,1", "--blk", "mid", "--ds", "simple",
            "--hetero_dim", "--drop_rate", "0.0", "--nMod", "1",
            "--nClass", "3", "--patch_size", "8,8,8"]
    snap = main([
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--batch_size", "2",
        "--crop_type", "random", "--loss", "ce", "--lr", "0.01",
        "--max_epoch", "2", "--test_interval", "5", "--disp_interval", "1",
        "--no_test", *tiny])
    ckpt = glob.glob(P.join(snap, "state_0002.pkl"))[0]
    snap_ptq = main([
        "ptq", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpt,
        "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "10",
        "--qat_epochs", "1", "--qat_lr", "1e-3", "--batch_size", "2",
        "--crop_type", "random", "--loss", "ce", "--no_test", *tiny])
    sink = P.join(snap_ptq, "qat", "qat_loss.txt")
    assert P.isfile(sink)
    text = open(sink).read()
    assert "epoch 1" in text and "<- kept" in text
    # the saved quantized state must be on-grid (deployable): reload the
    # export and assert every quantized kernel is a fixed point of its
    # fake-quant map — mode="quantized" (int codes) and mode="fq"
    # (fake-quant from latent weights) provably agree iff the latent
    # weights already sit on the grid, which is what snap_to_grid
    # guarantees after STE training moved them off it
    import pickle

    from efficientq_tpu.quant import fake_quant_weight

    with open(P.join(snap_ptq, "state_in_fp.pkl"), "rb") as f:
        sd = pickle.load(f)["state_dict"]
    overrides = sd["__qlvl_overrides__"]
    assert overrides, "export must carry the per-layer grid map"
    checked = 0
    for name, (qlvl_w, _qlvl_a) in overrides.items():
        if qlvl_w <= 0 or f"{name}.alpha_w" not in sd:
            continue
        w = np.asarray(sd[f"{name}.weight"], dtype=np.float32)
        alpha = np.asarray(sd[f"{name}.alpha_w"], dtype=np.float32)
        # torch layout (O, I, kd, kh, kw) -> per-O alpha broadcast
        a = alpha.reshape((-1,) + (1,) * (w.ndim - 1))
        snapped = np.asarray(
            fake_quant_weight(jnp.asarray(np.moveaxis(w, 0, -1)),
                              jnp.asarray(alpha), qlvl_w))
        np.testing.assert_allclose(np.moveaxis(w, 0, -1), snapped,
                                   atol=1e-6, rtol=0)
        assert a.shape[0] in (1, w.shape[0])
        checked += 1
    assert checked > 0
