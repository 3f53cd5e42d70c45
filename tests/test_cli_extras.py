"""Coverage for secondary CLI/eval paths: --test_fp, label-free inference,
--bin_label, --resume."""
import glob
import os
import os.path as P

import numpy as np
import pytest

from efficientq_tpu.cli.entrance import main
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities

TINY = [
    "--width", "4,8,4", "--depth", "1,1,1", "--dilation", "1,1,1",
    "--init_stride", "2,2,1", "--blk", "mid", "--ds", "simple",
    "--hetero_dim", "--drop_rate", "0.0", "--nMod", "1", "--nClass", "3",
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("extras")
    data_dir, split_dir = make_synthetic_dataset(
        str(root), task="lits", n_subjects=4, vol_shape=(16, 16, 16))
    return str(root), data_dir, split_dir


def test_ptq_with_test_fp(workdir, monkeypatch):
    root, data_dir, split_dir = workdir
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
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "3", "--test_fp",
        # column serving through the mission surface: full-depth columns
        # (stride_div derived from the model config in missions.py)
        "--serve_grid", "column", "--no_test",
        # autotuner policy surface (VERDICT r3 item 6): 'off' must parse
        # and disable the sweep on eval-bearing missions
        "--tune_serving", "off", *TINY,
    ])
    # --test_fp evaluates the FP model before quantization (ptqer.py:309-310)
    assert P.isfile(P.join(snap_ptq, "fp", "val_seg.txt"))
    # per-layer ADMM trajectories (ptqer.py:275-279 observability)
    curves = np.load(P.join(snap_ptq, "layer_loss_curve.npz"))
    loss_keys = [k for k in curves.files if k.endswith("/loss")]
    assert loss_keys and all(curves[k].shape == (3,) for k in loss_keys)


def test_label_free_inference(workdir, tmp_path):
    import jax

    from efficientq_tpu import nnir
    from efficientq_tpu.data.datahub import DataHub
    from efficientq_tpu.eval.validate import inference
    from efficientq_tpu.models import UResQConfig, build_uresq

    root, data_dir, split_dir = workdir
    # sn -> filename map for affine lookup (missing files fall back to eye)
    with open(P.join(data_dir, "sn_fn.txt"), "w") as f:
        for sn in ("sub000", "sub001"):
            f.write(f"{sn},{data_dir}/{sn}_missing.nii\n")
    hub = DataHub(data_dir, task_modalities("lits"),
                  true_test_split=f"{split_dir}/round1/val.txt",
                  test_batchsize=1, access_type="npy", sn_fn_file="sn_fn.txt",
                  slide_patch_size=(8, 8, 8), slide_overlap=(2, 2, 2))
    assert hub.true_test_image_loader is not None
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    out_dir = str(tmp_path / "truetest")
    inference(graph, variables, hub.true_test_image_loader,
              hub.true_test_sn, save_dir=out_dir,
              patch_size=(8, 8, 8), overlap=(2, 2, 2),
              sn_fn_dict=hub.sn_to_fn_map)
    outs = glob.glob(P.join(out_dir, "*_seg.nii.gz"))
    assert len(outs) == len(hub.true_test_sn)


def test_bin_label_pipeline(workdir, monkeypatch):
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    snap = main([
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--patch_size", "8,8,8",
        "--batch_size", "2", "--crop_type", "random", "--loss", "ce",
        "--lr", "0.01", "--max_epoch", "1", "--disp_interval", "1",
        "--bin_label", "1", "--no_test", *TINY[:-2], "--nClass", "3",
    ])
    assert P.isfile(P.join(snap, "loss.txt"))


def test_resume_reuses_experiment_dir(workdir, monkeypatch):
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    common = [
        "--task", "lits", "--data_dir", data_dir, "--split_dir", split_dir,
        "--round", "1", "--patch_size", "8,8,8", "--batch_size", "2",
        "--crop_type", "random", "--loss", "ce", "--lr", "0.01",
        "--disp_interval", "1", "--no_test", *TINY,
    ]
    snap = main(["train_fp", "--max_epoch", "2", "--test_interval", "99",
                 *common])
    ckpt = P.join(snap, "state_0002.pkl")
    assert P.isfile(ckpt)
    snap2 = main(["train_fp", "--max_epoch", "4", "--test_interval", "99",
                  "--resume", ckpt, *common])
    # resumed run continues in the ORIGINAL experiment dir
    # (train_seg.py:68-69) and reaches epoch 4
    assert P.realpath(snap2) == P.realpath(snap)
    assert P.isfile(P.join(snap, "state_0004.pkl"))
    # loss.txt accumulated epochs from both runs
    with open(P.join(snap, "loss.txt")) as f:
        epochs = [int(l.split(",")[0]) for l in f.read().splitlines() if l]
    assert 4 in epochs and min(epochs) == 1


def test_nla_and_norm_flags():
    """--nla maps to inplace_nla (definer.py:179-184); unsupported values and
    non-BN norms hard-error (definer.py:187-191) instead of being ignored."""
    from efficientq_tpu.cli.definer import get_model_config
    from efficientq_tpu.cli.entrance import build_parser

    base = ["train_fp", "--task", "lits", *TINY]
    parser = build_parser()

    cfg, _, _ = get_model_config(parser.parse_args(base))
    assert cfg.inplace_nla is True
    cfg, _, _ = get_model_config(parser.parse_args(base + ["--nla", "reluf"]))
    assert cfg.inplace_nla is False
    with pytest.raises(RuntimeError, match="Unknown NLA"):
        get_model_config(parser.parse_args(base + ["--nla", "gelu"]))
    with pytest.raises(NotImplementedError, match="Norm type"):
        get_model_config(parser.parse_args(
            base + ["--norm", "gn", "--group_num", "8"]))


def test_orbax_ckpt_backend_resume(workdir, monkeypatch):
    """--ckpt_backend orbax: directory checkpoints, resume continues the
    run in the original experiment dir with optimizer state restored."""
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    common = [
        "--task", "lits", "--data_dir", data_dir, "--split_dir", split_dir,
        "--round", "1", "--patch_size", "8,8,8", "--batch_size", "2",
        "--crop_type", "random", "--loss", "ce", "--lr", "0.01",
        "--disp_interval", "1", "--no_test", "--ckpt_backend", "orbax",
        *TINY,
    ]
    snap = main(["train_fp", "--max_epoch", "2", "--test_interval", "99",
                 *common])
    ckpt = P.join(snap, "state_0002.orbax")
    assert P.isdir(ckpt)
    snap2 = main(["train_fp", "--max_epoch", "3", "--test_interval", "99",
                  "--resume", ckpt, *common])
    assert P.realpath(snap2) == P.realpath(snap)
    assert P.isdir(P.join(snap, "state_0003.orbax"))
    with open(P.join(snap, "loss.txt")) as f:
        epochs = [int(l.split(",")[0]) for l in f.read().splitlines() if l]
    assert 3 in epochs and min(epochs) == 1


@pytest.mark.parametrize("fsdp", [False, True])
def test_dp_devices_cli_training(workdir, monkeypatch, fsdp):
    """--dp_devices -1 trains data-parallel over the (simulated) 8-device
    mesh through the real CLI; --fsdp additionally shards the params +
    optimizer state over the same mesh (parallel/mesh.py::fsdp_shardings)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    snap = main([
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--patch_size", "8,8,8",
        "--batch_size", "8", "--crop_type", "random", "--loss", "ce",
        "--lr", "0.01", "--max_epoch", "1", "--test_interval", "99",
        "--disp_interval", "1", "--no_test", "--dp_devices", "-1",
        *(["--fsdp", "--suffix", "fsdp"] if fsdp else []), *TINY,
    ])
    assert P.isfile(P.join(snap, "loss.txt"))
    with open(P.join(snap, "loss.txt")) as f:
        assert len(f.read().strip()) > 0


def test_act_only_quantization(workdir, monkeypatch):
    """--qlvl_w -1 --qlvl_a 4: activation-only quantization — no ADMM, the
    engine fits alpha_act per layer and keeps FP weights
    (PTQConv q_weight=False branch, definer.py:307-310 semantics)."""
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    snap = main([
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--patch_size", "8,8,8",
        "--batch_size", "2", "--crop_type", "random", "--loss", "ce",
        "--lr", "0.01", "--max_epoch", "2", "--test_interval", "99",
        "--disp_interval", "1", "--no_test", *TINY,
    ])
    ckpt = P.join(snap, "state_0002.pkl")
    snap_ptq = main([
        "ptq", "--task", "lits", "--data_dir", data_dir, "--split_dir",
        split_dir, "--round", "1", "--pretrain", ckpt, "--patch_size",
        "8,8,8", "--qconv", "effq", "--qlvl_w", "-1", "--qlvl_a", "4",
        "--lwq_patchsz", "16,16,16", "--no_test", *TINY,
    ])
    assert "actQa4" in snap_ptq  # exp-id tag (definer.py:286-319)
    # no ADMM -> no per-layer losses, but the quantized export exists
    assert P.isfile(P.join(snap_ptq, "state_in_fp.pkl"))
    with open(P.join(snap_ptq, "layer_loss.txt")) as f:
        assert f.read().strip() == ""


def test_post_complex_cli_pipeline(workdir, monkeypatch):
    """train_fp + ptq with --blk post --ds complex through the real CLI
    (the orderings/heads that no preset exercises)."""
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    variant = [
        "--width", "4,8,4", "--depth", "1,1,1", "--dilation", "1,1,1",
        "--init_stride", "2,2,1", "--blk", "post", "--ds", "complex",
        "--hetero_dim", "--drop_rate", "0.0", "--nMod", "1", "--nClass", "3",
    ]
    snap = main([
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--patch_size", "8,8,8",
        "--batch_size", "2", "--crop_type", "random", "--loss", "ce",
        "--lr", "0.01", "--max_epoch", "2", "--test_interval", "99",
        "--disp_interval", "1", "--no_test", *variant,
    ])
    ckpt = P.join(snap, "state_0002.pkl")
    assert P.isfile(ckpt)
    snap_ptq = main([
        "ptq", "--task", "lits", "--data_dir", data_dir, "--split_dir",
        split_dir, "--round", "1", "--pretrain", ckpt, "--patch_size",
        "8,8,8", "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "3", "--no_test",
        *variant,
    ])
    with open(P.join(snap_ptq, "layer_loss.txt")) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]
    assert len(lines) > 0
    assert P.isfile(P.join(snap_ptq, "state_in_int8.pkl"))


def test_calib_candidates_are_single_volumes_with_batched_loader():
    """--lwq_select scores candidates individually, so candidate extraction
    must flatten multi-volume loader batches (--test_batch_size > 1) into
    single volumes — while the reference-parity --lwq_dataid/--lwq_batchsz
    paths keep counting whole batches (ptqer.py:87-103)."""
    from types import SimpleNamespace

    from efficientq_tpu.cli.missions import (get_calibration_candidates,
                                             get_calibration_data)

    class FakeDataset:
        def use_fix_transform(self):
            pass

    class FakeLoader:
        dataset = FakeDataset()

        def __iter__(self):
            rng = np.random.RandomState(0)
            for b in range(3):  # 3 batches x 2 volumes
                yield (rng.randn(2, 1, 8, 8, 8).astype(np.float32),
                       rng.randint(0, 3, (2, 8, 8, 8)))

    hub = SimpleNamespace(trainseqloader=FakeLoader())
    args = SimpleNamespace(lwq_dataid=0, lwq_patchsz="4,4,4",
                           lwq_select=3, lwq_batchsz=1)
    imgs, labels = get_calibration_candidates(args, hub)
    assert len(imgs) == 3 and len(labels) == 3
    assert all(im.shape == (1, 1, 4, 4, 4) for im in imgs)
    # volumes must be DISTINCT (batch flattening, not repetition)
    assert not np.allclose(imgs[0], imgs[1])

    # reference-parity batch semantics: lwq_batchsz counts loader batches
    img, label = get_calibration_data(args, hub)
    assert img.shape[0] == 2  # one 2-volume batch

    # descriptive error when the split runs out
    args_long = SimpleNamespace(lwq_dataid=0, lwq_patchsz="4,4,4",
                                lwq_select=99, lwq_batchsz=1)
    with pytest.raises(ValueError, match="sequential volumes"):
        get_calibration_candidates(args_long, hub)


def test_overlap_flag_validation_and_clamp(workdir, monkeypatch, capsys):
    """--overlap: an explicit overlap >= patch is a real error; without the
    flag, the task preset's hardcoded 16 is clamped so a small --patch_size
    still gets a full-coverage eval grid (definer.get_data_cube)."""
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    base = [
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--patch_size", "8,8,8",
        "--access_type", "npy", "--batch_size", "2", "--crop_type", "random",
        "--loss", "hybrid", "--lr", "0.01", "--max_epoch", "1",
        "--test_interval", "1", "--disp_interval", "1", *TINY,
    ]
    with pytest.raises(ValueError, match="--overlap"):
        main(base + ["--overlap", "8,8,8"])

    main(base + ["--overlap", "2,2,2", "--suffix", "ov"])
    out = capsys.readouterr().out
    assert "overlap clamped" not in out

    main(base + ["--suffix", "ovclamp"])
    out = capsys.readouterr().out
    assert "overlap clamped to (4, 4, 4)" in out
