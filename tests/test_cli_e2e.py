"""Full CLI end-to-end: train_fp then ptq on a synthetic LiTS-like dataset
through the entrance.py argument surface (the reference's usage pattern,
README.md:40-52)."""
import glob
import json
import os
import os.path as P

import numpy as np
import pytest

from efficientq_tpu.cli.entrance import build_parser, main, merge_config
from efficientq_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir, split_dir = make_synthetic_dataset(
        str(root), task="lits", n_subjects=4, vol_shape=(16, 16, 16))
    return str(root), data_dir, split_dir


TINY_MODEL = [
    "--width", "4,8,4", "--depth", "1,1,1", "--dilation", "1,1,1",
    "--init_stride", "2,2,1", "--blk", "mid", "--ds", "simple",
    "--hetero_dim", "--drop_rate", "0.0", "--nMod", "1", "--nClass", "3",
]


def test_parser_accepts_reference_flags():
    p = build_parser()
    args = p.parse_args(["ptq", "--qlvl_w", "4", "--qlvl_a", "4",
                         "--round", "1", "--q_first", "256,-1"])
    assert args.mission == "ptq" and args.qlvl_w == 4


def test_yaml_merge_overrides_cli(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("task: lits\nbatch_size: 7\nunset_key:\n")
    p = build_parser()
    args = p.parse_args(["train_fp", "--task", "brats", "--batch_size", "2"])
    args = merge_config(str(cfg), args)
    assert args.task == "lits" and args.batch_size == 7  # YAML wins


def test_train_then_ptq_cli(workdir, monkeypatch):
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)

    snap = main([
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1",
        "--patch_size", "8,8,8", "--batch_size", "2", "--crop_type",
        "random", "--loss", "hybrid", "--lr", "0.01", "--max_epoch", "3",
        "--test_interval", "3", "--disp_interval", "1",
        "--access_type", "npy", "--no_test", *TINY_MODEL,
    ])
    ckpts = glob.glob(P.join(snap, "state_0003.pkl"))
    assert ckpts, os.listdir(snap)
    assert P.isfile(P.join(snap, "loss.txt"))
    assert P.isfile(P.join(snap, "cmd.txt"))

    snap_ptq = main([
        "ptq", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpts[0],
        "--patch_size", "8,8,8", "--access_type", "npy",
        "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "4,4,4", "--lwq_iter", "10",
        # lwq_patchsz 4 < slide patch 8: tune_act's validated scoring must
        # clamp its sliding geometry to the calibration crop (regression:
        # grid_starts used to reject patch > volume mid-mission).  4 is the
        # smallest crop this net accepts (min_input_divisor = (4, 4, 2))
        "--tune_act", "3", "--is_cc", "--true_test", "--export_artifact",
        *TINY_MODEL,
    ])
    # reference artifact set (ptqer.py:366-387)
    for fname in ("time_cost.txt", "layer_loss.txt", "class_voxel_nums.txt",
                  "state_in_fp.pkl", "state_in_int8.pkl",
                  "state_in_int8_compress.npz", "cmd.txt"):
        assert P.isfile(P.join(snap_ptq, fname)), fname
    assert glob.glob(P.join(snap_ptq, "Qseg*.nii.gz"))
    assert glob.glob(P.join(snap_ptq, "FPseg*.nii.gz"))
    # eval ran and produced the per-split metric files
    assert P.isfile(P.join(snap_ptq, "ptq", "val_seg.txt"))
    with open(P.join(snap_ptq, "layer_loss.txt")) as f:
        lines = f.read().splitlines()
    assert len(lines) > 5
    assert all(":" in l for l in lines)
    # --is_cc: lesion-level metrics present in the metric files
    with open(P.join(snap_ptq, "ptq", "val_seg.txt")) as f:
        val_txt = f.read()
    assert "fpl" in val_txt and "fnl" in val_txt and "totall" in val_txt
    # --true_test: label-free NIfTI export of the true-test split
    tt = glob.glob(P.join(snap_ptq, "ptq", "true_test", "*.nii.gz"))
    assert tt, os.listdir(P.join(snap_ptq, "ptq"))
    # --tune_act: loss curve written, finite and (weakly) decreasing start
    with open(P.join(snap_ptq, "tune_act_loss.txt")) as f:
        tune_losses = [float(v) for v in f.read().split()]
    assert len(tune_losses) == 3 and all(np.isfinite(tune_losses))
    # validated early stopping: scores at iter 0 and the last iter, with
    # exactly one kept iterate (iteration 0 counts — the overfit guard)
    with open(P.join(snap_ptq, "tune_act_score.txt")) as f:
        score_lines = f.read().splitlines()
    assert len(score_lines) == 2 and sum("kept" in l for l in score_lines) == 1

    # mesh-parallel PTQ from the CLI: sharded Gram calibration + sharded
    # patch-grid eval over 2 of the 8 virtual devices
    snap_dp = main([
        "ptq", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpts[0],
        "--patch_size", "8,8,8", "--access_type", "npy",
        "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "5",
        "--dp_devices", "2", "--suffix", "dp", *TINY_MODEL,
    ])
    assert P.isfile(P.join(snap_dp, "layer_loss.txt"))
    assert P.isfile(P.join(snap_dp, "ptq", "val_seg.txt"))

    # --lwq_select: calibration-volume selection (ptq/select.py) — two
    # candidates calibrated, the best by train-volume dice kept
    snap_sel = main([
        "ptq", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpts[0],
        "--patch_size", "8,8,8", "--access_type", "npy",
        "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "5",
        "--lwq_select", "2", "--no_test", "--suffix", "sel", *TINY_MODEL,
    ])
    with open(P.join(snap_sel, "calib_select.txt")) as f:
        sel_lines = f.read().splitlines()
    assert len(sel_lines) == 2 and sum("picked" in l for l in sel_lines) == 1
    # selection composes with mesh-sharded calibration (--dp_devices):
    # every candidate's Gram accumulation shards over the mesh
    snap_seldp = main([
        "ptq", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpts[0],
        "--patch_size", "8,8,8", "--access_type", "npy",
        "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "5",
        "--lwq_select", "2", "--dp_devices", "2", "--no_test",
        "--suffix", "seldp", *TINY_MODEL,
    ])
    with open(P.join(snap_seldp, "calib_select.txt")) as f:
        assert sum("picked" in l for l in f.read().splitlines()) == 1
    scores = [float(l.split("dice ")[1].split()[0]) for l in sel_lines]
    assert all(np.isfinite(s) for s in scores)
    picked_idx = next(i for i, l in enumerate(sel_lines) if "picked" in l)
    assert scores[picked_idx] == max(scores)
    # the selected net's artifacts still export
    assert P.isfile(P.join(snap_sel, "layer_loss.txt"))
    assert P.isfile(P.join(snap_sel, "state_in_int8.pkl"))

    # infer mission: reload PTQ exports and serve without recalibrating
    INFER_ARGS = [
        "infer", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1",
        "--patch_size", "8,8,8", "--access_type", "npy",
        "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--q_first", "256,-1", "--q_last", "256,-1", *TINY_MODEL,
    ]

    def dsc_vals(path):
        # line 2 = the final head's totals, "acc = .., dsc = .., .."
        with open(path) as f:
            line = f.readlines()[1]
        return [float(kv.split("=")[1]) for kv in line.split(",")
                if kv.strip().startswith("dsc")]

    want = dsc_vals(P.join(snap_ptq, "ptq", "val_seg.txt"))

    # fp-valued export + fake-quant graph: must reproduce the ptq run's
    # quantized val dice exactly (same math, same values)
    snap_fp = main(INFER_ARGS + [
        "--pretrain", P.join(snap_ptq, "state_in_fp.pkl"),
        "--suffix", "inffp"])
    got = dsc_vals(P.join(snap_fp, "infer", "val_seg.txt"))
    assert got, "no dsc entries parsed"
    np.testing.assert_allclose(got, want, atol=1e-6)

    # serving artifact: the ptq run serialized its final-head forward
    # (--export_artifact); serving from it needs NO model/quant flags and
    # must reproduce the ptq run's final-head val dice — same math, just
    # through the deserialized StableHLO module.  --true_test exercises
    # the artifact path of the label-free exporter too.
    art_path = P.join(snap_ptq, "serving_artifact.zip")
    assert P.isfile(art_path)
    snap_art = main([
        "infer", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--patch_size", "8,8,8",
        "--access_type", "npy", "--artifact", art_path,
        "--true_test", "--suffix", "art"])
    got_art = dsc_vals(P.join(snap_art, "infer", "val_seg.txt"))
    assert got_art, "no dsc entries parsed"
    np.testing.assert_allclose(got_art, want, atol=1e-6)
    assert glob.glob(P.join(snap_art, "infer", "true_test", "*.nii.gz"))

    # packed-int8 npz + the int8 deployment rewrite: the pack/unpack
    # float roundtrip (atol 1e-5 on kernels) can flip near-tie voxels on
    # this chance-level 3-epoch toy — and the full-coverage eval grid
    # (27 stitched patches since the overlap clamp) sums many such
    # near-ties per voxel — so the dice check is loose; the deploy
    # rewrite's bit-exactness has its own test (test_int8_deploy)
    snap_inf = main(INFER_ARGS + [
        "--pretrain", P.join(snap_ptq, "state_in_int8_compress.npz"),
        "--deploy", "int8", "--suffix", "inf"])
    got8 = dsc_vals(P.join(snap_inf, "infer", "val_seg.txt"))
    assert got8 and all(np.isfinite(got8))
    np.testing.assert_allclose(got8, want, atol=0.15)

    # mixed-precision export roundtrip: the per-layer grids ship in the
    # export (__qlvl_overrides__) and infer rebuilds them — reloading on
    # the uniform CLI grids used to unpack lifted layers ~5x out of range
    snap_mx = main([
        "ptq", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpts[0],
        "--patch_size", "8,8,8", "--access_type", "npy",
        "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "5",
        "--mixed_frac", "0.5", "--no_test", "--suffix", "mx",
        *TINY_MODEL,
    ])
    with open(P.join(snap_mx, "mixed_upgraded.txt")) as f:
        assert f.read().strip(), "no layers lifted at mixed_frac 0.5"
    mx_fp = main(INFER_ARGS + [
        "--pretrain", P.join(snap_mx, "state_in_fp.pkl"),
        "--suffix", "mxfp"])
    mx_8 = main(INFER_ARGS + [
        "--pretrain", P.join(snap_mx, "state_in_int8_compress.npz"),
        "--suffix", "mx8"])
    got_fp = dsc_vals(P.join(mx_fp, "infer", "val_seg.txt"))
    got_8 = dsc_vals(P.join(mx_8, "infer", "val_seg.txt"))
    assert got_fp and all(np.isfinite(got_fp))
    np.testing.assert_allclose(got_8, got_fp, atol=0.05)


def test_incompatible_spatial_shapes_rejected(workdir, monkeypatch):
    """Shapes that cannot flow through the encoder/decoder (odd extent at a
    pool -> skip-add mismatch) fail fast with a named-flag ValueError
    instead of a broadcast TypeError mid-mission.  The tiny model's
    min_input_divisor is (4, 4, 2): init_stride (2,2,1) x one pool-2."""
    from efficientq_tpu.models import UResQConfig, min_input_divisor

    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 1))
    assert min_input_divisor(cfg) == (4, 4, 2)

    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    base = ["--task", "lits", "--data_dir", data_dir, "--split_dir",
            split_dir, "--round", "1", "--access_type", "npy", *TINY_MODEL]
    with pytest.raises(ValueError, match="--patch_size.*multiples"):
        main(["train_fp", *base, "--patch_size", "6,6,6", "--max_epoch", "1"])
    with pytest.raises(ValueError, match="--lwq_patchsz.*multiples"):
        main(["ptq", *base, "--patch_size", "8,8,8", "--qconv", "effq",
              "--pretrain", "unused.pkl", "--lwq_patchsz", "6,6,6"])


def test_mesh_shape_and_serve_stem_cli(workdir, monkeypatch, capsys):
    """Round-4 surfaces through the product CLI: --mesh_shape D,I trains
    on a hybrid (dcn x ici) mesh (single-process here: 2x4 over the 8
    virtual CPU devices) and --serve_stem s2d falls back gracefully on a
    graph with no eligible stem (CPU backend: no Pallas int8 consumer)."""
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)

    snap = main([
        "train_fp", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1",
        "--patch_size", "8,8,8", "--batch_size", "8", "--crop_type",
        "random", "--loss", "hybrid", "--lr", "0.01", "--max_epoch", "2",
        "--test_interval", "5", "--disp_interval", "1",
        "--access_type", "npy", "--no_test", "--mesh_shape", "2,4",
        "--fsdp", "--suffix", "hybrid", *TINY_MODEL,
    ])
    assert glob.glob(P.join(snap, "state_0002.pkl")), os.listdir(snap)
    out = capsys.readouterr().out
    assert "Hybrid data mesh dcn=2 x ici=4" in out

    ckpt = glob.glob(P.join(snap, "state_0002.pkl"))[0]
    snap_ptq = main([
        "ptq", "--task", "lits", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpt,
        "--patch_size", "8,8,8", "--access_type", "npy",
        "--qconv", "effq", "--qlvl_w", "4", "--qlvl_a", "4",
        "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "3",
        "--serve_stem", "s2d", "--serve_dtype", "bf16",
        "--suffix", "s2dserve", *TINY_MODEL,
    ])
    out = capsys.readouterr().out
    # no eligible stem on the CPU fake-quant graph -> printed fallback,
    # and the eval still completes with metric files
    assert "serve_stem=s2d: no eligible stem" in out
    assert P.isfile(P.join(snap_ptq, "ptq", "val_seg.txt"))
