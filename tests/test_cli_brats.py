"""BraTS-path CLI e2e: multi-label split, conservative fusion, bhybrid loss,
4-modality data, npz access, body-masked PTQ attention."""
import glob
import os.path as P

import pytest

from efficientq_tpu.cli.entrance import main
from efficientq_tpu.data.synthetic import make_synthetic_dataset

TINY = [
    "--width", "4,8,4", "--depth", "1,1,1", "--dilation", "1,1,1",
    "--init_stride", "2,2,2", "--blk", "mid", "--ds", "simple",
    "--hetero_dim", "--drop_rate", "0.0", "--nMod", "4", "--nClass", "4",
    "--multi_label", "brats", "--merge_type", "con", "--access_type", "npz",
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats_e2e")
    data_dir, split_dir = make_synthetic_dataset(
        str(root), task="brats", n_subjects=4, vol_shape=(16, 16, 16),
        access_type="npz")
    return str(root), data_dir, split_dir


def test_brats_train_then_ptq(workdir, monkeypatch):
    root, data_dir, split_dir = workdir
    monkeypatch.chdir(root)
    snap = main([
        "train_fp", "--task", "brats", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--patch_size", "8,8,8",
        "--batch_size", "2", "--crop_type", "balance", "--balance_rate",
        "0.5", "--loss", "bhybrid", "--lr", "0.01", "--max_epoch", "2",
        "--test_interval", "2", "--disp_interval", "1", "--no_test", *TINY,
    ])
    ckpt = glob.glob(P.join(snap, "state_0002.pkl"))[0]

    snap_ptq = main([
        "ptq", "--task", "brats", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpt,
        "--patch_size", "8,8,8", "--qconv", "effq", "--qlvl_w", "4",
        "--qlvl_a", "4", "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "5", *TINY,
    ])
    assert P.isfile(P.join(snap_ptq, "layer_loss.txt"))
    assert P.isfile(P.join(snap_ptq, "ptq", "val_seg.txt"))
    # 4 class-voxel counts for brats (bkg, WT, TC, ET)
    with open(P.join(snap_ptq, "class_voxel_nums.txt")) as f:
        assert len(f.read().split()) == 4

    # calibration-volume selection through the multilabel scoring path
    snap_sel = main([
        "ptq", "--task", "brats", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1", "--pretrain", ckpt,
        "--patch_size", "8,8,8", "--qconv", "effq", "--qlvl_w", "4",
        "--qlvl_a", "4", "--q_first", "256,-1", "--q_last", "256,-1",
        "--lwq_patchsz", "16,16,16", "--lwq_iter", "5",
        "--lwq_select", "2", "--no_test", "--suffix", "sel", *TINY,
    ])
    with open(P.join(snap_sel, "calib_select.txt")) as f:
        lines = f.read().splitlines()
    assert len(lines) == 2 and sum("picked" in l for l in lines) == 1

    # serve the packed export on the brats multilabel path
    snap_inf = main([
        "infer", "--task", "brats", "--data_dir", data_dir,
        "--split_dir", split_dir, "--round", "1",
        "--pretrain", P.join(snap_ptq, "state_in_int8_compress.npz"),
        "--patch_size", "8,8,8", "--qconv", "effq", "--qlvl_w", "4",
        "--qlvl_a", "4", "--q_first", "256,-1", "--q_last", "256,-1",
        "--deploy", "mixed", "--suffix", "inf", *TINY,
    ])
    assert P.isfile(P.join(snap_inf, "infer", "val_seg.txt"))
