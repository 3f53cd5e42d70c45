#!/usr/bin/env python3
"""BraTS-task quality gate, driven through the product CLI missions.

The LiTS gates (scripts/quality_gate.py, docs/quantization.md) established
the recommended sub-4-bit recipe — sensitivity-driven mixed precision plus
calibration-volume selection (``--mixed_frac 0.25 --lwq_select 4``).  This
gate re-runs the question on the OTHER reference task: multilabel BraTS
(4 modalities, nested WT/TC/ET heads, conservative fusion, bhybrid loss —
the reference's flagship config, src/definer.py:30-68), entirely through
``entrance.py train_fp`` / ``ptq`` so every number comes from the product
path, not a bespoke harness.

Legs (all on one trained FP net):
  W4A4 uniform          the headline deployment precision
  W2A2 uniform          the stress precision
  W2A2 + recipe         --mixed_frac 0.25 --mixed_qlvl 16 --lwq_select 4

Writes experiments/brats_gate.json with per-leg mean foreground dice and
the FP reference (from --test_fp on the first ptq leg).

Run:  EFFQ_PLATFORM=cpu python scripts/brats_gate.py [--epochs 300]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as P
import re
import sys
import tempfile
import time

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))

from efficientq_tpu.cli.entrance import main as cli_main  # noqa: E402
from efficientq_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402

MODEL = [
    "--width", "8,16,32,16,8", "--depth", "1,1,1,1,1",
    "--dilation", "1,1,1,1,1", "--init_stride", "2,2,2", "--blk", "mid",
    "--ds", "simple", "--hetero_dim", "--drop_rate", "0.2",
    "--nMod", "4", "--nClass", "4",
    "--multi_label", "brats", "--merge_type", "con", "--access_type", "npz",
]


def mean_dice(seg_txt: str) -> float:
    """Mean of the per-class dsc entries on the FINAL head's aggregate line
    (multilabel BraTS: WT/TC/ET — no background column to drop).  The file
    lists heads as 'Output -1' (the final classifier) first, deeper aux
    heads after — so the first dsc line is the one that matters (same rule
    as tests/test_cli_e2e.py::dsc_vals)."""
    with open(seg_txt) as f:
        lines = [l for l in f.read().splitlines() if "dsc/" in l]
    vals = [float(v) for v in re.findall(r"dsc/\d+ = ([\d.]+)", lines[0])]
    assert vals, seg_txt
    return sum(vals) / len(vals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--subjects", type=int, default=10)
    ap.add_argument("--vol", type=int, default=32)
    ap.add_argument("--lwq_iter", type=int, default=200)
    ap.add_argument("--select", type=int, default=4,
                    help="--lwq_select candidate count for the recipe leg "
                         "(must fit the train split)")
    ap.add_argument("--out", type=str, default="experiments/brats_gate.json")
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="effq_brats_gate_")
    data_dir, split_dir = make_synthetic_dataset(
        root, task="brats", n_subjects=args.subjects,
        vol_shape=(args.vol,) * 3, access_type="npz", seed=0)
    os.chdir(root)

    common = [
        "--task", "brats", "--data_dir", data_dir, "--split_dir", split_dir,
        "--round", "1", "--patch_size", "16,16,16", *MODEL,
    ]

    t0 = time.time()
    snap_fp = cli_main([
        "train_fp", *common, "--batch_size", "4", "--crop_type", "balance",
        "--balance_rate", "0.8", "--loss", "bhybrid", "--lr", "0.01",
        "--max_epoch", str(args.epochs),
        "--test_interval", str(args.epochs), "--disp_interval", "50",
    ])
    train_sec = time.time() - t0
    ckpt = sorted(glob.glob(P.join(snap_fp, "state_*.pkl")))[-1]
    print(f"trained {args.epochs} epochs in {train_sec:.1f}s -> {ckpt}",
          flush=True)

    qflags = ["--pretrain", ckpt, "--qconv", "effq",
              "--q_first", "256,-1", "--q_last", "256,-1",
              "--lwq_patchsz", "32,32,32",
              "--lwq_iter", str(args.lwq_iter)]
    legs = {
        "W4A4": ["--qlvl_w", "16", "--qlvl_a", "16", "--test_fp"],
        "W2A2": ["--qlvl_w", "4", "--qlvl_a", "4"],
        "W2A2+recipe": ["--qlvl_w", "4", "--qlvl_a", "4",
                        "--mixed_frac", "0.25", "--mixed_qlvl", "16",
                        "--lwq_select", str(args.select)],
    }
    results = {"task": "brats", "epochs": args.epochs,
               "subjects": args.subjects, "vol": args.vol,
               "train_seconds": train_sec, "legs": {}}
    fp_dice = None
    for tag, extra in legs.items():
        t0 = time.time()
        snap = cli_main(["ptq", *common, *qflags, *extra,
                         "--suffix", tag.replace("+", "_")])
        calib_sec = time.time() - t0
        q = mean_dice(P.join(snap, "ptq", "val_seg.txt"))
        fp_txt = P.join(snap, "fp", "val_seg.txt")
        if fp_dice is None and P.isfile(fp_txt):
            fp_dice = mean_dice(fp_txt)
            results["fp_dice"] = fp_dice
            print(f"FP mean foreground dice: {fp_dice:.4f}", flush=True)
        results["legs"][tag] = {
            "dice": q, "calib_seconds": calib_sec,
            "delta_vs_fp": None if fp_dice is None else fp_dice - q}
        print(f"{tag}: dice {q:.4f}"
              + (f" (delta {fp_dice - q:+.4f})" if fp_dice is not None
                 else "")
              + f", calib {calib_sec:.1f}s", flush=True)

    out = P.join(P.dirname(P.abspath(__file__)), "..", args.out)
    with open(out, "w") as f:
        from efficientq_tpu.utils.toolchain import toolchain_fingerprint
        results["toolchain"] = toolchain_fingerprint()
        json.dump(results, f, indent=2)
    print(json.dumps(results["legs"], indent=2))


if __name__ == "__main__":
    main()
