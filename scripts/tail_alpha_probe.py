#!/usr/bin/env python3
"""Tail alpha_act sweep (VERDICT r5 item 3, second leg).

act_offset_probe.py refuted the offset-grid hypothesis: the trigger
conv's input is post-relu (zero negative mass — measured), so shifting
levels below zero can only lose.  The remaining scale-side lever at
fixed 4-level resolution is the activation CLIP RANGE alpha: the
reconstruction-optimal alpha (project_by_iter) minimizes input MSE, but
the basin mechanism is downstream dice, not input MSE.  This probe
sweeps post-hoc multipliers on the calibrated alpha_act of the trigger
conv (and of both tail convs) and measures held-out dice per draw.

Usage: python scripts/tail_alpha_probe.py [--offsets 0,1,2,3]
"""
from __future__ import annotations

import argparse
import json
import os.path as P
import pickle
import sys
import tempfile
import time

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))

import jax

from efficientq_tpu.cli.entrance import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir, ops
from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities
from efficientq_tpu.eval.validate import validate_seg
from efficientq_tpu.models import torch_io, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from scripts.basin_probe import model_cfg  # noqa: E402

TRIGGER = "u_blocks.UResBlock5.Layer1.block1.conv"
EXIT = "u_blocks.UResBlock5.Layer1.block2.conv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--offsets", default="0,1,2,3")
    ap.add_argument("--ckpt", default="/tmp/effq_basin_gate_ckpt.pkl")
    ap.add_argument("--factors", default="0.6,0.8,1.0,1.3,1.7,2.2,3.0")
    ap.add_argument("--out", default="experiments/tail_alpha_probe.json")
    args = ap.parse_args()
    patch = (16, 16, 16)

    root = tempfile.mkdtemp(prefix="effq_tailalpha_")
    data_dir, split_dir = make_synthetic_dataset(
        root, task="lits", n_subjects=8, vol_shape=(32,) * 3, seed=0)
    hub = DataHub(
        data_dir, task_modalities("lits"),
        train_split=f"{split_dir}/round1/train.txt",
        val_split=f"{split_dir}/round1/val.txt",
        train_batchsize=4, test_batchsize=1, access_type="npy",
        crop_type="balance", balance_rate=0.8,
        balance_mask_func=lambda label: label == 2,
        crop_size_img=patch, slide_patch_size=patch, slide_overlap=(4, 4, 4))

    with open(args.ckpt, "rb") as f:
        sd = pickle.load(f)
    qgraph = build_uresq(model_cfg(4))
    qvars0 = torch_io.load_torch_state_dict(
        qgraph, nnir.init(qgraph, jax.random.PRNGKey(0)), sd)
    n_mo = len(qgraph.outputs)

    hub.trainseqloader.dataset.use_fix_transform()
    all_imgs = [im for im, _ in hub.trainseqloader]
    factors = [float(x) for x in args.factors.split(",")]

    all_lbls = [lb for _, lb in hub.trainseqloader]

    def dice_of(fg, fv, loader=None, sn=None):
        sm = validate_seg(fg, fv, loader or hub.valloader,
                          sn if loader else hub.val_sn, n_mo, 3,
                          patch_size=patch, overlap=(4, 4, 4),
                          mode="quantized")
        return float(sm[-1].get_metric()["dsc"])

    # the PRODUCT mechanism (--tail_alpha_sweep): score candidate factors
    # on labeled TRAIN volumes only, keep the best, then measure the kept
    # variant's held-out val dice — validation never guides the choice
    train_pairs = list(zip(all_imgs[:4], all_lbls[:4]))
    t_sn = [f"t{i}" for i in range(len(train_pairs))]

    results = {}
    for off in (int(x) for x in args.offsets.split(",")):
        calib_x = ops.ncdhw_to_ndhwc(jnp.asarray(all_imgs[off]))
        fg, fv, _ = run_ptq(qgraph, qvars0, calib_x, task="lits",
                            init_stride=(2, 2, 2), hp=PTQHyperParams())
        base = dice_of(fg, fv)
        row = {"base": base, "trigger": {}, "both": {}}

        def variant(names, fac):
            fv2 = {"params": {k: dict(v) for k, v in fv["params"].items()},
                   "state": fv.get("state", {})}
            for nme in names:
                fv2["params"][nme]["alpha_act"] = (
                    fv["params"][nme]["alpha_act"] * fac)
            return fv2

        sel = {"fac": 1.0, "train": None}
        for fac in factors:
            fv2 = variant([TRIGGER, EXIT], fac)
            tr = dice_of(fg, fv2, train_pairs, t_sn)
            if sel["train"] is None or tr > sel["train"]:
                sel = {"fac": fac, "train": tr}
            for key, names in (("trigger", [TRIGGER]),
                               ("both", [TRIGGER, EXIT])):
                t0 = time.time()
                d = dice_of(fg, fv2 if key == "both"
                            else variant(names, fac))
                row[key][str(fac)] = d
                print(f"draw {off} {key:8s} x{fac}: dice {d:.4f} "
                      f"(base {base:.4f}, {time.time() - t0:.0f}s)",
                      flush=True)
        row["selected"] = {"factor": sel["fac"],
                           "train_dice": sel["train"],
                           "val_dice": row["both"][str(sel["fac"])]}
        print(f"draw {off} SELECTED x{sel['fac']} (train {sel['train']:.4f}"
              f" -> val {row['selected']['val_dice']:.4f})", flush=True)
        results[str(off)] = row

    from efficientq_tpu.utils.toolchain import toolchain_fingerprint

    results["toolchain"] = toolchain_fingerprint()
    out = P.join(P.dirname(P.dirname(P.abspath(__file__))), args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "toolchain"},
                     indent=2))


if __name__ == "__main__":
    main()
