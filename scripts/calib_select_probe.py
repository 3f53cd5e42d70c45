#!/usr/bin/env python3
"""Probe: can a user *select* a good calibration volume without val labels?

The W2A2 calibration matrix (docs/quantization.md) showed held-out dice is
bimodal and dominated by which volume calibrates the net — a ~0.1 dice
swing, larger than any mode choice.  The reference leaves the choice to
``--lwq_dataid`` with no guidance (src/ptqer.py:86-109).  This probe runs
PTQ once per candidate calibration volume and scores each result with two
val-label-free proxies:

  * err_held  — mean |out_q − out_fp| on the *other* candidate volumes
                (cross-validated reconstruction error)
  * train_dice — quantized dice on the training split (labels the user
                legitimately has)

then reports how each proxy ranks against the true val dice.  If a proxy
ranks well, `--calib_select` in the product can automate the choice.

Run: EFFQ_PLATFORM=cpu python scripts/calib_select_probe.py --epochs 400
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as P
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
from efficientq_tpu.models import UResQConfig, build_uresq, torch_io
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.train import Trainer

WIDTHS = [8, 16, 32, 16, 8]


def model_cfg(qlvl=None, init_stride=(2, 2, 2)):
    q = qlvl is not None
    return UResQConfig(
        num_mod=1, num_classes=3, depth_config=[1] * len(WIDTHS),
        width_config=WIDTHS, dilation_config=[1] * len(WIDTHS),
        init_stride=init_stride, drop_rate=0.2, blk_type="mid", ds="simple",
        ds_depth_limit=3, drop_cut_thres=128,
        quantize=q, qlvl_w=qlvl or 4, qlvl_act=qlvl or 4,
        q_first=(256, -1), q_last=(256, -1))


def fg_dice(graph, variables, loader, sn, num_mo, mode, patch, overlap):
    sm = validate_seg(graph, variables, loader, sn, num_mo, 3,
                      patch_size=patch, overlap=overlap, mode=mode)
    return sm[-1].get_metric()["dsc"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--subjects", type=int, default=8)
    ap.add_argument("--admm_iter", type=int, default=200)
    ap.add_argument("--qlvl", type=int, default=4)
    ap.add_argument("--offsets", default="0,1,2,3")
    ap.add_argument("--granularity", default="layer")
    ap.add_argument("--channel_wise", action="store_true")
    ap.add_argument("--out", default="experiments/calib_select_probe.json")
    args = ap.parse_args()
    offsets = [int(x) for x in args.offsets.split(",")]
    patch, overlap = (16, 16, 16), (4, 4, 4)

    root = tempfile.mkdtemp(prefix="effq_calibsel_")
    data_dir, split_dir = make_synthetic_dataset(
        root, task="lits", n_subjects=args.subjects, vol_shape=(32,) * 3,
        seed=0)
    hub = DataHub(
        data_dir, task_modalities("lits"),
        train_split=f"{split_dir}/round1/train.txt",
        val_split=f"{split_dir}/round1/val.txt",
        train_batchsize=4, test_batchsize=1, access_type="npy",
        crop_type="balance", balance_rate=0.8,
        balance_mask_func=lambda label: label == 2,
        crop_size_img=patch, slide_patch_size=patch, slide_overlap=overlap)

    cfg = model_cfg()
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    n_mo = len(graph.outputs)
    tr = Trainer(graph, variables, hub, loss_name="hybrid", num_mo=n_mo,
                 n_class=3, base_lr=0.01, max_epoch=args.epochs,
                 snapshot_root=P.join(root, "snap"),
                 test_interval=10 ** 9, display_interval=10 ** 9)
    t0 = time.time()
    for _ in range(args.epochs):
        tr.train_epoch()
    print(f"trained {args.epochs} epochs in {time.time() - t0:.1f}s")
    fp_val = fg_dice(graph, tr.variables, hub.valloader, hub.val_sn, n_mo,
                     "fp", patch, overlap)
    print(f"FP val dice: {fp_val:.4f}")

    # candidate calibration volumes (sequential train subjects, full 32^3)
    hub.trainseqloader.dataset.use_fix_transform()
    seq = iter(hub.trainseqloader)
    vols = [ops.ncdhw_to_ndhwc(jnp.asarray(next(seq)[0]))
            for _ in range(max(offsets) + 1)]

    fp_apply = jax.jit(lambda v, x: nnir.apply(graph, v, x, mode="fp"))
    fp_outs = [np.asarray(fp_apply(tr.variables, v)[-1]) for v in vols]

    sd = torch_io.to_torch_state_dict(graph, tr.variables)
    hp = PTQHyperParams(admm_iter=args.admm_iter,
                        channel_wise=args.channel_wise)
    rows = {}
    for o in offsets:
        qcfg = model_cfg(args.qlvl)
        qgraph = build_uresq(qcfg)
        qvars = torch_io.load_torch_state_dict(
            qgraph, nnir.init(qgraph, jax.random.PRNGKey(0)), sd)
        t0 = time.time()
        fg, fv, _ = run_ptq(qgraph, qvars, vols[o], task="lits",
                            init_stride=(2, 2, 2), hp=hp,
                            granularity=args.granularity)
        calib_sec = time.time() - t0
        q_apply = jax.jit(lambda v, x: nnir.apply(fg, v, x, mode="quantized"))
        errs = [float(jnp.mean(jnp.abs(q_apply(fv, v)[-1] - f)))
                for v, f in zip(vols, fp_outs)]
        err_self = errs[o]
        err_held = float(np.mean([e for j, e in enumerate(errs) if j != o]))
        train_d = fg_dice(fg, fv, hub.trainseqloader, hub.train_sn, n_mo,
                          "quantized", patch, overlap)
        val_d = fg_dice(fg, fv, hub.valloader, hub.val_sn, n_mo,
                        "quantized", patch, overlap)
        rows[o] = {"err_self": err_self, "err_held": err_held,
                   "train_dice": train_d, "val_dice": val_d,
                   "calib_seconds": calib_sec}
        print(f"offset {o}: err_self {err_self:.4f} err_held {err_held:.4f} "
              f"train_dice {train_d:.4f} val_dice {val_d:.4f} "
              f"({calib_sec:.0f}s)")

    # would each proxy have picked the best-val-dice draw?
    best_val = max(rows, key=lambda o: rows[o]["val_dice"])
    picks = {"by_err_held": min(rows, key=lambda o: rows[o]["err_held"]),
             "by_train_dice": max(rows, key=lambda o: rows[o]["train_dice"]),
             "by_err_self": min(rows, key=lambda o: rows[o]["err_self"])}
    summary = {p: {"pick": k, "val_dice": rows[k]["val_dice"],
                   "regret": rows[best_val]["val_dice"] - rows[k]["val_dice"]}
               for p, k in picks.items()}
    out = {"fp_val_dice": fp_val, "qlvl": args.qlvl,
           "granularity": args.granularity,
           "channel_wise": args.channel_wise,
           "rows": rows, "best_val_offset": best_val, "proxies": summary}
    with open(P.join(P.dirname(P.abspath(__file__)), "..", args.out),
              "w") as f:
        from efficientq_tpu.utils.toolchain import toolchain_fingerprint
        out["toolchain"] = toolchain_fingerprint()
        json.dump(out, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
