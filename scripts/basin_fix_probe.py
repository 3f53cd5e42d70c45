#!/usr/bin/env python3
"""Basin fix probe: test targeted lifts of the cascade-trigger layer found
by basin_probe.py (u_blocks.UResBlock5.Layer1.block1.conv — the last
decoder block's entry conv).  For each calibration draw, run uniform W2A2
with per-layer qlvl_overrides variants and compare held-out dice.

Variants: base (control), lift_both (w+act -> 16), lift_act (act only),
lift_w (w only), lift_block (both convs of the last block).
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

from efficientq_tpu import nnir, ops
from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities
from efficientq_tpu.eval.validate import validate_seg
from efficientq_tpu.models import torch_io, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from scripts.basin_probe import model_cfg, WIDTHS  # noqa: E402

TRIGGER = "u_blocks.UResBlock5.Layer1.block1.conv"
EXIT = "u_blocks.UResBlock5.Layer1.block2.conv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--offsets", default="0,1,2,3")
    ap.add_argument("--ckpt", default="/tmp/effq_basin_gate_ckpt.pkl")
    ap.add_argument("--variants", default="base,lift_both,lift_act,lift_w,"
                                          "lift_block")
    ap.add_argument("--lift_qlvl", type=int, default=16)
    ap.add_argument("--out", default="experiments/basin_fix_probe.json")
    args = ap.parse_args()
    patch = (16, 16, 16)

    root = tempfile.mkdtemp(prefix="effq_basinfix_")
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

    Q = args.lift_qlvl
    variant_overrides = {
        "base": None,
        "lift_both": {TRIGGER: (Q, Q)},
        "lift_act": {TRIGGER: (4, Q)},
        "lift_w": {TRIGGER: (Q, 4)},
        "lift_block": {TRIGGER: (Q, Q), EXIT: (Q, Q)},
    }

    results = {}
    for off in (int(x) for x in args.offsets.split(",")):
        calib_x = ops.ncdhw_to_ndhwc(jnp.asarray(all_imgs[off]))
        row = {}
        for vn in args.variants.split(","):
            t0 = time.time()
            fg, fv, _ = run_ptq(qgraph, qvars0, calib_x, task="lits",
                                init_stride=(2, 2, 2), hp=PTQHyperParams(),
                                qlvl_overrides=variant_overrides[vn])
            sm = validate_seg(fg, fv, hub.valloader, hub.val_sn, n_mo, 3,
                              patch_size=patch, overlap=(4, 4, 4),
                              mode="quantized")
            row[vn] = float(sm[-1].get_metric()["dsc"])
            print(f"draw {off} {vn:10s}: dice {row[vn]:.4f} "
                  f"({time.time() - t0:.0f}s)")
        results[str(off)] = row

    out = P.join(P.dirname(P.dirname(P.abspath(__file__))), args.out)
    with open(out, "w") as f:
        from efficientq_tpu.utils.toolchain import toolchain_fingerprint
        results["toolchain"] = toolchain_fingerprint()
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
