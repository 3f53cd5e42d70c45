#!/usr/bin/env python3
"""Offset-grid basin probe (VERDICT r5 item 3).

The W2A2 collapse basin is act-grid saturation at the last decoder
block's entry conv (docs/quantization.md: lifting its activation grid to
16 levels recovers every draw; lifting only weights does nothing).  The
offset (signed-asymmetric) grid (--act_offset, quant.fake_quant_act_k)
keeps k of the 4 levels below zero WITHOUT changing serving cost — this
probe measures whether that is enough to move pure-uniform W2A2 out of
the 0.48 basin, per calibration draw, on the same 400-epoch gate as
basin_probe.py (trained+cached if missing).

Variants:
  base         uniform W2A2, unsigned grids (control)
  off_trigger  offset search (k<=3) on the trigger conv only
  off_tail     offset search on the tail set (trigger + exit conv)
  off_all      offset search on every q_act conv

Usage: python scripts/act_offset_probe.py [--offsets 0,1,2,3]
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
from efficientq_tpu.ptq.engine import tail_sensitive_convs
from efficientq_tpu.train import Trainer
from scripts.basin_probe import model_cfg  # noqa: E402

TRIGGER = "u_blocks.UResBlock5.Layer1.block1.conv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--offsets", default="0,1,2,3")
    ap.add_argument("--ckpt", default="/tmp/effq_basin_gate_ckpt.pkl")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--max_k", type=int, default=3)
    ap.add_argument("--variants",
                    default="base,off_trigger,off_tail,off_all")
    ap.add_argument("--out", default="experiments/act_offset_probe.json")
    args = ap.parse_args()
    patch = (16, 16, 16)

    root = tempfile.mkdtemp(prefix="effq_actoff_")
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

    graph = build_uresq(model_cfg())
    n_mo = len(graph.outputs)
    if P.exists(args.ckpt):
        with open(args.ckpt, "rb") as f:
            sd = pickle.load(f)
        print(f"loaded trained gate from {args.ckpt}")
    else:
        variables = nnir.init(graph, jax.random.PRNGKey(0))
        tr = Trainer(graph, variables, hub, loss_name="hybrid", num_mo=n_mo,
                     n_class=3, base_lr=0.01, max_epoch=args.epochs,
                     snapshot_root=P.join(root, "snap"),
                     test_interval=10 ** 9, display_interval=100)
        t0 = time.time()
        for _ in range(args.epochs):
            ld = tr.train_epoch()
        print(f"trained {args.epochs} epochs in {time.time() - t0:.1f}s, "
              f"loss {ld['loss']:.4f}")
        sd = torch_io.to_torch_state_dict(graph, tr.variables)
        with open(args.ckpt, "wb") as f:
            pickle.dump(sd, f)

    qgraph = build_uresq(model_cfg(4))
    qvars0 = torch_io.load_torch_state_dict(
        qgraph, nnir.init(qgraph, jax.random.PRNGKey(0)), sd)
    tail = tail_sensitive_convs(qgraph)
    print(f"tail set: {tail}")

    hub.trainseqloader.dataset.use_fix_transform()
    all_imgs = [im for im, _ in hub.trainseqloader]

    variant_convs = {
        "base": (0, None),
        "off_trigger": (args.max_k, {TRIGGER}),
        "off_tail": (args.max_k, set(tail)),
        "off_all": (args.max_k, None),
    }

    results = {}
    for off in (int(x) for x in args.offsets.split(",")):
        calib_x = ops.ncdhw_to_ndhwc(jnp.asarray(all_imgs[off]))
        row = {}
        for vn in args.variants.split(","):
            k_max, convs = variant_convs[vn]
            t0 = time.time()
            fg, fv, _ = run_ptq(qgraph, qvars0, calib_x, task="lits",
                                init_stride=(2, 2, 2), hp=PTQHyperParams(),
                                act_offset=k_max, act_offset_convs=convs)
            sm = validate_seg(fg, fv, hub.valloader, hub.val_sn, n_mo, 3,
                              patch_size=patch, overlap=(4, 4, 4),
                              mode="quantized")
            ks = {n: int(np.asarray(p["act_k"]))
                  for n, p in fv["params"].items() if "act_k" in p}
            row[vn] = {"dice": float(sm[-1].get_metric()["dsc"]),
                       "act_k": {n: k for n, k in ks.items() if k}}
            print(f"draw {off} {vn:12s}: dice {row[vn]['dice']:.4f} "
                  f"nonzero k={row[vn]['act_k']} "
                  f"({time.time() - t0:.0f}s)")
        results[str(off)] = row

    out = P.join(P.dirname(P.dirname(P.abspath(__file__))), args.out)
    from efficientq_tpu.utils.toolchain import toolchain_fingerprint

    results["toolchain"] = toolchain_fingerprint()
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
