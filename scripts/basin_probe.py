#!/usr/bin/env python3
"""W2A2 bimodal-basin diagnostic (VERDICT r3 item 3).

The calibration matrix (docs/quantization.md) shows uniform W2A2 on the
narrow gate net is bimodal: ~0.48 vs 0.55-0.81 held-out dice depending on
the calibration draw.  This probe localizes the mechanism:

1. trains the 400-epoch gate once (cached to --ckpt),
2. runs uniform-W2A2 PTQ on each calibration draw,
3. sweeps PREFIX quantization: evaluate held-out dice with only the first
   k calibrated convs quantized (suffix stripped back to the FP folded
   weights) -- the layer where dice(k) collapses is the cascade trigger,
4. records every layer's alpha_w / alpha_act across draws so near-tie
   flips (one grid step) are visible as alpha discontinuities.

Writes experiments/basin_probe.json.
"""
from __future__ import annotations

import argparse
import dataclasses
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
from efficientq_tpu.models import UResQConfig, build_uresq, torch_io
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.ptq.fold_bn import fold_bn
from efficientq_tpu.train import Trainer

WIDTHS = [8, 16, 32, 16, 8]


def model_cfg(qlvl=None):
    q = qlvl is not None
    return UResQConfig(
        num_mod=1, num_classes=3, depth_config=[1] * len(WIDTHS),
        width_config=WIDTHS, dilation_config=[1] * len(WIDTHS),
        init_stride=(2, 2, 2), drop_rate=0.2, blk_type="mid", ds="simple",
        ds_depth_limit=3, drop_cut_thres=128,
        quantize=q, qlvl_w=qlvl or 4, qlvl_act=qlvl or 4,
        q_first=(256, -1), q_last=(256, -1))


def quantize_prefix(graph, names_keep):
    """Strip qcfg from every qconv NOT in names_keep (those run plain FP
    in 'quantized' mode), keeping the prefix quantized."""
    new_nodes = []
    for n in graph.nodes:
        if n.attrs.get("qcfg") is not None and n.name not in names_keep:
            attrs = dict(n.attrs)
            attrs["qcfg"] = None
            n = dataclasses.replace(n, attrs=attrs)
        new_nodes.append(n)
    return dataclasses.replace(graph, nodes=new_nodes, _index=None)


def mean_fg_dice(graph, variables, hub, num_mo, patch):
    sm = validate_seg(graph, variables, hub.valloader, hub.val_sn, num_mo, 3,
                      patch_size=patch, overlap=(4, 4, 4), mode="quantized")
    return float(sm[-1].get_metric()["dsc"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--subjects", type=int, default=8)
    ap.add_argument("--offsets", type=str, default="0,1,2,3")
    ap.add_argument("--qlvl", type=int, default=4)
    ap.add_argument("--ckpt", type=str,
                    default="/tmp/effq_basin_gate_ckpt.pkl",
                    help="trained-gate cache (pickled torch state dict)")
    ap.add_argument("--prefix_sweep", action="store_true", default=True)
    ap.add_argument("--no_prefix_sweep", dest="prefix_sweep",
                    action="store_false")
    ap.add_argument("--out", type=str, default="experiments/basin_probe.json")
    args = ap.parse_args()
    patch = (16, 16, 16)

    root = tempfile.mkdtemp(prefix="effq_basin_")
    data_dir, split_dir = make_synthetic_dataset(
        root, task="lits", n_subjects=args.subjects,
        vol_shape=(32,) * 3, seed=0)
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
        variables = torch_io.load_torch_state_dict(
            graph, nnir.init(graph, jax.random.PRNGKey(0)), sd)
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
        variables = tr.variables
        with open(args.ckpt, "wb") as f:
            pickle.dump(torch_io.to_torch_state_dict(graph, variables), f)

    # FP dice (strip all quant: prefix of zero)
    g_fp = quantize_prefix(graph, set())
    fpg, fpv = fold_bn(g_fp, variables)
    fp_dice = mean_fg_dice(fpg, fpv, hub, n_mo, patch)
    print(f"FP dice: {fp_dice:.4f}")

    # quantized-graph FP fold (reference params for hybrid suffixes)
    qgraph = build_uresq(model_cfg(args.qlvl))
    qvars0 = torch_io.load_torch_state_dict(
        qgraph, nnir.init(qgraph, jax.random.PRNGKey(0)),
        torch_io.to_torch_state_dict(graph, variables))
    ffgraph, ffvars = fold_bn(qgraph, qvars0)

    hub.trainseqloader.dataset.use_fix_transform()
    all_imgs = [im for im, _ in hub.trainseqloader]

    results = {"fp_dice": fp_dice, "qlvl": args.qlvl, "draws": {}}
    for off in (int(x) for x in args.offsets.split(",")):
        calib_x = ops.ncdhw_to_ndhwc(jnp.asarray(all_imgs[off]))
        t0 = time.time()
        fg, fv, report = run_ptq(qgraph, qvars0, calib_x, task="lits",
                                 init_stride=(2, 2, 2),
                                 hp=PTQHyperParams())
        calib_s = time.time() - t0
        full_dice = mean_fg_dice(fg, fv, hub, n_mo, patch)
        qnames = [n.name for n in fg.qconv_nodes()]
        draw = {
            "full_dice": full_dice,
            "calib_seconds": calib_s,
            "layer_losses": {k: v for k, v in report.layer_losses},
            "layer_rel_losses": {k: v for k, v in report.layer_rel_losses},
            "alpha_w": {n: float(np.asarray(fv["params"][n]["alpha_w"]))
                        for n in qnames if "alpha_w" in fv["params"][n]},
            "alpha_act": {n: float(np.asarray(fv["params"][n]["alpha_act"]))
                          for n in qnames
                          if "alpha_act" in fv["params"][n]},
        }
        print(f"draw {off}: full W2A2 dice {full_dice:.4f} "
              f"(calib {calib_s:.0f}s)")

        if args.prefix_sweep:
            prefix = {}
            for k in range(1, len(qnames) + 1):
                keep = set(qnames[:k])
                g_k = quantize_prefix(fg, keep)
                # params: quantized for the prefix, FP-folded suffix
                p_k = {name: (fv["params"][name] if name in keep
                              else ffvars["params"].get(name, p))
                       for name, p in fv["params"].items()}
                v_k = {"params": p_k, "state": fv.get("state", {})}
                d_k = mean_fg_dice(g_k, v_k, hub, n_mo, patch)
                prefix[qnames[k - 1]] = d_k
                print(f"  prefix {k:2d} ({qnames[k - 1]:38s}): {d_k:.4f}")
            draw["prefix_dice"] = prefix
        results["draws"][str(off)] = draw

    out = P.join(P.dirname(P.dirname(P.abspath(__file__))), args.out)
    with open(out, "w") as f:
        from efficientq_tpu.utils.toolchain import toolchain_fingerprint
        results["toolchain"] = toolchain_fingerprint()
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
