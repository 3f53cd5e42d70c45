#!/usr/bin/env python3
"""PTQ quality gate: train a small UResQ on synthetic LiTS-like data until
it segments well, then PTQ at W8A8 / W4A4 / W2A2 and report the Dice delta
vs FP (the BASELINE.md acceptance metric: delta within 0.5 pts at W4A4-level
settings).

Run on TPU:  python scripts/quality_gate.py [--epochs N]
Writes results to experiments/quality_gate_results.json.
"""
from __future__ import annotations

import argparse
import json
import os.path as P
import sys
import tempfile
import time

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))

import jax

# EFFQ_PLATFORM pin + persistent compile cache (must run before any device
# touch; owns the jax.config-based pin the ambient sitecustomize requires)
from efficientq_tpu.cli.entrance import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities
from efficientq_tpu.data.transforms import center_crop
from efficientq_tpu.eval.validate import validate_seg
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.train import Trainer
from efficientq_tpu import ops
import jax.numpy as jnp


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


def mean_fg_dice(graph, variables, hub, num_mo, mode):
    sm = validate_seg(graph, variables, hub.valloader, hub.val_sn, num_mo, 3,
                      patch_size=hub.slide_patch_size,
                      overlap=hub.slide_overlap, mode=mode)
    return sm[-1].get_metric()["dsc"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--subjects", type=int, default=8)
    ap.add_argument("--admm_iter", type=int, default=200)
    ap.add_argument("--granularity", default="layer",
                    choices=["layer", "block"],
                    help="PTQ calibration granularity (block = ResBlock "
                         "exit convs absorb in-block error)")
    ap.add_argument("--channel_wise", action="store_true",
                    help="per-output-channel weight scales")
    ap.add_argument("--bias_corr", action="store_true",
                    help="per-output-channel bias correction after ADMM")
    ap.add_argument("--tune_act", type=int, default=0,
                    help="post-PTQ end-to-end alpha_act Adam iterations")
    ap.add_argument("--tune_act_validated", action="store_true",
                    help="score tune_act iterates by calib-volume dice and "
                         "keep the best (the product mission's behavior); "
                         "without it the raw last iterate is kept")
    ap.add_argument("--calib_subjects", type=int, default=1,
                    help="calibration volumes stacked into the batch "
                         "(reference --lwq_batchsz analogue)")
    ap.add_argument("--mixed_frac", type=float, default=0.0,
                    help="fraction of most-sensitive layers lifted to "
                         "--mixed_qlvl (sensitivity-driven mixed precision)")
    ap.add_argument("--mixed_qlvl", type=int, default=16)
    ap.add_argument("--att_style", default="p:0.5",
                    help="attention weight-map style (reference hardcodes "
                         "p:0.5, src/ptqer.py:342); p:1.0 weights the rare "
                         "class ~232x instead of ~15x on this gate")
    ap.add_argument("--calib_offset", type=int, default=0,
                    help="skip this many sequential subjects before taking "
                         "the calibration batch (reference --lwq_dataid "
                         "analogue; use to measure calibration-choice "
                         "variance)")
    ap.add_argument("--calib_select", type=int, default=4,
                    help="calibrate on each of K candidate volumes and keep "
                         "the best by train-volume dice (ptq/select.py; "
                         "mirrors the product --lwq_select). DEFAULT ON "
                         "(K=4): selection is the repo's zero-regret "
                         "de-noiser, so pass/fail rows are draw-robust; "
                         "0 measures a single raw draw (the pre-r5 "
                         "behavior, needed for draw-variance matrices)")
    ap.add_argument("--compare", type=str, default=None,
                    help="path to a prior gate results JSON: re-runs are "
                         "checked against it with the seed-matrix "
                         "tolerance bands and drift is FLAGGED in the "
                         "output (exit code stays 0; drift is a finding, "
                         "not a failure)")
    ap.add_argument("--width", type=str, default=None,
                    help="comma-separated stage widths override")
    ap.add_argument("--vol", type=int, default=32, help="synthetic volume side")
    ap.add_argument("--patch", type=str, default="16,16,16")
    ap.add_argument("--init_stride", type=str, default="2,2,2")
    ap.add_argument("--settings", type=str, default="256,16,4",
                    help="comma-separated qlvl list (256=W8A8,16=W4A4,4=W2A2)")
    ap.add_argument("--out", type=str, default="experiments/quality_gate_results.json")
    ap.add_argument("--amp", action="store_true",
                    help="train with mixed precision (bf16 activations, "
                         "f32 master state) — quality-parity leg for the "
                         "product --amp flag")
    ap.add_argument("--qat", type=int, default=0,
                    help="QAT fine-tune epochs after each PTQ setting "
                         "(0 = off); epoch kept by val dice, pure-PTQ "
                         "epoch 0 included")
    ap.add_argument("--qat_lr", type=float, default=1e-3,
                    help="QAT learning rate (gate-net scale; the "
                         "flagship CLI default is 1e-4)")
    ap.add_argument("--seed", type=int, default=0,
                    help="init/trainer seed (data stays seed 0 so runs "
                         "share the dataset); use to size run-to-run "
                         "variance when comparing legs")
    args = ap.parse_args()
    if args.width:
        global WIDTHS
        WIDTHS[:] = [int(w) for w in args.width.split(",")]
    patch = tuple(int(x) for x in args.patch.split(","))
    init_stride = tuple(int(x) for x in args.init_stride.split(","))

    root = tempfile.mkdtemp(prefix="effq_quality_")
    data_dir, split_dir = make_synthetic_dataset(
        root, task="lits", n_subjects=args.subjects,
        vol_shape=(args.vol,) * 3, seed=0)
    hub = DataHub(
        data_dir, task_modalities("lits"),
        train_split=f"{split_dir}/round1/train.txt",
        val_split=f"{split_dir}/round1/val.txt",
        train_batchsize=4, test_batchsize=1, access_type="npy",
        crop_type="balance", balance_rate=0.8,
        balance_mask_func=lambda label: label == 2,
        crop_size_img=patch,
        slide_patch_size=patch, slide_overlap=(4, 4, 4))

    cfg = model_cfg(init_stride=init_stride)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(args.seed))
    n_mo = len(graph.outputs)
    tr = Trainer(graph, variables, hub, loss_name="hybrid", num_mo=n_mo,
                 n_class=3, base_lr=0.01, max_epoch=args.epochs,
                 snapshot_root=P.join(root, "snap"), amp=args.amp,
                 seed=args.seed,
                 test_interval=10 ** 9, display_interval=50)
    t0 = time.time()
    for ep in range(args.epochs):
        ld = tr.train_epoch()
    train_sec = time.time() - t0
    print(f"trained {args.epochs} epochs in {train_sec:.1f}s, "
          f"final loss {ld['loss']:.4f}")

    fp_dice = mean_fg_dice(graph, tr.variables, hub, n_mo, "fp")
    print(f"FP foreground dice: {fp_dice:.4f}")

    # calibration volumes: first N sequential train subjects, full 32^3
    hub.trainseqloader.dataset.use_fix_transform()
    seq = iter(hub.trainseqloader)
    for _ in range(args.calib_offset):
        next(seq)
    if args.calib_select:
        pairs = [next(seq) for _ in range(args.calib_select)]
        cand_imgs = [p[0] for p in pairs]
        cand_labels = [p[1] for p in pairs]
    else:
        imgs = [next(seq)[0] for _ in range(args.calib_subjects)]
        calib_x = ops.ncdhw_to_ndhwc(jnp.concatenate(
            [jnp.asarray(im) for im in imgs], axis=0))

    from efficientq_tpu.utils.toolchain import toolchain_fingerprint

    # Tolerance bands from the 2x2 seed matrix (seed {0,1} x {f32,amp} FP
    # dice 0.854/0.844/0.821/0.872 — experiments/quality_gate_s1_*.json,
    # BASELINE.md): half the max-min spread = +-0.026 is the seed-level
    # trainer variance any same-protocol re-run may move by without
    # meaning anything.  Quantized rows are draw-selected (calib_select),
    # which removed draw noise but still sits on top of the FP trainer's
    # variance, so the same band applies; sub-4-bit rows near a basin
    # boundary can exceed it legitimately — drift there is FLAGGED for a
    # human, not auto-failed.
    TOL_BAND = 0.026
    results = {"fp_dice": fp_dice, "train_seconds": train_sec,
               "epochs": args.epochs, "amp": bool(args.amp),
               "seed": args.seed, "toolchain": toolchain_fingerprint(),
               "tolerance_band": TOL_BAND, "settings": {}}
    tags = {256: "W8A8", 16: "W4A4", 4: "W2A2"}
    for qlvl in (int(x) for x in args.settings.split(",")):
        tag = tags.get(qlvl, f"q{qlvl}")
        qcfg = model_cfg(qlvl, init_stride=init_stride)
        qgraph = build_uresq(qcfg)
        qvars = nnir.init(qgraph, jax.random.PRNGKey(0))
        # copy trained weights (same structure)
        from efficientq_tpu.models import torch_io

        sd = torch_io.to_torch_state_dict(graph, tr.variables)
        qvars = torch_io.load_torch_state_dict(qgraph, qvars, sd)
        t0 = time.time()
        hp = PTQHyperParams(admm_iter=args.admm_iter,
                            channel_wise=args.channel_wise,
                            bias_corr=args.bias_corr)
        if args.calib_select:
            from efficientq_tpu.ptq.select import select_calibration

            fg, fv, report, selection = select_calibration(
                qgraph, qvars, cand_imgs, cand_labels,
                num_mo=n_mo, n_class=3, patch_size=patch,
                overlap=(4, 4, 4), task="lits", init_stride=init_stride,
                hp=hp, granularity=args.granularity,
                att_style=args.att_style, mixed_frac=args.mixed_frac,
                mixed_qlvl=args.mixed_qlvl, verbose=True)
        elif args.mixed_frac:
            from efficientq_tpu.ptq import run_ptq_mixed

            fg, fv, report = run_ptq_mixed(
                qgraph, qvars, calib_x, task="lits",
                init_stride=init_stride, hp=hp,
                mixed_frac=args.mixed_frac, mixed_qlvl=args.mixed_qlvl,
                granularity=args.granularity, att_style=args.att_style)
        else:
            fg, fv, report = run_ptq(
                qgraph, qvars, calib_x, task="lits", init_stride=init_stride,
                hp=hp, granularity=args.granularity,
                att_style=args.att_style)
        calib_sec = time.time() - t0
        if args.calib_select:
            calib_x = ops.ncdhw_to_ndhwc(
                jnp.asarray(cand_imgs[selection["picked"]]))
        q_dice = mean_fg_dice(fg, fv, hub, n_mo, "quantized")
        delta = fp_dice - q_dice
        print(f"{tag}: dice {q_dice:.4f} (delta {delta:+.4f}), "
              f"calib {calib_sec:.1f}s over {len(report.layer_losses)} layers")
        results["settings"][tag] = {
            "dice": q_dice, "delta": delta, "calib_seconds": calib_sec,
            "layers": len(report.layer_losses)}
        if report.mixed_upgraded:
            results["settings"][tag]["mixed_upgraded"] = report.mixed_upgraded
        if args.calib_select:
            results["settings"][tag]["calib_select"] = selection

        if args.qat:
            from efficientq_tpu.ptq.qat import run_qat

            t0 = time.time()
            qv2, qlog = run_qat(
                fg, fv, hub, num_mo=n_mo, n_class=3, loss_name="hybrid",
                epochs=args.qat, lr=args.qat_lr,
                snapshot_root=P.join(root, f"qat_{tag}"))
            qat_dice = mean_fg_dice(fg, qv2, hub, n_mo, "quantized")
            print(f"{tag}+qat{args.qat}: dice {qat_dice:.4f} "
                  f"(delta {fp_dice - qat_dice:+.4f}), kept epoch "
                  f"{qlog['kept_epoch']}, {time.time() - t0:.1f}s")
            results["settings"][tag]["qat_dice"] = qat_dice
            results["settings"][tag]["qat_kept_epoch"] = qlog["kept_epoch"]
            results["settings"][tag]["qat_epochs"] = args.qat
            # scoring caveat: the kept epoch was SELECTED by val dice on
            # this same split, so qat_dice carries a positive selection
            # bias vs the single-measurement PTQ dice above (max of N
            # noisy draws vs one draw); treat small positive deltas as
            # noise unless reproduced on a held-out split
            results["settings"][tag]["qat_selection_bias"] = (
                "qat_dice = max-over-epochs on the epoch-selection split; "
                "positively biased vs the single-measurement ptq dice")
            results["settings"][tag]["qat_history"] = [
                {k: v for k, v in h.items()} for h in qlog["history"]]

        if args.tune_act:
            from efficientq_tpu.ptq.tune import tune_activation_range

            score_fn = None
            if args.tune_act_validated:
                if args.calib_select:
                    # score on ALL selection candidates — exactly what the
                    # ptq mission does (cli/missions.py tune_pairs), so the
                    # gate validates the shipped early-stopping criterion
                    tune_pairs = list(zip(cand_imgs, cand_labels))
                else:
                    # re-pull the calibration volume WITH its label
                    seq2 = iter(hub.trainseqloader)
                    for _ in range(args.calib_offset):
                        next(seq2)
                    calib_img, calib_label = next(seq2)
                    tune_pairs = [(calib_img, calib_label)]
                t_sn = [f"calib{i}" for i in range(len(tune_pairs))]
                # one inferencer across score calls (see missions.py)
                from efficientq_tpu.eval.sliding import \
                    make_jitted_volume_inferencer

                score_infer = make_jitted_volume_inferencer(
                    fg, patch_batch=2, mode="quantized", hard_pred=True,
                    multilabel=np.asarray(tune_pairs[0][1]).ndim == 5)

                def score_fn(v):
                    sm = validate_seg(fg, v, tune_pairs, t_sn, n_mo, 3,
                                      patch_size=patch,
                                      overlap=(4, 4, 4), mode="quantized",
                                      patch_batch=2, infer=score_infer)
                    return float(sm[-1].get_metric()["dsc"])

            tv, losses, tinfo = tune_activation_range(
                fg, fv, calib_x, report.output_fp, max_iter=args.tune_act,
                score_fn=score_fn)
            t_dice = mean_fg_dice(fg, tv, hub, n_mo, "quantized")
            kept = (f", kept iter {tinfo['best_iter']}"
                    if args.tune_act_validated else "")
            print(f"{tag}+tune_act: dice {t_dice:.4f} "
                  f"(delta {fp_dice - t_dice:+.4f}), "
                  f"recon {losses[0]:.5f}->{losses[-1]:.5f}{kept}")
            results["settings"][tag]["tuned_dice"] = t_dice
            if args.tune_act_validated:
                results["settings"][tag]["tune_kept_iter"] = tinfo["best_iter"]
                results["settings"][tag]["tune_scores"] = tinfo["scores"]

    if args.compare:
        with open(args.compare) as f:
            prior = json.load(f)
        drift = {"prior": args.compare,
                 "prior_toolchain": prior.get("toolchain", "unrecorded"),
                 "toolchain_changed": prior.get("toolchain")
                 != results["toolchain"],
                 "rows": {}}
        rows = [("fp_dice", prior.get("fp_dice"), fp_dice)]
        for tag, s in results["settings"].items():
            p = prior.get("settings", {}).get(tag, {})
            rows.append((tag, p.get("dice"), s["dice"]))
        for name, old, new in rows:
            if old is None:
                continue
            delta = new - old
            flagged = abs(delta) > TOL_BAND
            drift["rows"][name] = {"prior": old, "now": new,
                                   "delta": delta, "flagged": flagged}
            if flagged:
                print(f"DRIFT: {name} moved {delta:+.4f} "
                      f"(> +-{TOL_BAND} seed band) vs {args.compare}"
                      + (" — toolchain CHANGED, see 'toolchain' fields"
                         if drift["toolchain_changed"] else
                         " — toolchain unchanged: investigate"))
        results["drift_vs_prior"] = drift

    out = P.join(P.dirname(P.abspath(__file__)), "..", args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["settings"], indent=2))


if __name__ == "__main__":
    main()
