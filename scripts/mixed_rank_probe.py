#!/usr/bin/env python3
"""Is the mixed-precision sensitivity ranking a property of the weights or
of the calibration volume?

``run_ptq_mixed`` ranks layers by relative reconstruction loss from a base
calibration pass, then upgrades the worst ``mixed_frac`` fraction.  With
``--lwq_select K`` that pass used to repeat per candidate (2K passes).  If
the top-``mixed_frac`` upgrade SET barely changes across calibration draws,
ranking once and reusing it (ptq/select.py) halves selection cost with no
behavior change.

Trains the quality-gate net, computes the pass-1 ranking on each of
``--draws`` sequential calibration volumes at each qlvl setting, and
reports the pairwise Jaccard overlap of the top-25% upgrade sets plus
Spearman rank correlation of the full rankings.

Writes experiments/mixed_rank_probe.json.
"""
from __future__ import annotations

import argparse
import itertools
import json
import os.path as P
import sys
import tempfile
import time

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))

from efficientq_tpu.cli.entrance import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir, ops
from efficientq_tpu.data.datahub import DataHub
from efficientq_tpu.data.synthetic import make_synthetic_dataset, task_modalities
from efficientq_tpu.models import UResQConfig, build_uresq, torch_io
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.train import Trainer


def model_cfg(widths, qlvl=None):
    q = qlvl is not None
    return UResQConfig(
        num_mod=1, num_classes=3, depth_config=[1] * len(widths),
        width_config=widths, dilation_config=[1] * len(widths),
        init_stride=(2, 2, 2), drop_rate=0.2, blk_type="mid", ds="simple",
        ds_depth_limit=3, drop_cut_thres=128,
        quantize=q, qlvl_w=qlvl or 4, qlvl_act=qlvl or 4,
        q_first=(256, -1), q_last=(256, -1))


def spearman(a, b):
    """Rank correlation of two {name: loss} maps over their shared keys."""
    keys = sorted(a)
    ra = {k: r for r, k in enumerate(sorted(keys, key=lambda k: a[k]))}
    rb = {k: r for r, k in enumerate(sorted(keys, key=lambda k: b[k]))}
    x = np.array([ra[k] for k in keys], float)
    y = np.array([rb[k] for k in keys], float)
    x -= x.mean(); y -= y.mean()
    return float((x * y).sum() / np.sqrt((x * x).sum() * (y * y).sum()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--subjects", type=int, default=10)
    ap.add_argument("--draws", type=int, default=4)
    ap.add_argument("--admm_iter", type=int, default=200)
    ap.add_argument("--mixed_frac", type=float, default=0.25)
    ap.add_argument("--width", type=str, default="8,16,32,16,8")
    ap.add_argument("--vol", type=int, default=32)
    ap.add_argument("--patch", type=str, default="16,16,16")
    ap.add_argument("--settings", type=str, default="4,16",
                    help="qlvl list to rank at (4=W2A2, 16=W4A4)")
    ap.add_argument("--out", default="experiments/mixed_rank_probe.json")
    args = ap.parse_args()
    widths = [int(w) for w in args.width.split(",")]
    patch = tuple(int(x) for x in args.patch.split(","))

    root = tempfile.mkdtemp(prefix="effq_rankprobe_")
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
        crop_size_img=patch, slide_patch_size=patch, slide_overlap=(4, 4, 4))

    graph = build_uresq(model_cfg(widths))
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    n_mo = len(graph.outputs)
    tr = Trainer(graph, variables, hub, loss_name="hybrid", num_mo=n_mo,
                 n_class=3, base_lr=0.01, max_epoch=args.epochs,
                 snapshot_root=P.join(root, "snap"),
                 test_interval=10 ** 9, display_interval=10 ** 9)
    t0 = time.time()
    for _ in range(args.epochs):
        ld = tr.train_epoch()
    print(f"trained {args.epochs} epochs in {time.time() - t0:.0f}s, "
          f"loss {ld['loss']:.4f}")

    # sequential calibration volumes (one per draw)
    hub.trainseqloader.dataset.use_fix_transform()
    seq = iter(hub.trainseqloader)
    vols = [ops.ncdhw_to_ndhwc(jnp.asarray(next(seq)[0]))
            for _ in range(args.draws)]

    out = {"epochs": args.epochs, "draws": args.draws,
           "mixed_frac": args.mixed_frac, "settings": {}}
    for qlvl in (int(x) for x in args.settings.split(",")):
        qgraph = build_uresq(model_cfg(widths, qlvl))
        qvars = nnir.init(qgraph, jax.random.PRNGKey(0))
        sd = torch_io.to_torch_state_dict(graph, tr.variables)
        qvars = torch_io.load_torch_state_dict(qgraph, qvars, sd)
        hp = PTQHyperParams(admm_iter=args.admm_iter)

        rankings, topsets = [], []
        for d, calib_x in enumerate(vols):
            _, _, rep = run_ptq(qgraph, qvars, calib_x, task="lits",
                                init_stride=(2, 2, 2), hp=hp)
            ranking = dict(rep.layer_rel_losses or rep.layer_losses)
            k = max(1, int(round(args.mixed_frac * len(ranking))))
            top = set(sorted(ranking, key=ranking.get, reverse=True)[:k])
            rankings.append(ranking)
            topsets.append(top)
            print(f"qlvl {qlvl} draw {d}: top-{k} = {sorted(top)}")

        jac, rho = [], []
        for i, j in itertools.combinations(range(args.draws), 2):
            inter = len(topsets[i] & topsets[j])
            union = len(topsets[i] | topsets[j])
            jac.append(inter / union)
            rho.append(spearman(rankings[i], rankings[j]))
        tag = {256: "W8A8", 16: "W4A4", 4: "W2A2"}.get(qlvl, f"q{qlvl}")
        out["settings"][tag] = {
            "top_sets": [sorted(t) for t in topsets],
            "pairwise_jaccard": jac,
            "mean_jaccard": float(np.mean(jac)),
            "pairwise_spearman": rho,
            "mean_spearman": float(np.mean(rho)),
            "rankings": [{k: float(v) for k, v in r.items()}
                         for r in rankings],
        }
        print(f"{tag}: mean top-set Jaccard {np.mean(jac):.3f}, "
              f"mean Spearman {np.mean(rho):.3f}")

    path = P.join(P.dirname(P.abspath(__file__)), "..", args.out)
    with open(path, "w") as f:
        from efficientq_tpu.utils.toolchain import toolchain_fingerprint
        out["toolchain"] = toolchain_fingerprint()
        json.dump(out, f, indent=2)
    print(json.dumps({t: {k: v for k, v in s.items()
                          if k in ("mean_jaccard", "mean_spearman")}
                      for t, s in out["settings"].items()}, indent=2))


if __name__ == "__main__":
    main()
