#!/usr/bin/env python3
"""Full-scale PTQ wall-clock measurement (the reference's time_cost.txt
headline, src/ptqer.py:366-368).

Builds the preset flagship (BraTS 7-stage or LiTS 9-stage), random-inits,
and calibrates every qconv on a synthetic calibration patch at the real
preset geometry (brats: 192x192x128 x4 mods, 22 layers; lits: 192x128x64,
28 layers incl. the 512-ch c1k=13826 stage).  Run twice to measure
cold-vs-warm: the persistent XLA compile cache makes the second run skip
every per-layer-geometry compile.

    python scripts/ptq_fullscale.py --task brats
"""
from __future__ import annotations

import argparse
import os.path as P
import sys
import time

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="brats", choices=("brats", "lits"))
    ap.add_argument("--admm_iter", type=int, default=200)
    ap.add_argument("--qlvl", type=int, default=4)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from efficientq_tpu.cli.entrance import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientq_tpu import nnir
    from efficientq_tpu.models import build_uresq, preset_config
    from efficientq_tpu.ptq import PTQHyperParams, run_ptq

    cfg = preset_config(args.task, quantize=True, qlvl_w=args.qlvl,
                        qlvl_act=args.qlvl)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))

    # preset calibration patch: lwq_patchsz from config/{task}_ptq.yaml
    shape = ((1, 192, 192, 128, 4) if args.task == "brats"
             else (1, 192, 128, 64, 1))
    calib = jnp.asarray(
        np.abs(np.random.RandomState(0).randn(*shape)).astype(np.float32))

    t0 = time.time()
    fg, fv, report = run_ptq(
        graph, variables, calib, task=args.task,
        init_stride=cfg.init_stride,
        hp=PTQHyperParams(admm_iter=args.admm_iter), verbose=args.verbose)
    total = time.time() - t0
    losses = [l for _, l in report.layer_losses]
    assert all(np.isfinite(losses)), "non-finite layer losses"
    print(f"{args.task}: {len(report.layer_losses)} layers calibrated; "
          f"FP capture {report.fp_forward_seconds:.1f}s, "
          f"calibration {report.calibration_seconds:.1f}s, "
          f"total {total / 60:.2f} min ({report.time_cost_line()})")


if __name__ == "__main__":
    main()
