#!/usr/bin/env python3
"""Migration walkthrough: take a reference (PyTorch) EfficientQ checkpoint,
quantize it TPU-side, and serve whole volumes.

    python examples/migrate_from_reference.py \
        --pretrain path/to/state_0500.pkl --task brats \
        --volume path/to/vol.npy [--qlvl 4]

Steps:
  1. build the preset UResQ graph and load the torch checkpoint key-for-key
  2. run PTQ calibration on one volume (ADMM per layer)
  3. convert eligible layers to the int8 deployment form
  4. run sliding-window whole-volume inference and save the segmentation
"""
from __future__ import annotations

import argparse
import os.path as P
import sys

import numpy as np

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain", required=True)
    ap.add_argument("--task", default="brats", choices=["brats", "lits"])
    ap.add_argument("--volume", required=True,
                    help=".npy volume, (C, D, H, W) or (D, H, W)")
    ap.add_argument("--qlvl", type=int, default=4,
                    help="quantization levels (4 = 2-bit)")
    ap.add_argument("--out", default="segmentation.nii.gz")
    ap.add_argument("--admm_iter", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir, ops
    from efficientq_tpu.eval.sliding import sliding_window_inference
    from efficientq_tpu.models import build_uresq, preset_config, torch_io
    from efficientq_tpu.ptq import PTQHyperParams, run_ptq
    from efficientq_tpu.ptq.attention import hard_pred
    from efficientq_tpu.ptq.deploy import to_int8_inference
    from efficientq_tpu.utils.nifti import save_nifti

    cfg = preset_config(args.task, quantize=True, qlvl_w=args.qlvl,
                        qlvl_act=args.qlvl)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    print(f"loading torch checkpoint {args.pretrain}")
    variables = torch_io.load_torch_checkpoint(graph, variables, args.pretrain)

    vol = np.load(args.volume).astype(np.float32)
    if vol.ndim == 3:
        vol = vol[None]
    x = ops.ncdhw_to_ndhwc(jnp.asarray(vol[None]))  # (1, D, H, W, C)

    # calibration patch: center crop to multiples of 64, capped at 192
    # (the reference's rule, ptqer.py:96-99)
    crop = [min(s, 192) // 64 * 64 for s in x.shape[1:4]]
    lo = [(s - c) // 2 for s, c in zip(x.shape[1:4], crop)]
    calib = x[:, lo[0]:lo[0] + crop[0], lo[1]:lo[1] + crop[1],
              lo[2]:lo[2] + crop[2], :]
    print(f"calibrating on {calib.shape} ...")
    fgraph, qvars, report = run_ptq(
        graph, variables, calib, task=args.task,
        init_stride=cfg.init_stride,
        hp=PTQHyperParams(admm_iter=args.admm_iter))
    print(report.time_cost_line())

    igraph, ivars = to_int8_inference(fgraph, qvars)
    n_int8 = sum(1 for n in igraph.nodes if n.attrs.get("int8"))
    print(f"int8 deployment: {n_int8} integer conv layers")

    @jax.jit
    def infer(v, image):
        def mf(xb):
            return nnir.apply(igraph, v, xb, mode="quantized")
        return sliding_window_inference(mf, image, (128, 128, 128) if
                                        args.task == "brats" else
                                        (128, 128, 64), (16, 16, 16),
                                        patch_batch=4)

    print("running whole-volume inference ...")
    logits = infer(ivars, x)
    seg = np.asarray(hard_pred(logits[-1], args.task)[0]).astype(np.uint8)
    save_nifti(args.out, seg)
    print(f"saved {args.out}; labels: {np.unique(seg)}")


if __name__ == "__main__":
    main()
