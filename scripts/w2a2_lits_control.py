#!/usr/bin/env python3
"""W2A2 LiTS-width control experiment (VERDICT r2 item 4).

BASELINE.md attributes the ~0.30 dice loss of W2A2 PTQ at full LiTS widths
(9-stage 32-512ch UResQ) on synthetic 64^3 data to model/data capacity, not
a framework defect.  This script produces the missing control: the SAME
trained checkpoint and the SAME calibration volume are calibrated by

  (a) our run_ptq (jax), and
  (b) the reference's actual pipeline (torch CPU: fold_bn + hooks +
      set_quantizing forward, /root/reference/src/ptqer.py:282-364) used
      strictly as an executable oracle, with the clone-hook fix for the
      torch-CPU view hazard (docs/reference_cross_check.md),

and both quantized results are evaluated by the same evaluator (reference
weights are transferred back into our graph; mode='quantized' uses stored
quantized kernels + alpha_act exactly like the reference's 'quantized'
mode, src/models/PTQConv.py:163-170).  If both lose the same dice, the
collapse is a property of the problem instance, not of either
implementation.

Writes experiments/quality_gate_lits_control.json.  The reference leg is hours on CPU
(torch.linalg.solve of the 13826^2 system every ADMM iteration,
src/models/solver.py:327-337); run in the background.
"""
from __future__ import annotations

import json
import os.path as P
import sys
import time
import types

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))
sys.path.insert(0, P.dirname(P.abspath(__file__)))

import numpy as np

REF = "/root/reference/src"

import os

WIDTHS = [int(w) for w in os.environ.get(
    "EFFQ_CONTROL_WIDTHS", "32,64,128,256,512,256,128,64,32").split(",")]
INIT_STRIDE = (2, 2, 1)
VOL = int(os.environ.get("EFFQ_CONTROL_VOL", "64"))
PATCH = tuple(int(x) for x in os.environ.get(
    "EFFQ_CONTROL_PATCH", "32,32,32").split(","))
QLVL = 4  # W2A2 (4-level)
# pyramid levels the volume can support (5 at the real 64^3 scale)
NUM_LVLS = min(5, max(2, VOL.bit_length() - 2))
ADMM_ITER = int(os.environ.get("EFFQ_CONTROL_ADMM", "200"))


class _RefArgs:
    task = "lits"
    nMod = 1
    nClass = 3
    bin_label = None
    multi_label = None
    model = "UResQ"
    init_stride = ",".join(str(s) for s in INIT_STRIDE)
    blk = "mid"
    qconv = "effq"
    qlvl_w = QLVL
    qlvl_a = QLVL
    q_first = "256,-1"
    q_last = "256,-1"
    nla = "relu"
    norm = "bn"
    drop_rate = 0.2
    width = ",".join(str(w) for w in WIDTHS)
    depth = ",".join("1" for _ in WIDTHS)
    dilation = ",".join("1" for _ in WIDTHS)
    ds = "simple"
    hetero_dim = True
    init_kernel = 3
    pretrain = None
    resume = None
    lwq_verbose = False
    lwq_dataid = 0
    lwq_batchsz = 1
    lwq_patchsz = None
    lwq_iter = ADMM_ITER


def reference_ptq(sd, calib_ncdhw):
    """Run the reference's calibration on torch CPU; returns its quantized
    state_dict and per-layer losses."""
    import torch

    if "pytz" not in sys.modules:
        fake = types.ModuleType("pytz")
        fake.timezone = lambda tz: None
        sys.modules["pytz"] = fake
    try:
        import nibabel  # noqa: F401
    except ImportError:
        nb = types.ModuleType("nibabel")
        nb.load = None
        nb.Nifti1Image = None
        sys.modules["nibabel"] = nb
    sys.path.insert(0, REF)
    from definer import get_conv_class, get_model_cube
    from models.fold_bn import search_fold_and_remove_bn
    from models.PTQConv import PTQConv
    import models.hooks as ref_hooks
    import ptqer

    QConv, _, kwQ = get_conv_class(_RefArgs())
    cube, _ = get_model_cube(_RefArgs(), QConv, kwQ)
    model = cube["model"]
    model.eval()
    missing = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    # alpha_w/alpha_act params are fresh in the reference model; everything
    # trained must have loaded (some reference classes override
    # load_state_dict and return None — then verify by value instead)
    if missing is not None:
        bad = [k for k in missing.missing_keys
               if "alpha" not in k and "num_batches_tracked" not in k]
        assert not bad, f"unmapped reference params: {bad[:5]}"
    ref_keys = set(model.state_dict().keys())
    bad = [k for k in sd if k not in ref_keys]
    assert not bad, f"our params missing in the reference model: {bad[:5]}"

    search_fold_and_remove_bn(model)
    ptqer.set_name(model)
    ptqer.set_fp(model)

    def clone_hook(module, inputs, output):
        # torch-CPU .cpu() is a no-op view; clone so in-place ReLU can't
        # mutate the cached FP target (faithful to the GPU substrate)
        module.output_fp = output.detach().clone()

    ref_hooks.forward_hook = clone_hook
    handles = []

    def register(module):
        if isinstance(module, PTQConv):
            handles.append(
                module.register_forward_hook(ref_hooks.forward_hook))
        else:
            for c in module.children():
                register(c)

    register(model)
    xt = torch.from_numpy(calib_ncdhw)
    with torch.no_grad():
        out_fp = model(xt).detach()
    body = torch.ones_like(xt[:, 0]).bool()
    wm, _ = ptqer.get_att_weight_map(out_fp, body, "p:0.5", task="lits")
    pyr = ptqer.get_mask_pyramid(out_fp, body, wm, _RefArgs.init_stride,
                                 num_lvls=NUM_LVLS, task="lits")
    ptqer.set_mask(model, pyr)
    for h in handles:
        h.remove()
    layer_loss = []
    ptqer.set_anything(model, "layer_loss", layer_loss)
    t0 = time.time()
    ptqer.set_quantizing(model)
    with torch.no_grad():
        model(xt)
    t_ref = time.time() - t0
    ptqer.set_quantized(model)
    out_sd = {k: v.detach().clone().numpy()
              for k, v in model.state_dict().items()}
    sys.path.remove(REF)
    return out_sd, layer_loss, t_ref


def _load_stage(state_dir):
    p = P.join(state_dir, "stage.json")
    if P.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_stage(state_dir, stage):
    with open(P.join(state_dir, "stage.json"), "w") as f:
        json.dump(stage, f, indent=1)


def main():
    from efficientq_tpu.cli.entrance import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if os.environ.get("EFFQ_CONTROL_CPU"):
        # smoke-test mode: keep off the TPU (env vars are ignored once the
        # ambient site hook imports jax — must use jax.config)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import quality_gate as qg
    from efficientq_tpu import nnir, ops
    from efficientq_tpu.data.datahub import DataHub
    from efficientq_tpu.data.synthetic import (make_synthetic_dataset,
                                               task_modalities)
    from efficientq_tpu.models import build_uresq, torch_io
    from efficientq_tpu.ptq import PTQHyperParams, run_ptq
    from efficientq_tpu.train import Trainer

    qg.WIDTHS[:] = WIDTHS

    import tempfile

    # EFFQ_CONTROL_STATE makes the run resumable: the trained checkpoint and
    # each completed leg persist there, so a killed reference leg (hours of
    # torch-CPU 13826^2 solves, src/models/solver.py:327-337) restarts
    # without repeating the 12-min training or the jax leg.
    state_dir = os.environ.get("EFFQ_CONTROL_STATE", "")
    if state_dir:
        os.makedirs(state_dir, exist_ok=True)
        root = state_dir
        stage = _load_stage(state_dir)
    else:
        root = tempfile.mkdtemp(prefix="effq_w2a2_control_")
        stage = {}
    data_dir, split_dir = make_synthetic_dataset(
        root, task="lits", n_subjects=8, vol_shape=(VOL,) * 3, seed=0)
    hub = DataHub(
        data_dir, task_modalities("lits"),
        train_split=f"{split_dir}/round1/train.txt",
        val_split=f"{split_dir}/round1/val.txt",
        train_batchsize=4, test_batchsize=1, access_type="npy",
        crop_type="balance", balance_rate=0.8,
        balance_mask_func=lambda label: label == 2,
        crop_size_img=PATCH, slide_patch_size=PATCH, slide_overlap=(4, 4, 4))

    cfg = qg.model_cfg(init_stride=INIT_STRIDE)
    graph = build_uresq(cfg)
    n_mo = len(graph.outputs)
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    sd_path = P.join(root, "trained_sd.npz")
    if stage.get("trained") and P.exists(sd_path):
        with np.load(sd_path) as z:
            sd = {k: z[k] for k in z.files}
        fp_dice = stage["fp_dice"]
        print(f"resume: trained checkpoint loaded, FP dice {fp_dice:.4f}",
              flush=True)
    else:
        variables = nnir.init(graph, jax.random.PRNGKey(0))
        tr = Trainer(graph, variables, hub, loss_name="hybrid", num_mo=n_mo,
                     n_class=3, base_lr=0.01, max_epoch=epochs,
                     snapshot_root=P.join(root, "snap"),
                     test_interval=10 ** 9, display_interval=50)
        t0 = time.time()
        for _ in range(epochs):
            ld = tr.train_epoch()
        print(f"trained {epochs} epochs in {time.time() - t0:.1f}s, "
              f"loss {ld['loss']:.4f}", flush=True)
        fp_dice = qg.mean_fg_dice(graph, tr.variables, hub, n_mo, "fp")
        print(f"FP dice: {fp_dice:.4f}", flush=True)
        sd = torch_io.to_torch_state_dict(graph, tr.variables)
        if state_dir:
            np.savez(sd_path, **{k: np.asarray(v) for k, v in sd.items()})
            stage.update(trained=True, fp_dice=float(fp_dice), epochs=epochs)
            _save_stage(state_dir, stage)

    hub.trainseqloader.dataset.use_fix_transform()
    img, _ = next(iter(hub.trainseqloader))
    calib_ncdhw = np.asarray(img, np.float32)
    calib_x = ops.ncdhw_to_ndhwc(jnp.asarray(calib_ncdhw))

    # quantized model skeleton (shared by both calibration legs)
    qcfg = qg.model_cfg(QLVL, init_stride=INIT_STRIDE)
    qgraph = build_uresq(qcfg)

    # ---- leg (a): our PTQ ----
    qvars = torch_io.load_torch_state_dict(
        qgraph, nnir.init(qgraph, jax.random.PRNGKey(0)), sd)
    if stage.get("ours_dice") is not None:
        from efficientq_tpu.ptq.fold_bn import fold_bn

        fg, _ = fold_bn(qgraph, qvars)
        ours_dice, t_ours = stage["ours_dice"], stage["ours_calib_seconds"]
        print(f"resume: ours W2A2 dice {ours_dice:.4f} "
              f"(delta {fp_dice - ours_dice:+.4f})", flush=True)
    else:
        t0 = time.time()
        fg, fv, report = run_ptq(qgraph, qvars, calib_x, task="lits",
                                 init_stride=INIT_STRIDE,
                                 num_mask_lvls=NUM_LVLS,
                                 hp=PTQHyperParams(admm_iter=ADMM_ITER))
        t_ours = time.time() - t0
        ours_dice = qg.mean_fg_dice(fg, fv, hub, n_mo, "quantized")
        print(f"ours W2A2 dice: {ours_dice:.4f} "
              f"(delta {fp_dice - ours_dice:+.4f}, calib {t_ours:.0f}s)",
              flush=True)
        if state_dir:
            stage.update(ours_dice=float(ours_dice),
                         ours_calib_seconds=t_ours)
            _save_stage(state_dir, stage)

    # ---- leg (b): reference PTQ on the same checkpoint ----
    ref_sd, ref_layer_loss, t_ref = reference_ptq(sd, calib_ncdhw)
    # transfer the reference's quantized weights + alphas into our graph;
    # mode='quantized' then reproduces the reference's quantized forward
    rvars = torch_io.load_torch_state_dict(
        fg, nnir.init(fg, jax.random.PRNGKey(0)), ref_sd)
    ref_dice = qg.mean_fg_dice(fg, rvars, hub, n_mo, "quantized")
    print(f"reference W2A2 dice: {ref_dice:.4f} "
          f"(delta {fp_dice - ref_dice:+.4f}, calib {t_ref:.0f}s torch-CPU)",
          flush=True)

    out = {
        "widths": WIDTHS, "vol": VOL, "epochs": epochs, "qlvl": QLVL,
        "admm_iter": ADMM_ITER,
        "fp_dice": fp_dice,
        "ours_w2a2_dice": ours_dice, "ours_delta": fp_dice - ours_dice,
        "reference_w2a2_dice": ref_dice, "reference_delta": fp_dice - ref_dice,
        "ours_vs_reference": ours_dice - ref_dice,
        "ours_calib_seconds": t_ours, "reference_calib_seconds": t_ref,
    }
    path = P.join(P.dirname(P.dirname(P.abspath(__file__))),
                  "experiments/quality_gate_lits_control.json")
    with open(path, "w") as f:
        from efficientq_tpu.utils.toolchain import toolchain_fingerprint
        out["toolchain"] = toolchain_fingerprint()
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
