#!/usr/bin/env python3
"""Cross-check our PTQ against the reference implementation, end to end.

Builds the same tiny UResQ in both frameworks with identical weights, runs
the reference's actual layer-wise calibration (EfficientQConv.ptq via a
'quantizing' forward, on torch CPU) and our run_ptq on the same calibration
volume, then compares per-layer quantized weights, alpha scales and the
final quantized network outputs.

The reference tree is used strictly as an executable oracle.
"""
from __future__ import annotations

import os.path as P
import sys
import time
import types

import numpy as np

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))
REF = "/root/reference/src"


import os

QLVL = int(os.environ.get("CROSS_CHECK_QLVL", "4"))


class _Args:
    task = "lits"
    nMod = 1
    nClass = 3
    bin_label = None
    multi_label = None
    model = "UResQ"
    init_stride = "2,2,2"
    blk = "mid"
    qconv = "effq"
    qlvl_w = QLVL
    qlvl_a = QLVL
    q_first = "256,-1"
    q_last = "256,-1"
    nla = "relu"
    norm = "bn"
    drop_rate = 0.0
    width = "4,8,4"
    depth = "1,1,1"
    dilation = "1,1,1"
    ds = "simple"
    hetero_dim = True
    init_kernel = 3
    pretrain = None
    resume = None
    lwq_verbose = False
    lwq_dataid = 0
    lwq_batchsz = 1
    lwq_patchsz = None


def main():
    import torch

    if "pytz" not in sys.modules:
        fake = types.ModuleType("pytz")
        fake.timezone = lambda tz: None
        sys.modules["pytz"] = fake
    if "nibabel" not in sys.modules:
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
    import ptqer

    torch.manual_seed(0)
    QConv, _, kwQ = get_conv_class(_Args())
    cube, _ = get_model_cube(_Args(), QConv, kwQ)
    ref_model = cube["model"]
    ref_model.eval()
    rng = np.random.RandomState(0)
    for m in ref_model.modules():
        if m.__class__.__name__ == "BatchNorm3d":
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.05))
            m.running_var.copy_(torch.from_numpy(
                (np.abs(rng.randn(*m.running_var.shape)) * 0.2 + 0.9)
                .astype(np.float32)))
    sd = {k: v.detach().clone().numpy()
          for k, v in ref_model.state_dict().items()}

    x = rng.randn(1, 1, 64, 64, 64).astype(np.float32)

    # ---- reference PTQ (do_ptq essentials, ptqer.py:282-364) ----
    search_fold_and_remove_bn(ref_model)
    ptqer.set_name(ref_model)
    ptqer.set_fp(ref_model)
    handles = []

    def register(module, hs):
        if isinstance(module, PTQConv):
            hs.append(module.register_forward_hook(
                __import__("models.hooks", fromlist=["forward_hook"]).forward_hook))
        else:
            for c in module.children():
                register(c, hs)

    # Faithful-GPU-semantics hook (see docs/reference_cross_check.md): the
    # reference's forward_hook stores ``output.detach().cpu()``
    # (src/models/hooks.py:5-6).  From CUDA that copies; on torch-CPU
    # ``.cpu()`` is a NO-OP VIEW and the next block's ReLU(inplace=True)
    # mutates the cached FP calibration target through the folded-BN
    # StraightThrough.  Clone so this CPU oracle reproduces what the
    # reference computes on its real (GPU) substrate.
    import models.hooks as ref_hooks

    def clone_hook(module, inputs, output):
        module.output_fp = output.detach().clone()

    ref_hooks.forward_hook = clone_hook

    register(ref_model, handles)
    with torch.no_grad():
        out_fp_t = ref_model(torch.from_numpy(x)).detach()
    body = torch.ones_like(torch.from_numpy(x)[:, 0]).bool()
    wm, nums = ptqer.get_att_weight_map(out_fp_t, body, "p:0.5", task="lits")
    pyr = ptqer.get_mask_pyramid(out_fp_t, body, wm, _Args.init_stride,
                                 num_lvls=5, task="lits")
    ptqer.set_mask(ref_model, pyr)
    for h in handles:
        h.remove()
    layer_loss = []
    ptqer.set_anything(ref_model, "layer_loss", layer_loss)
    t0 = time.time()
    ptqer.set_quantizing(ref_model)
    with torch.no_grad():
        out_q_ref = ref_model(torch.from_numpy(x))
    t_ref = time.time() - t0
    ptqer.set_quantized(ref_model)
    sys.path.remove(REF)

    # ---- our PTQ on the same weights + volume ----
    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir, ops
    from efficientq_tpu.models import UResQConfig, build_uresq, torch_io
    from efficientq_tpu.ptq import PTQHyperParams, run_ptq

    cfg = UResQConfig(
        num_mod=1, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid", ds="simple",
        ds_depth_limit=3, aniso_pool_depth=99999, fuse_bn=True,
        quantize=True, qlvl_w=QLVL, qlvl_act=QLVL, q_first=(256, -1),
        q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    variables = torch_io.load_torch_state_dict(graph, variables, sd)
    t0 = time.time()
    fg, fv, report = run_ptq(graph, variables, ops.ncdhw_to_ndhwc(jnp.asarray(x)),
                             task="lits", init_stride=(2, 2, 2),
                             hp=PTQHyperParams(admm_iter=200))
    t_ours = time.time() - t0

    # ---- compare ----
    ref_sd = {k: v.detach().clone().numpy()
              for k, v in ref_model.state_dict().items()}
    print(f"reference calibration: {t_ref:.1f}s (torch CPU); "
          f"ours: {t_ours:.1f}s")
    worst_w = worst_a = 0.0
    for node in fg.qconv_nodes():
        if not node.attrs["qcfg"].q_weight:
            continue
        ours_w = np.transpose(np.asarray(fv["params"][node.name]["kernel"]),
                              (4, 3, 0, 1, 2))
        ref_w = ref_sd[f"{node.name}.weight"]
        scale = max(np.abs(ref_w).max(), 1e-8)
        dw = np.abs(ours_w - ref_w).max() / scale
        ours_a = float(fv["params"][node.name]["alpha_w"])
        ref_a = float(ref_sd[f"{node.name}.alpha_w"])
        da = abs(ours_a - ref_a) / max(abs(ref_a), 1e-8)
        code_match = np.mean(np.abs(ours_w - ref_w) < 1e-3 * scale)
        print(f"{node.name:45s} rel|dW|={dw:.4f} codes_match={code_match:.3f}"
              f" alpha rel diff={da:.4f}")
        worst_w = max(worst_w, dw)
        worst_a = max(worst_a, da)

    out_q_ours = np.moveaxis(np.asarray(report.output_q), -1, 2)
    d_out = np.abs(out_q_ours - out_q_ref.numpy())
    print(f"\nfinal quantized outputs: max|diff|={d_out.max():.4f} "
          f"(ref out std={out_q_ref.numpy().std():.4f})")
    print(f"worst weight rel diff {worst_w:.4f}, worst alpha rel diff {worst_a:.4f}")


if __name__ == "__main__":
    main()
