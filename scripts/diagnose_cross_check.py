#!/usr/bin/env python3
"""Root-cause instrumentation for the whole-network PTQ cross-check
(VERDICT r1 item 3).

Runs the reference calibration (torch CPU) and ours on identical weights and
calibration volume, RECORDING at every layer the exact quantities the ADMM
consumes: the input activation x, the FP target y, the matched attention
mask, the rho scale, and alpha_act.  Comparing them in lockstep pinpoints
where the two frameworks' trajectories first part ways (mask? rho? forward
numerics? error propagation?).

Reference used strictly as an executable oracle
(src/models/EfficientQConv.py:33-75, src/ptqer.py:141-235).
"""
from __future__ import annotations

import os.path as P
import sys
import types

import numpy as np

sys.path.insert(0, P.dirname(P.dirname(P.abspath(__file__))))
REF = "/root/reference/src"

sys.path.insert(0, P.dirname(P.abspath(__file__)))
from cross_check_reference_ptq import _Args  # noqa: E402


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
    from models.EfficientQConv import EfficientQConv
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

    # ---- instrument the reference: record what each layer's ptq() sees ----
    ref_rec = {}
    orig_ptq = EfficientQConv.ptq

    def rec_ptq(self, xin):
        out_fp = self.output_fp.detach()
        att = None
        if self.mask_pyramid:
            for mask in self.mask_pyramid:
                if mask.shape[1:] == out_fp.shape[2:]:
                    att = mask
                    break
        rho_scale = max(out_fp.numel() * out_fp.std().item()
                        / (self.weight.data.numel()
                           * self.weight.data.std().item()), 1.0)
        if att is not None:
            rho_scale *= att.mean().item()
        ref_rec[self.name] = {
            "x": xin.detach().cpu().numpy().copy(),
            "y": out_fp.cpu().numpy().copy(),
            "att": None if att is None else att.cpu().numpy().copy(),
            "rho_scale": rho_scale,
            "w0": self.weight.data.cpu().numpy().copy(),
        }
        out = orig_ptq(self, xin)
        ref_rec[self.name]["alpha_act"] = float(self.alpha_act.data)
        ref_rec[self.name]["wq"] = self.weight.data.cpu().numpy().copy()
        return out

    EfficientQConv.ptq = rec_ptq

    search_fold_and_remove_bn(ref_model)
    ptqer.set_name(ref_model)
    ptqer.set_fp(ref_model)
    handles = []

    def register(module, hs):
        if isinstance(module, PTQConv):
            hs.append(module.register_forward_hook(
                __import__("models.hooks",
                           fromlist=["forward_hook"]).forward_hook))
        else:
            for c in module.children():
                register(c, hs)

    # faithful-GPU-semantics hook: the reference's forward_hook stores
    # ``output.detach().cpu()`` (src/models/hooks.py:5-6).  From CUDA that
    # copies; on torch-CPU ``.cpu()`` is a NO-OP VIEW, and with the 'mid'
    # ordering the next block's ReLU(inplace=True) then mutates the cached
    # FP target through the folded-BN StraightThrough.  Clone so the CPU
    # oracle reproduces what the reference computes on its real (GPU)
    # substrate.
    import models.hooks as ref_hooks

    def clone_hook(module, inputs, output):
        module.output_fp = output.detach().clone()

    ref_hooks.forward_hook = clone_hook

    register(ref_model, handles)
    with torch.no_grad():
        out_fp_t = ref_model(torch.from_numpy(x)).detach()
    body = torch.ones_like(torch.from_numpy(x)[:, 0]).bool()
    wm_ref, nums_ref = ptqer.get_att_weight_map(out_fp_t, body, "p:0.5",
                                                task="lits")
    pyr_ref = ptqer.get_mask_pyramid(out_fp_t, body, wm_ref,
                                     _Args.init_stride, num_lvls=5,
                                     task="lits")
    ptqer.set_mask(ref_model, pyr_ref)
    for h in handles:
        h.remove()
    ptqer.set_anything(ref_model, "layer_loss", [])
    ptqer.set_quantizing(ref_model)
    with torch.no_grad():
        ref_model(torch.from_numpy(x))
    EfficientQConv.ptq = orig_ptq
    sys.path.remove(REF)

    # ---- ours, with the same recording at the calibrate_layer boundary ----
    import jax

    # diagnosis runs on CPU: identical math, no remote-compile latency
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp

    from efficientq_tpu import nnir, ops
    from efficientq_tpu.models import UResQConfig, build_uresq, torch_io
    from efficientq_tpu.ptq import PTQHyperParams
    from efficientq_tpu.ptq import engine as eng
    from efficientq_tpu.ptq import admm as admm_mod

    cfg = UResQConfig(
        num_mod=1, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid", ds="simple",
        ds_depth_limit=3, aniso_pool_depth=99999, fuse_bn=True,
        quantize=True, qlvl_w=4, qlvl_act=4, q_first=(256, -1),
        q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    variables = torch_io.load_torch_state_dict(graph, variables, sd)

    our_rec = {}
    seq = []
    real_cal = admm_mod.calibrate_layer

    def rec_cal(x_q, y_fp, kernel, bias, att, **kw):
        res = real_cal(x_q, y_fp, kernel, bias, att, **kw)
        name = seq.pop(0)
        w_flat = np.asarray(kernel).reshape(-1, kernel.shape[-1]).T
        y = np.asarray(y_fp)
        rho = max(y.size * y.std(ddof=1)
                  / (w_flat.size * w_flat.std(ddof=1)), 1.0)
        if att is not None:
            rho *= float(np.mean(np.asarray(att)))
        our_rec[name] = {
            "x": np.moveaxis(np.asarray(x_q), -1, 1),
            "y": np.moveaxis(y, -1, 1),
            "att": None if att is None else np.asarray(att),
            "rho_scale": rho,
            "alpha_act": (None if res["alpha_act"] is None
                          else float(res["alpha_act"])),
            "wq": np.transpose(np.asarray(res["kernel"]), (4, 3, 0, 1, 2)),
            "w0": np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2)),
        }
        return res

    # engine binds calibrate_layer at import; patch its reference
    eng.calibrate_layer = rec_cal
    try:
        g2 = graph
        seq.extend(n.name for n in g2.qconv_nodes()
                   if n.attrs["qcfg"].q_weight)
        eng.run_ptq(graph, variables, ops.ncdhw_to_ndhwc(jnp.asarray(x)),
                    task="lits", init_stride=(2, 2, 2),
                    hp=PTQHyperParams(admm_iter=200))
    finally:
        eng.calibrate_layer = real_cal

    # ---- lockstep comparison ----
    def rel(a, b):
        s = max(np.abs(b).max(), 1e-12)
        return np.abs(np.asarray(a) - np.asarray(b)).max() / s

    print(f"{'layer':45s} {'d(x)':>9s} {'d(y)':>9s} {'d(att)':>9s} "
          f"{'d(rho)':>9s} {'d(a_act)':>9s} {'d(w0)':>9s} {'d(wq)':>9s}")
    for name in ref_rec:
        r, o = ref_rec[name], our_rec.get(name)
        if o is None:
            print(f"{name:45s} MISSING on our side")
            continue
        datt = (0.0 if r["att"] is None and o["att"] is None
                else rel(o["att"], r["att"]))
        da = (0.0 if o["alpha_act"] is None
              else abs(o["alpha_act"] - r["alpha_act"])
              / max(abs(r["alpha_act"]), 1e-12))
        print(f"{name:45s} {rel(o['x'], r['x']):9.2e} "
              f"{rel(o['y'], r['y']):9.2e} {datt:9.2e} "
              f"{abs(o['rho_scale'] - r['rho_scale']) / r['rho_scale']:9.2e} "
              f"{da:9.2e} {rel(o['w0'], r['w0']):9.2e} "
              f"{rel(o['wq'], r['wq']):9.2e}")


if __name__ == "__main__":
    main()
