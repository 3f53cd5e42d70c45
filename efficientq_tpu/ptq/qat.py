"""Quantization-aware fine-tuning (QAT) after PTQ calibration.

The reference is PTQ-only (src/ptqer.py drives calibration and stops);
its sub-4-bit results therefore live or die on the calibration draw
(docs/quantization.md's W2A2 matrix).  This module adds the standard
escape hatch the reference lacks: a short fine-tune of the calibrated
net UNDER the deployed quantization function.

TPU-native ingredients, all already in place:

  - ``nnir.apply(mode="fq")`` fake-quantizes weights and activations on
    the fly from the per-layer alphas; ``quant.discretize`` rounds with
    ``ste_round``, so the whole forward is STE-differentiable and the
    alphas receive PACT/LSQ-style gradients through the clip-and-scale
    algebra for free.
  - The pipelined ``Trainer`` (donated state, device_feed prefetch,
    mesh/fsdp support) runs the loop; QAT is just ``apply_mode="fq"``.

After training, latent weights sit off the quantization grid (STE
updates them continuously); :func:`snap_to_grid` re-projects every
calibrated kernel so the stored checkpoint is exactly deployable
(``mode="quantized"`` / int8 export reproduce the fine-tuned forward
bit-for-bit).

Epoch selection follows the repo's 2-bit finding (reconstruction /
train-loss improvements do not imply held-out dice): every epoch is
scored by val dice and the BEST epoch's parameters are kept, epoch 0
(the pure-PTQ state) included — so ``--qat_epochs`` can never make the
shipped model worse than the PTQ it started from.
"""
from __future__ import annotations

import os
import os.path as P
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import fake_quant_weight


def snap_to_grid(fgraph, variables) -> None:
    """Project latent QAT weights back onto their quantization grids
    (in place): kernel <- fake_quant_weight(kernel, alpha_w, qlvl_w) for
    every weight-quantized conv, alphas clamped positive (the fake-quant
    algebra needs alpha > 0; a tiny-LR fine-tune never crosses zero, the
    clamp is a deployment guard)."""
    params = variables["params"]
    for node in fgraph.qconv_nodes():
        qcfg = node.attrs["qcfg"]
        p = params[node.name]
        if qcfg.q_act and "alpha_act" in p:
            p["alpha_act"] = jnp.maximum(p["alpha_act"], 1e-8)
        if qcfg.q_weight and "alpha_w" in p:
            p["alpha_w"] = jnp.maximum(p["alpha_w"], 1e-8)
            p["kernel"] = fake_quant_weight(p["kernel"], p["alpha_w"],
                                            qcfg.qlvl_w)


def run_qat(fgraph, qvars, hub, *, num_mo: int, n_class: int,
            loss_name: str, epochs: int, lr: float, snapshot_root: str,
            mesh=None, multilabel_fusetype=None, display_interval: int = 10,
            weight_decay: float = 0.0,
            seed: int = 0) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fine-tune a calibrated (BN-folded) quantized net for ``epochs``
    epochs over ``hub.trainloader`` and return (variables, log).

    ``qvars`` is ``run_ptq``'s output (quantized kernels + alphas); the
    input tree is not mutated.  The returned variables are snapped to the
    grid (deployment-exact) and correspond to the best-val-dice epoch
    (epoch 0 = pure PTQ included).
    """
    from ..train.trainer import Trainer

    # Offset-grid shifts (run_ptq act_offset) are integer params — Adam
    # cannot carry an int32 leaf (and k must stay integral anyway): bake
    # them into STATIC graph attrs for the fq forward (nnir reads attrs
    # before params) and re-attach to the returned variables
    import dataclasses as _dc

    act_ks = {}
    qvars = {"params": {k: dict(v) for k, v in qvars["params"].items()},
             "state": dict(qvars.get("state", {}))}
    for name, p in qvars["params"].items():
        if "act_k" in p:
            act_ks[name] = int(np.asarray(p.pop("act_k")))
    if act_ks:
        fgraph = _dc.replace(fgraph, nodes=[
            (_dc.replace(n, attrs={**n.attrs, "act_k": act_ks[n.name]})
             if n.name in act_ks else n) for n in fgraph.nodes],
            _index=None)

    # Mirror Trainer's multi-process handling (trainer.py): under a
    # multi-process mesh the sliding-window eval path is single-process
    # (host-local patch arrays vs globally-replicated params would mix in
    # a mesh-less jit), so per-epoch val scoring is skipped — the final
    # epoch is kept — and print/file sinks are written by process 0 only
    # (a shared filesystem would race otherwise).
    multiproc = mesh is not None and jax.process_count() > 1
    rank0 = not multiproc or jax.process_index() == 0

    trainer = Trainer(
        fgraph, qvars, hub, loss_name=loss_name, num_mo=num_mo,
        n_class=n_class, base_lr=lr, max_epoch=max(int(epochs), 1),
        snapshot_root=snapshot_root, weight_decay=weight_decay,
        warmup_epochs=0, test_interval=10 ** 9,
        display_interval=display_interval,
        multilabel_fusetype=multilabel_fusetype, seed=seed, mesh=mesh,
        apply_mode="fq")

    def _val_dice() -> Optional[float]:
        # val split only (validate_online would also walk the test loader:
        # slower, and epoch selection must never see test data)
        if hub.valloader is None or multiproc:
            return None
        from ..eval.validate import validate_seg

        sm = validate_seg(
            fgraph, trainer.variables, hub.valloader, hub.val_sn, num_mo,
            n_class, patch_size=hub.slide_patch_size,
            overlap=hub.slide_overlap,
            merge_label_func=hub.merge_label_func,
            multilabel_fusetype=multilabel_fusetype, mode="fq")
        return float(sm[-1].get_metric()["dsc"])

    def _host_params():
        return jax.tree.map(np.asarray, trainer.variables["params"])

    history = []
    dice0 = _val_dice()
    best = {"epoch": 0, "dice": dice0, "params": _host_params()}
    if dice0 is not None and rank0:
        print(f"qat: epoch 0 (pure PTQ) val dice {dice0:.4f}")
    if multiproc and rank0:
        print("qat: multi-process mesh — per-epoch val scoring skipped "
              "(single-process eval path); final epoch kept; sinks "
              "written by process 0 only")
    for epoch in range(1, int(epochs) + 1):
        trainer.epoch = epoch
        stats = trainer.train_epoch()
        dice = _val_dice()
        history.append({"epoch": epoch, "loss": stats["loss"], "dice": dice})
        line = f"qat: epoch {epoch}/{epochs} loss {stats['loss']:.6f}"
        if dice is not None:
            line += f" val dice {dice:.4f}"
            if best["dice"] is None or dice > best["dice"]:
                best = {"epoch": epoch, "dice": dice,
                        "params": _host_params()}
                line += "  <- best"
        else:  # no val split (or multi-process): keep the final epoch
            best = {"epoch": epoch, "dice": None, "params": _host_params()}
        if rank0:
            print(line)

    out = {"params": jax.tree.map(jnp.asarray, best["params"]),
           "state": dict(qvars.get("state", {}))}
    for name, k in act_ks.items():
        out["params"][name]["act_k"] = jnp.int32(k)
    snap_to_grid(fgraph, out)
    log = {"kept_epoch": best["epoch"], "kept_dice": best["dice"],
           "history": history}
    sink = (P.join(snapshot_root, "qat_loss.txt") if rank0 else os.devnull)
    with open(sink, "w") as f:
        if dice0 is not None:
            mark = "  <- kept" if best["epoch"] == 0 else ""
            f.write(f"epoch 0 (pure PTQ): val_dice {dice0:.6f}{mark}\n")
        for h in history:
            mark = "  <- kept" if h["epoch"] == best["epoch"] else ""
            dtxt = ("" if h["dice"] is None
                    else f" val_dice {h['dice']:.6f}")
            f.write(f"epoch {h['epoch']}: loss {h['loss']:.8g}"
                    f"{dtxt}{mark}\n")
    return out, log
