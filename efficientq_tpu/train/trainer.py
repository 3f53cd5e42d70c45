"""FP training engine.

Mirrors src/utils/trainer.py: epoch loop with display/test intervals,
per-iteration jitted train step (forward + deep-supervision loss + backward
+ value-clipped Adam + poly/warmup LR), online validation with best-metric
('seg_max') tracking after epoch 10, latest/periodic snapshots, loss.txt /
seg_metric.txt sinks, resume, and a final compressed export.

TPU-first: the train step is one jitted function carrying (params, state,
opt_state); multi-chip data parallelism shards the batch axis via
jax.sharding (parallel/mesh.py) — the same step function runs on 1 or N
devices.
"""
from __future__ import annotations

import os
import os.path as P
import pickle
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nnir, ops
from ..eval.validate import validate_seg
from ..models import torch_io
from .losses import get_loss, head_loss_weights, multi_output_loss
from .schedule import make_optimizer


class Trainer:
    def __init__(self, graph, variables, data_cube, *, loss_name: str,
                 num_mo: int, n_class: int, base_lr: float, max_epoch: int,
                 snapshot_root: str, weight_decay: float = 0.0,
                 warmup_epochs: int = 1, test_interval: int = 50,
                 display_interval: int = 10, multilabel_fusetype=None,
                 seed: int = 0, mesh=None, check_nan: bool = True,
                 tb_writer=None, ckpt_backend: str = "pickle",
                 fsdp: bool = False, remat: int = 0, amp: bool = False,
                 apply_mode: str = "fp"):
        self.graph = graph
        # the train step donates its carried state buffers; own a private
        # copy so the caller's tree (often shared with a second Trainer or
        # kept for a reference comparison) survives the first step's
        # donation instead of raising "Array has been deleted"
        self.variables = {
            "params": jax.tree.map(jnp.array, variables["params"]),
            "state": jax.tree.map(jnp.array, variables.get("state", {})),
        }
        self.data = data_cube
        self.num_mo = num_mo
        self.n_class = n_class
        self.max_epoch = max_epoch
        self.root = snapshot_root
        self.test_interval = test_interval
        self.display_interval = display_interval
        self.multilabel_fusetype = multilabel_fusetype
        self.check_nan = check_nan
        assert ckpt_backend in ("pickle", "orbax")
        self.ckpt_backend = ckpt_backend
        os.makedirs(snapshot_root, exist_ok=True)

        iters_per_epoch = max(len(data_cube.trainloader), 1)
        total = iters_per_epoch * max_epoch
        self.optimizer, self.schedule = make_optimizer(
            base_lr, total, warmup_epochs * iters_per_epoch, weight_decay)
        self.opt_state = self.optimizer.init(self.variables["params"])
        self.loss_fn = get_loss(loss_name)
        self.head_w = head_loss_weights(num_mo)
        # multi-process (jax.distributed): decorrelate the per-process
        # dropout/augmentation streams — with a shared seed every process
        # would draw identical crops/noise, making the global batch N
        # copies of one process's batch.  (The model-INIT key is the
        # caller's and identical across processes, as required for the
        # replicated parameters.)
        self.rng = jax.random.PRNGKey(seed)
        if mesh is not None and jax.process_count() > 1:
            self.rng = jax.random.fold_in(self.rng, jax.process_index())
        self.step_idx = 0
        self.epoch = 0
        self.start_epoch = 1
        self.max_seg_metric_val = 0.0
        self.mesh = mesh
        # multi-process (jax.distributed): only process 0 writes snapshots
        # and text sinks (identical replicated state everywhere; on a
        # shared filesystem concurrent writers would race), and online
        # validation is skipped (the eval path is single-process)
        self._multiproc = mesh is not None and jax.process_count() > 1
        self._rank0 = not self._multiproc or jax.process_index() == 0
        if fsdp and mesh is None:
            raise ValueError("fsdp requires a device mesh (--dp_devices)")
        self.fsdp = bool(fsdp)
        self.remat = int(remat)
        self.amp = bool(amp)
        # 'fp' trains plain convs; 'fq' is the QAT fine-tune path: forward
        # fake-quantizes weights AND activations from the calibrated alphas
        # (quant.discretize is STE-differentiable), so the optimizer updates
        # latent weights + alphas under the deployed quantization function.
        # The reference is PTQ-only (src/ptqer.py); QAT is a TPU-native
        # extension riding the same pipelined trainer.
        assert apply_mode in ("fp", "fq")
        self.apply_mode = apply_mode
        self.tb_writer = tb_writer
        self._train_step = self._build_train_step()
        if self.fsdp:
            # place the training state sharded from step 0 (otherwise the
            # first step holds a replicated copy of params + both Adam
            # moments per device before the constraint kicks in)
            self.variables = dict(self.variables)
            self.variables["params"] = jax.device_put(
                self.variables["params"], self._fsdp_psh)
            self.opt_state = jax.device_put(self.opt_state, self._fsdp_osh)
        elif mesh is not None and jax.process_count() > 1:
            # multi-process jit needs GLOBAL arrays: place the carried
            # state replicated on the full mesh up front (host values are
            # identical on every process — same init key); the in-step
            # sharding constraint alone cannot lift a single-device array
            # onto non-addressable devices
            from ..parallel.mesh import replicate

            self.variables = replicate(mesh, self.variables)
            self.opt_state = replicate(mesh, self.opt_state)
        # model/scheme dump (trainer.py:75-76 description.txt)
        with open(P.join(snapshot_root, "description.txt"), "w") as f:
            f.write(f"loss={loss_name} lr={base_lr} epochs={max_epoch} "
                    f"warmup_epochs={warmup_epochs} wd={weight_decay}\n")
            for node in graph.nodes:
                f.write(f"{node.name}: {node.op} {node.attrs}\n")

    # ------------------------------------------------------------------
    def _build_train_step(self):
        graph = self.graph
        loss_fn = self.loss_fn
        head_w = self.head_w
        optimizer = self.optimizer
        mesh = self.mesh

        remat = self.remat
        # mixed-precision training (--amp): per-node bf16 casts inside the
        # graph interpreter — activations are computed/written at bf16
        # (MXU-native; bf16 keeps f32's exponent range so no loss scaling),
        # while the master params, grads (accumulated through the astype
        # transpose), BN statistics, loss, and Adam state all stay f32.
        # Composes with --remat and --fsdp.  The reference trains f32-only.
        # QAT trains f32: the fake-quant grid arithmetic (divide, clip,
        # round) must not run at bf16 — a half-width round flips 2-bit codes
        compute_dtype = (jnp.bfloat16 if self.amp and self.apply_mode == "fp"
                         else None)
        apply_mode = self.apply_mode

        def loss_and_state(params, state, x, y, rng):
            out, new_state = nnir.apply(
                graph, {"params": params, "state": state}, x, train=True,
                rng=rng, remat=remat, compute_dtype=compute_dtype,
                mode=apply_mode)
            # heads stacked (M, N, D, H, W, C) -> reference layout (M,N,C,...)
            out_ncdhw = jnp.moveaxis(out, -1, 2)
            total, arr = multi_output_loss(loss_fn, head_w, out_ncdhw, y)
            return total, (new_state, arr)

        fsdp = self.fsdp
        if mesh is not None:
            from ..parallel.mesh import (batch_sharding, fsdp_shardings,
                                         replicated)

            xsh = batch_sharding(mesh)
            rsh = replicated(mesh)
            if fsdp:
                psh = fsdp_shardings(mesh, self.variables["params"])
                osh = fsdp_shardings(mesh, self.opt_state)
                self._fsdp_psh, self._fsdp_osh = psh, osh

        # donate the carried training state: params + BN state + both Adam
        # moments are pure read-modify-write per step, so XLA updates them
        # in place instead of holding input and output copies live (x/y are
        # NOT donated — device_feed double-buffers them)
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, state, opt_state, x, y, rng, step_idx):
            if mesh is not None:
                # data parallelism: batch axis over the mesh, params
                # replicated; XLA derives the gradient all-reduce over ICI.
                # Under fsdp the params + optimizer state are instead
                # sharded over the same axis (parallel/mesh.py::
                # fsdp_shardings) and GSPMD derives the ZeRO schedule:
                # all-gather-on-use forward, reduce-scattered gradients,
                # sharded Adam update.
                x = jax.lax.with_sharding_constraint(x, xsh)
                y = jax.lax.with_sharding_constraint(y, xsh)
                if fsdp:
                    params = jax.lax.with_sharding_constraint(params, psh)
                    opt_state = jax.lax.with_sharding_constraint(
                        opt_state, osh)
                else:
                    params = jax.lax.with_sharding_constraint(
                        params, jax.tree.map(lambda _: rsh, params))
            # layout transpose + per-step RNG derivation fused into the
            # compiled program: the host loop issues no per-step device ops
            # beyond the step call itself
            x = ops.ncdhw_to_ndhwc(x)
            sub = jax.random.fold_in(rng, step_idx)
            (loss, (new_state, arr)), grads = jax.value_and_grad(
                loss_and_state, has_aux=True)(params, state, x, y, sub)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            if mesh is not None and fsdp:
                # pin the carried-state layout so the step's fixed point is
                # sharded (not whatever layout the partitioner last chose)
                params = jax.lax.with_sharding_constraint(params, psh)
                opt_state = jax.lax.with_sharding_constraint(opt_state, osh)
            merged_state = {**state, **new_state}
            return params, merged_state, opt_state, loss, arr

        return step

    # ------------------------------------------------------------------
    def train_epoch(self) -> Dict[str, float]:
        """One pipelined epoch.

        The reference overlaps host prep with device compute via DataLoader
        worker processes (src/dataloader/datahub.py:94-115); here the epoch
        loop never blocks on a step result: batches are double-buffered
        onto the device (data/prefetch.py::device_feed) and the loss
        scalars accumulate as device values, materialized ONCE at the epoch
        boundary.  The NaN check runs on the materialized values."""
        from ..data.prefetch import device_feed

        loss_buf, arr_buf = [], []
        for x, y in device_feed(self.data.trainloader, mesh=self.mesh):
            # critical section: the step DONATES the carried state, so a
            # KeyboardInterrupt between dispatch and the reassignment would
            # leave self.variables pointing at deleted buffers — and the
            # interrupt handler's emergency snapshot (train():
            # 'KeyboardInterrupt') would fail instead of saving.  Defer
            # SIGINT across dispatch + reassign (microseconds; the step
            # itself is an async dispatch).
            with _defer_sigint():
                p, s, o, loss, arr = self._train_step(
                    self.variables["params"], self.variables["state"],
                    self.opt_state, x, y, self.rng, self.step_idx)
                self.variables = {"params": p, "state": s}
                self.opt_state = o
            self.step_idx += 1
            loss_buf.append(loss)
            arr_buf.append(arr)
        # single epoch-end materialization: one stacked transfer each for
        # the scalars and the per-head arrays (N sequential tiny transfers
        # cost ~25 ms each through a remote-attached device)
        losses = np.asarray(jnp.stack(loss_buf))
        arr_mean = np.asarray(jnp.mean(jnp.stack(arr_buf), axis=0))
        if self.check_nan and not np.all(np.isfinite(losses)):
            print("NaN")
        loss_dict = {"loss": float(np.mean(losses))}
        for i in range(-len(arr_mean), 0):
            loss_dict[f"loss/{i}"] = float(arr_mean[i])
        return loss_dict

    def current_lr(self) -> float:
        return float(self.schedule(self.step_idx))

    # ------------------------------------------------------------------
    def validate_online(self, epoch: int, seg_metricF=None) -> Dict[str, float]:
        metric_dict: Dict[str, float] = {}
        for split, loader, sns in (("val", self.data.valloader, self.data.val_sn),
                                   ("test", self.data.testloader,
                                    self.data.test_sn)):
            if loader is None:
                continue
            sm = validate_seg(
                self.graph, self.variables, loader, sns, self.num_mo,
                self.n_class, patch_size=self.data.slide_patch_size,
                overlap=self.data.slide_overlap,
                merge_label_func=self.data.merge_label_func,
                multilabel_fusetype=self.multilabel_fusetype,
                # QAT: latent weights are off-grid mid-training, so eval
                # must re-quantize on the fly (mode='quantized' would run
                # them raw)
                mode=self.apply_mode)
            m = sm[-1].get_metric()
            for k, v in m.items():
                metric_dict[f"{split}/seg_{k}"] = v
            if split == "val" and seg_metricF is not None:
                sm[-1].write_csv(epoch, seg_metricF)
                seg_metricF.flush()
        return metric_dict

    # ------------------------------------------------------------------
    def train(self):
        loss_all = []
        sink = lambda name: (P.join(self.root, name) if self._rank0
                             else os.devnull)
        lossF = open(sink("loss.txt"), "a")
        seg_metricF = open(sink("seg_metric.txt"), "a")
        if self._multiproc:
            print("multi-process training: online validation skipped "
                  "(single-process eval path); snapshots/sinks written by "
                  "process 0 only")
        start = time.time()
        profile_dir = os.environ.get("EFFQ_PROFILE_DIR")
        try:
            for epoch in range(self.start_epoch, self.max_epoch + 1):
                if profile_dir and epoch == self.start_epoch + 1:
                    # trace the first post-compile epoch (jax.profiler)
                    with jax.profiler.trace(profile_dir):
                        loss_dict = self.train_epoch()
                else:
                    loss_dict = self.train_epoch()
                loss_all.append(loss_dict["loss"])
                self.epoch = epoch
                if epoch % self.display_interval == 0 or epoch == self.start_epoch:
                    N = self.display_interval
                    avg = float(np.mean(loss_all[-N:]))
                    el = time.time() - start
                    print(f"Epoch {epoch}: loss = {avg:.5f}, "
                          f"lr = {self.current_lr():.5e}, elapsed {el:.0f}s")
                    lossF.write("%d,%.7f\n" % (epoch, avg))
                    lossF.flush()
                if self.tb_writer:
                    self.tb_writer.add_scalar("Learning Rate",
                                              self.current_lr(), epoch)
                    for k, v in loss_dict.items():
                        self.tb_writer.add_scalar(k, float(v), epoch)
                if self._multiproc:
                    continue  # see the note above: eval is single-process
                if epoch % self.test_interval == 0 or epoch == self.start_epoch:
                    metric_dict = self.validate_online(epoch, seg_metricF)
                    val_dsc = metric_dict.get("val/seg_dsc", 0.0)
                    self.snapshot(epoch, "latest")
                    if self.max_seg_metric_val < val_dsc and epoch > 10:
                        self.max_seg_metric_val = val_dsc
                        self.snapshot(epoch, "seg_max")
                    if self.tb_writer:
                        for k, v in metric_dict.items():
                            self.tb_writer.add_scalar(k, float(v), epoch)
        except KeyboardInterrupt:
            self.snapshot(self.epoch, "KeyboardInterrupt")
            raise
        finally:
            lossF.close()
            seg_metricF.close()
        self.snapshot(self.max_epoch)
        self.final_snap("FP")
        # transient snapshot cleanup (trainer.py:152-155)
        for stem in ("state_0001", "state_current", "state_latest",
                     "state_KeyboardInterrupt"):
            path = P.join(self.root, stem + ".pkl")
            if P.isfile(path):
                os.remove(path)
            opath = P.join(self.root, stem + ".orbax")
            if P.isdir(opath):
                import shutil

                shutil.rmtree(opath)

    # ------------------------------------------------------------------
    # checkpointing (trainer.py:427-481)
    def snapshot(self, epoch: int, name: Optional[str] = None):
        if not self._rank0:
            return
        payload = {
            "epoch": epoch,
            "state_dict": torch_io.to_torch_state_dict(self.graph,
                                                       self.variables),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "step_idx": self.step_idx,
            "max_metric": self.max_seg_metric_val,
        }
        stem = ("state_%04d" % epoch) if name is None else ("state_%s" % name)
        if self.ckpt_backend == "orbax":
            # directory-based, atomic, multi-host-safe (utils/checkpoint.py)
            from ..utils.checkpoint import ORBAX_SUFFIX, save_checkpoint

            return save_checkpoint(P.join(self.root, stem + ORBAX_SUFFIX),
                                   payload)
        fname = P.join(self.root, stem + ".pkl")
        with open(fname, "wb") as f:
            pickle.dump(payload, f)
        return fname

    def resume(self, path: str):
        from ..utils.checkpoint import is_orbax_checkpoint

        if is_orbax_checkpoint(path):
            from ..utils.checkpoint import restore_checkpoint

            template = {
                "epoch": 0,
                "state_dict": torch_io.to_torch_state_dict(self.graph,
                                                           self.variables),
                "opt_state": jax.tree.map(np.asarray, self.opt_state),
                "step_idx": 0,
                "max_metric": 0.0,
            }
            payload = restore_checkpoint(path, template)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        self.variables = torch_io.load_torch_state_dict(
            self.graph, self.variables, payload["state_dict"])
        if "opt_state" in payload:
            self.opt_state = jax.tree.map(
                jnp.asarray, payload["opt_state"],
                is_leaf=lambda x: isinstance(x, np.ndarray))
        self.step_idx = payload.get("step_idx", 0)
        self.max_seg_metric_val = payload.get("max_metric", 0.0)
        self.start_epoch = payload["epoch"] + 1

    def load_pretrain(self, path: str):
        from ..utils.checkpoint import is_orbax_checkpoint

        if is_orbax_checkpoint(path):
            from ..utils.checkpoint import restore_checkpoint

            template = {
                "epoch": 0,
                "state_dict": torch_io.to_torch_state_dict(self.graph,
                                                           self.variables),
                "opt_state": jax.tree.map(np.asarray, self.opt_state),
                "step_idx": 0,
                "max_metric": 0.0,
            }
            payload = restore_checkpoint(path, template)
            self.variables = torch_io.load_torch_state_dict(
                self.graph, self.variables, payload["state_dict"])
            return
        if path.endswith(".pkl") and _is_torch_pickle(path):
            self.variables = torch_io.load_torch_checkpoint(
                self.graph, self.variables, path)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            self.variables = torch_io.load_torch_state_dict(
                self.graph, self.variables, payload["state_dict"])

    def final_snap(self, name: str):
        """Compressed npz export; near-ternary conv weights cast to int8
        (trainer.py:470-481)."""
        if not self._rank0:
            return
        sd = torch_io.to_torch_state_dict(self.graph, self.variables)
        sdx = {}
        for k, v in sd.items():
            if "conv.weight" in k and len(np.unique(v)) <= 3 and v.max() != 0:
                v = (v / np.abs(v).max()).astype(np.int8)
            sdx[k] = v
        np.savez_compressed(P.join(self.root, f"state_{name}"), state_dict=sdx)


import contextlib
import signal as _signal


@contextlib.contextmanager
def _defer_sigint():
    """Delay SIGINT delivery across the train step's donate+reassign window
    (no-op off the main thread, where Python delivers no signals anyway)."""
    pending = []
    try:
        old = _signal.signal(_signal.SIGINT,
                             lambda *a: pending.append(a))
    except ValueError:  # not the main thread
        yield
        return
    try:
        yield
    finally:
        _signal.signal(_signal.SIGINT, old)
        if pending:
            raise KeyboardInterrupt


def _is_torch_pickle(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(8)
    return head[:2] in (b"PK", b"\x80\x02") or head.startswith(b"PK")
