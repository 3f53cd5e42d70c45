#!/usr/bin/env python3
"""Flagship FP training-step throughput (BraTS 4-mod UResQ, batch 2, 128^3).

Measures two drive styles over the SAME jitted train step:
  sync      — r2 baseline style: per-step host upload + float(loss) sync
              (the loop serializes host prep against device compute)
  pipelined — Trainer.train_epoch: device_feed double-buffering + device-
              side loss accumulation, one sync per epoch

Host prep per batch is realistic: two random 128^3 crops + flips out of a
full-size BraTS volume (the DataHub's transform cost), on the main thread
for `sync` and overlapped for `pipelined`.

Run alone on the chip; prints one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_batches(n, rng, vol, batch=2, ps=128):
    """Emulate DataHub host prep: random crop + flip from a cached volume."""
    out = []
    for _ in range(n):
        imgs, labs = [], []
        for _ in range(batch):
            z, y, x = [rng.integers(0, s - ps + 1) for s in vol.shape[1:4]]
            crop = vol[:, z:z + ps, y:y + ps, x:x + ps]
            if rng.integers(2):
                crop = crop[:, ::-1]
            imgs.append(np.ascontiguousarray(crop))
            # BraTS multilabel target: 3 binary channels (WT/TC/ET nesting)
            labs.append((crop[:3] > 0.5).astype(np.float32))
        out.append((np.stack(imgs), np.stack(labs)))
    return out


class ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def main():
    from efficientq_tpu.cli.entrance import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from efficientq_tpu import nnir
    from efficientq_tpu.models import build_uresq, preset_config

    cfg = preset_config("brats", quantize=False)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))

    class Hub:  # minimal data_cube for Trainer
        trainloader = None
        valloader = testloader = None
        val_sn = test_sn = None
        slide_patch_size = (128, 128, 128)
        slide_overlap = (16, 16, 16)
        merge_label_func = None

    import os
    import tempfile

    from efficientq_tpu.train import Trainer

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((4, 155, 240, 240), dtype=np.float32)

    n_steps = 20
    hub = Hub()
    hub.trainloader = ListLoader(make_batches(2, rng, vol))
    with tempfile.TemporaryDirectory() as snap:
        tr = Trainer(graph, variables, hub, loss_name="bhybrid",
                     num_mo=len(graph.outputs), n_class=3, base_lr=1e-3,
                     max_epoch=1, snapshot_root=snap)

        import jax.numpy as jnp

        # --- warmup / compile (both paths share one jitted step)
        tr.train_epoch()

        # Pre-upload K distinct batches and cycle them: on this box host->
        # device transfers ride a dev tunnel (~35 MB/s), which would swamp
        # the loop-structure difference being measured.  On a direct-
        # attached host device_feed additionally overlaps the upload.
        batches_dev = [tuple(jnp.asarray(a) for a in b)
                       for b in make_batches(4, rng, vol)]
        jax.block_until_ready(batches_dev)
        steps = [batches_dev[i % len(batches_dev)] for i in range(n_steps)]

        # --- sync style (r2 baseline loop: float(loss) per step)
        t0 = time.perf_counter()
        for x, y in steps:
            p, s, o, loss, arr = tr._train_step(
                tr.variables["params"], tr.variables["state"], tr.opt_state,
                x, y, tr.rng, tr.step_idx)
            tr.variables = {"params": p, "state": s}
            tr.opt_state = o
            tr.step_idx += 1
            float(loss)  # per-step host sync
        sync_s = (time.perf_counter() - t0) / n_steps

        # --- pipelined style (train_epoch: device_feed + epoch-end sync);
        # one untimed epoch first so the epoch-end stack/mean programs for
        # this step count are compiled (remote compiles are seconds here)
        hub.trainloader = ListLoader(steps)
        tr.train_epoch()
        t0 = time.perf_counter()
        tr.train_epoch()
        pipe_s = (time.perf_counter() - t0) / n_steps

        # --- mixed precision (--amp): same pipelined loop, bf16 compute
        tr_amp = Trainer(graph, variables, hub, loss_name="bhybrid",
                         num_mo=len(graph.outputs), n_class=3, base_lr=1e-3,
                         max_epoch=1, snapshot_root=snap, amp=True)
        tr_amp.train_epoch()  # compile
        t0 = time.perf_counter()
        tr_amp.train_epoch()
        amp_s = (time.perf_counter() - t0) / n_steps

    batch = 2
    print(json.dumps({
        "metric": "brats_fp_train_step_throughput",
        "unit": "patches/sec",
        "sync_ms_per_step": round(sync_s * 1e3, 2),
        "pipelined_ms_per_step": round(pipe_s * 1e3, 2),
        "amp_ms_per_step": round(amp_s * 1e3, 2),
        "sync_patches_per_sec": round(batch / sync_s, 2),
        "pipelined_patches_per_sec": round(batch / pipe_s, 2),
        "amp_patches_per_sec": round(batch / amp_s, 2),
        "speedup": round(sync_s / pipe_s, 3),
        "amp_speedup_vs_pipelined": round(pipe_s / amp_s, 3),
    }))


if __name__ == "__main__":
    main()
