"""Host->device input pipeline: threaded prefetch + double-buffered device
feed.

The reference relies on torch DataLoader worker processes
(src/dataloader/datahub.py:94-115, num_workers=4).  Here a background thread
pool materializes upcoming batches (NumPy IO and augmentation release the
GIL in the hot paths) and ``DeviceFeeder`` keeps one batch in flight on the
accelerator so host prep overlaps device compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PrefetchLoader:
    """Wraps any iterable-of-batches loader with an N-deep background
    prefetch queue."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        return self.loader.dataset

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err = []

        def worker():
            try:
                for item in self.loader:
                    q.put(item)
            except BaseException as e:  # propagate into consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item


def device_feed(loader: Iterable, transform=None,
                device: Optional[jax.Device] = None, mesh=None):
    """Iterate ``loader`` keeping the next batch's host->device transfer in
    flight while the caller consumes the current one (double buffering).

    With ``mesh`` each batch is placed batch-axis-sharded on the mesh
    (parallel/mesh.py::host_local_batch): on a multi-process mesh the
    loader's batches are THIS process's shard of the global batch —
    required for jit over non-addressable devices, where an uncommitted
    single-device array cannot feed a globally-sharded computation."""
    it = iter(loader)

    if mesh is not None:
        from ..parallel.mesh import host_local_batch

        full = {"n": None}

        def put(item):
            if transform is not None:
                item = transform(item)
            leading = jax.tree_util.tree_leaves(item)[0].shape[0]
            if full["n"] is None:
                full["n"] = leading
            if leading != full["n"]:
                # partial final batch: cannot shard over the mesh
                # (drop-last semantics, standard for data parallelism)
                return None
            return jax.tree.map(
                lambda a: host_local_batch(mesh, np.asarray(a)), item)
    else:
        def put(item):
            if transform is not None:
                item = transform(item)
            return jax.tree.map(
                lambda a: jax.device_put(jnp.asarray(a), device), item)

    try:
        pending = put(next(it))
    except StopIteration:
        return
    for item in it:
        nxt = put(item)
        if pending is not None:
            yield pending
        pending = nxt
    if pending is not None:
        yield pending
