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


def device_feed(loader: Iterable, transform=None, device: Optional[jax.Device] = None):
    """Iterate ``loader`` keeping the next batch's host->device transfer in
    flight while the caller consumes the current one (double buffering)."""
    it = iter(loader)

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
        yield pending
        pending = nxt
    yield pending
