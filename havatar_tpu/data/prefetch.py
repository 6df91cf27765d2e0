"""Device input prefetching: overlap host IO/decoding with device compute.

The reference overlaps via torch DataLoader worker processes + pinned memory
(train_avatar.py:62, dataloader.py:238-244). TPU-native equivalent: a thread
that stays N batches ahead, converting host numpy batches into device arrays
(`jax.device_put` is async) so the training loop never waits on PNG decode,
ray sampling (~7 ms/frame) or the host->device copy.

On the host side the heavy lifting (PNG decode, resize) already runs in
optimized native code via OpenCV; a custom C++ loader is not justified —
measured host cost is ~10 ms/frame vs >100 ms train steps, hidden entirely
by this prefetcher.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


def device_prefetch(iterator: Iterator, size: int = 2, sharding=None,
                    keys=None) -> Iterator:
    """Wrap a host batch iterator; yields device-resident batches, staying
    ``size`` batches ahead on a background thread.

    ``sharding`` may be a single Sharding applied to every staged array, or
    a dict key->Sharding (see parallel.auto_batch_shardings) for per-key
    placement on a mesh."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def _put(batch):
        import jax.numpy as jnp

        out = {}
        for k, v in batch.items():
            if keys is not None and k not in keys:
                out[k] = v
                continue
            arr = jnp.asarray(v)
            sh = sharding.get(k) if isinstance(sharding, dict) else sharding
            if sh is not None:
                arr = jax.device_put(arr, sh)
            out[k] = arr
        return out

    def worker():
        try:
            for batch in iterator:
                q.put(_put(batch))
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
