"""Device prefetcher: ordering, key filtering, termination."""

import numpy as np

import jax.numpy as jnp

from havatar_tpu.data import device_prefetch


def test_device_prefetch_order_and_keys():
    batches = [{"a": np.full((2, 2), i, np.float32), "meta": f"b{i}"}
               for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2, keys={"a"}))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["a"], jnp.ndarray)
        assert float(b["a"][0, 0]) == i
        assert b["meta"] == f"b{i}"  # non-array keys pass through untouched


def test_device_prefetch_empty():
    assert list(device_prefetch(iter([]), size=2)) == []
