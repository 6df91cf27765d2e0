"""Measure effective HBM bandwidth: elementwise add over large arrays."""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    res = {}
    for mb, dt in ((512, jnp.float32), (512, jnp.bfloat16)):
        n = mb * 1024 * 1024 // jnp.dtype(dt).itemsize
        x = jax.device_put(jnp.ones((n,), dt), dev)

        def run(x):
            # abs(x + i) is not hoistable: the reduction differs per i and
            # requires re-reading x (same trick as probe_fetch_width2)
            def one(i):
                return jnp.sum(jnp.abs(x + i.astype(dt)).astype(jnp.float32))
            return jax.lax.map(one, jnp.arange(10, dtype=jnp.float32))

        f = jax.jit(run)
        np.asarray(f(x))          # tunnel-honest sync: host transfer
        t0 = time.perf_counter()
        np.asarray(f(x))
        dt_s = (time.perf_counter() - t0) / 10
        # traffic per iter: read x once (sum fuses into the scale)
        res[f"read_{mb}MB_{jnp.dtype(dt).name}_GBps"] = round(
            mb / 1024 / dt_s, 1)

    # copy: read + write
    n = 256 * 1024 * 1024 // 4
    x = jax.device_put(jnp.ones((n,), jnp.float32), dev)

    def runc(x):
        # abs() per step prevents fusing the chain into one scale
        def one(c, i):
            c = jnp.abs(c + i)
            return c, jnp.float32(0)
        y, _ = jax.lax.scan(one, x, jnp.arange(20, dtype=jnp.float32))
        return jnp.sum(y)

    f = jax.jit(runc)
    np.asarray(f(x))
    t0 = time.perf_counter()
    np.asarray(f(x))
    dt_s = (time.perf_counter() - t0) / 20
    res["copy_256MB_rw_GBps"] = round(2 * 256 / 1024 / dt_s, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
