"""Row-gather cost vs row width, measured honestly.

The original probe_fetch_width.py was optimized away (loop-hoistable index
math -> implausible 90 Gfetch/s). Here the indices derive from a perturbed
float input each iteration (same non-hoistable pattern as bisect_march.py)
and the output is a scalar mean, so the gather must execute every step.

Questions: (a) is the fast path issue-bound or byte-bound? (b) how narrow
can a row get (f32 values) before falling off the fast path?
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, *args, n=10):
    import numpy as np

    def run(*a):
        def one(i):
            return fn(a[0] * (1.0 + i * 1e-9), *a[1:])
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))
    f = jax.jit(run)
    # np.asarray (real device->host transfer), NOT block_until_ready: the
    # tunnel backend's block_until_ready returns early (see bench.py)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    np.asarray(f(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    N = 1_048_576
    R = 16384
    res = {}
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for C in (16, 32, 64, 128, 256):
            table = jax.device_put(
                jax.random.normal(rng, (R, C), dtype), dev)
            base = jax.device_put(
                jax.random.uniform(rng, (N,), jnp.float32, 0, R - 1), dev)

            def fetch(b, t):
                idx = jnp.floor(b).astype(jnp.int32)
                rows = jnp.take(t, idx, axis=0)
                # multiply by the per-point value BEFORE the nonlinearity:
                # sin(row * b_n) cannot be precomputed per table row, so the
                # gather must materialize (mean∘take alone collapses into a
                # gather of precomputed row sums — measured: "90 Gfetch/s")
                vals = rows.astype(jnp.float32) * b[:, None]
                return jnp.mean(jnp.sin(vals))

            ms = bench(fetch, base, table)
            nbytes = N * C * table.dtype.itemsize
            res[f"{name}_C{C}"] = {
                "ms": round(ms, 2),
                "GBps": round(nbytes / ms * 1e3 / 1e9, 1),
                "Mfetch_s": round(N / ms * 1e3 / 1e6, 1),
            }
            print(name, C, res[f"{name}_C{C}"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
