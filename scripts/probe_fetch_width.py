"""Probe: XLA row-gather cost vs fetched-row width on v5e.

Round 1 established row gathers are issue-rate bound (~4 ms / 1M fetches of
256 B). If that holds to 512 B / 1 KB rows, corner-packing (table4[y*W+x] =
concat of the 4 bilinear corners -> ONE fetch per point) cuts the march's
gather count 4x for free. This measures jnp.take throughput for row widths
64..1024 lanes of bf16 at 1M and 4M fetches.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 16384


def bench(fn, idx, *args, n=20):
    def run(args):
        idx, rest = args[0], args[1:]

        def one(i):
            return fn((idx + i) % R, *rest)

        return jax.lax.map(one, jnp.arange(n, dtype=jnp.int32))

    f = jax.jit(run)
    out = f((idx,) + args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f((idx,) + args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    for N in (1_048_576,):
        for C in (64, 128, 256, 512):
            table = jax.random.normal(jax.random.PRNGKey(0), (R, C),
                                      jnp.bfloat16)
            idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, R,
                                     jnp.int32)
            # reduce the gathered rows so the [N, C] result is consumed on
            # device (sum), keeping output transfer out of the measurement
            ms = bench(lambda i, t: jnp.take(t, i, axis=0).sum(), idx, table)
            gbps = N * C * 2 / ms * 1e3 / 1e9
            print(f"N={N} C={C} ({C*2}B rows): {ms:7.3f} ms "
                  f"({N/ms*1e3/1e6:6.1f} Mfetch/s, {gbps:6.1f} GB/s)",
                  flush=True)


if __name__ == "__main__":
    main()
