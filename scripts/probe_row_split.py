"""Plane-gather row-shape probe (round 3): can the 512 B bf16 quad row be
beaten by splitting into smaller fetches?

Context (docs/PERF.md): the march's triplane stage fetches ONE 512 B
quad-packed row per (point, plane) — 4 corners x 64 ch bf16. The
probe_fetch_width2 curve shows 64 B rows at ~5.8 ms/M vs 8.4-8.8 ms/M for
128-512 B, so the open question from the round-2 review is whether
half-quad (2 x 256 B) or pair (2 x 256 B different tables) splits win.
Arithmetic says no (2 fetches in the issue-bound regime ~ 2x cost), but the
review asked for a measurement, not arithmetic.

March-realistic shapes: plane res 128 -> quad table (127*127, 256) bf16;
1.31M points/frame x 2 planes = 2.62M fetches.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=10):
    def run(*a):
        def one(i):
            return fn(a[0] * (1.0 + i * 1e-9), *a[1:])
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))
    f = jax.jit(run)
    np.asarray(f(*args))   # warm-up; np.asarray = honest sync on this tunnel
    t0 = time.perf_counter()
    np.asarray(f(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    N = 1_310_720           # 16384 rays x 80 samples
    RES = 127 * 127         # quad table rows for a 128^2 plane
    C = 64

    kq, kh, kb, kw = jax.random.split(rng, 4)
    quad = jax.device_put(
        jax.random.normal(kq, (RES, 4 * C), jnp.bfloat16), dev)        # 512 B
    # half-quad tables: top corners (y0: x0,x0+1) and bottom (y0+1)
    half_top = jax.device_put(quad[:, : 2 * C], dev)                    # 256 B
    half_bot = jax.device_put(quad[:, 2 * C:], dev)                     # 256 B
    base = jax.device_put(
        jax.random.uniform(kb, (N,), jnp.float32, 0, RES - 1), dev)
    w4 = jax.device_put(jax.random.uniform(kw, (N, 4), jnp.float32), dev)

    def consume(rows_f32, b):
        # per-point scale before the nonlinearity: non-hoistable, forces the
        # gather to materialize each iteration
        return jnp.mean(jnp.sin(rows_f32 * b[:, None]))

    def quad_1fetch(b, t, w):
        idx = jnp.floor(b).astype(jnp.int32)
        rows = jnp.take(t, idx, axis=0)                     # [N, 256] bf16
        v = jnp.einsum("nkc,nk->nc",
                       rows.reshape(N, 4, C).astype(jnp.float32), w)
        return consume(v, b)

    def half_2fetch(b, t_top, t_bot, w):
        idx = jnp.floor(b).astype(jnp.int32)
        top = jnp.take(t_top, idx, axis=0)                  # [N, 128] bf16
        bot = jnp.take(t_bot, idx, axis=0)
        v = (jnp.einsum("nkc,nk->nc",
                        top.reshape(N, 2, C).astype(jnp.float32), w[:, :2])
             + jnp.einsum("nkc,nk->nc",
                          bot.reshape(N, 2, C).astype(jnp.float32), w[:, 2:]))
        return consume(v, b)

    def quad_raw(b, t):
        # fetch-only reference: no corner einsum (what the fused-consumer
        # kernel would leave in XLA)
        idx = jnp.floor(b).astype(jnp.int32)
        rows = jnp.take(t, idx, axis=0).astype(jnp.float32)
        return consume(rows, b)

    res = {}
    for name, fn, args in (
        ("quad512_1fetch_plus_einsum", quad_1fetch, (base, quad, w4)),
        ("half256_2fetch_plus_einsum", half_2fetch,
         (base, half_top, half_bot, w4)),
        ("quad512_fetch_only", quad_raw, (base, quad)),
    ):
        ms = bench(fn, *args)
        res[name] = {"ms_per_1.31M": round(ms, 2),
                     "Mfetch_s": round(N / ms * 1e3 / 1e6, 1)}
        print(name, res[name], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
