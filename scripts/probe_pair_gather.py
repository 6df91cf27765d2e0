"""Probe: can 2D-operand pair/slab gathers halve the corner fetch count
without faulting the device? (1D-operand variants faulted earlier.)"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np


def bench(fn, *args, n=10):
    def run(*a):
        def one(i):
            return fn(a[0] * (1.0 + i * 1e-9), *a[1:])
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))
    f = jax.jit(run)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    N, H, W, C = 1_048_576, 128, 128, 64
    res = {}

    plane = jax.device_put(jax.random.normal(rng, (H, W * C)), dev)
    yf = jax.device_put(jax.random.uniform(rng, (N,), minval=0, maxval=H - 1.01), dev)
    xf = jax.device_put(jax.random.uniform(rng, (N,), minval=0, maxval=W - 1.01), dev)

    # current baseline: 4 row-fetches from [H*W, C]
    plane_flat = plane.reshape(H * W, C)

    def take4(yf, xf):
        y0 = yf.astype(jnp.int32)
        x0 = xf.astype(jnp.int32)
        out = 0.0
        for yi in (y0, y0 + 1):
            for xi in (x0, x0 + 1):
                out = out + jnp.take(plane_flat, yi * W + xi, axis=0)
        return out

    res["take4_ms"] = bench(lambda yf: take4(yf, xf), yf)

    # pair: [H, W*C] operand, slice (1, 2C) at (y, x0*C)
    def pair2(yf, xf):
        y0 = yf.astype(jnp.int32)
        x0 = xf.astype(jnp.int32)
        dn = lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                        collapsed_slice_dims=(),
                                        start_index_map=(0, 1))
        out = 0.0
        for yi in (y0, y0 + 1):
            starts = jnp.stack([yi, x0 * C], -1)
            blk = lax.gather(plane, starts, dn, slice_sizes=(1, 2 * C),
                             mode=lax.GatherScatterMode.CLIP)
            out = out + blk.reshape(-1, 2, C).sum(1)
        return out

    res["pair2_ms"] = bench(lambda yf: pair2(yf, xf), yf)

    # volume slab: [D*H, W] operand, slice (2, W)
    D = 64
    vol = jax.device_put(jax.random.normal(rng, (D * D, D)), dev)
    zf = jax.device_put(jax.random.uniform(rng, (N,), minval=0, maxval=D - 1.01), dev)

    def slab2(zf):
        z0 = zf.astype(jnp.int32)
        y0 = (zf * 0.7).astype(jnp.int32)
        dn = lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                        collapsed_slice_dims=(),
                                        start_index_map=(0,))
        out = 0.0
        for zi in (z0, z0 + 1):
            starts = (zi * D + y0)[:, None]
            blk = lax.gather(vol, starts, dn, slice_sizes=(2, D),
                             mode=lax.GatherScatterMode.CLIP)
            out = out + blk.sum(1)
        return out

    def rows4(zf):
        z0 = zf.astype(jnp.int32)
        y0 = (zf * 0.7).astype(jnp.int32)
        out = 0.0
        for zi in (z0, z0 + 1):
            for yi in (y0, y0 + 1):
                out = out + jnp.take(vol, zi * D + yi, axis=0)
        return out

    res["vol_rows4_ms"] = bench(rows4, zf)
    res["vol_slab2_ms"] = bench(slab2, zf)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
