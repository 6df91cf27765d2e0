"""Compare 2D gather formulations at real sizes (non-hoistable timing)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


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
    flat = jax.device_put(jax.random.normal(rng, (H * W, C)), dev)
    flat_b = flat[None]
    idxf = jax.device_put(
        jax.random.uniform(rng, (N,), minval=0, maxval=H * W - 1.001), dev)

    res = {}

    def corners(idxf):
        i0 = idxf.astype(jnp.int32)
        return i0, i0 + 1, jnp.maximum(i0 - W, 0), jnp.minimum(i0 + W, H * W - 1)

    # a) take_along_axis batched (original formulation)
    def f_a(idxf):
        out = 0.0
        for idx in corners(idxf):
            out = out + jnp.take_along_axis(flat_b, idx[None, :, None], axis=1)
        return out

    res["take_along_axis_ms"] = bench(f_a, idxf)

    # b) jnp.take axis 0, 4 separate
    def f_b(idxf):
        out = 0.0
        for idx in corners(idxf):
            out = out + jnp.take(flat, idx, axis=0)
        return out

    res["take4_ms"] = bench(f_b, idxf)

    # c) one fused take of [4N]
    def f_c(idxf):
        idx = jnp.stack(corners(idxf), 0).reshape(-1)
        g = jnp.take(flat, idx, axis=0).reshape(4, N, C)
        return g.sum(0)

    res["take_fused_ms"] = bench(f_c, idxf)

    # d) explicit lax.gather slice (1, C)
    def f_d(idxf):
        out = 0.0
        dn = lax.GatherDimensionNumbers(offset_dims=(1,),
                                        collapsed_slice_dims=(0,),
                                        start_index_map=(0,))
        for idx in corners(idxf):
            out = out + lax.gather(flat, idx[:, None], dn, slice_sizes=(1, C),
                                   mode=lax.GatherScatterMode.CLIP)
        return out

    res["lax_gather_ms"] = bench(f_d, idxf)

    # e) bf16 take4
    flat16 = flat.astype(jnp.bfloat16)

    def f_e(idxf):
        out = 0.0
        for idx in corners(idxf):
            out = out + jnp.take(flat16, idx, axis=0).astype(jnp.float32)
        return out

    res["take4_bf16_ms"] = bench(f_e, idxf)

    # f) fewer points (is it linear in N?)
    idx_half = idxf[: N // 2]

    def f_f(idxf_h):
        out = 0.0
        for idx in corners(idxf_h):
            out = out + jnp.take(flat, idx, axis=0)
        return out

    res["take4_halfN_ms"] = bench(f_f, idx_half)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
