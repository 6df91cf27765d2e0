"""Standalone timings: fused coarse/fine kernels vs the plain MLP kernel."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, args, n=10):
    def run(*a):
        def one(i):
            a0 = (a[0] * (1.0 + i * 1e-9)).astype(a[0].dtype)
            return fn(a0, *a[1:])
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))
    f = jax.jit(run)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    np.asarray(f(*args))
    return round((time.perf_counter() - t0) / n * 1e3, 2)


def main():
    from havatar_tpu.ops.pallas_mlp import fused_mlp_chain
    from havatar_tpu.ops.pallas_march import (fused_march_coarse,
                                              fused_march_fine)

    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    R, S, Sn, fin = 16384, 64, 16, 176
    p = {
        "layer0": {"kernel": jax.random.normal(rng, (fin, 128)) * 0.05,
                   "bias": jnp.zeros((128,))},
        "layer1": {"kernel": jax.random.normal(rng, (128, 128)) * 0.05,
                   "bias": jnp.zeros((128,))},
        "fc_alpha": {"kernel": jax.random.normal(rng, (128, 1)) * 0.05,
                     "bias": jnp.zeros((1,))},
        "fc_rgbFeat": {"kernel": jax.random.normal(rng, (128, 64)) * 0.05,
                       "bias": jnp.zeros((64,))},
        "fc_rgb": {"kernel": jax.random.normal(rng, (64, 3)) * 0.05,
                   "bias": jnp.zeros((3,))},
    }
    p = jax.device_put(p, dev)
    res = {}

    xc = jax.device_put(
        jax.random.normal(rng, (R, S, fin), jnp.bfloat16), dev)
    d = jax.device_put(jnp.full((R, S), 0.04, jnp.float32), dev)
    res["coarse_kernel_ms"] = timeit(
        lambda a: jnp.mean(fused_march_coarse(a, d, p)[0]), (xc,))

    x2 = jax.device_put(
        jax.random.normal(rng, (R * (S + Sn), fin), jnp.bfloat16), dev)
    res["plain_mlp_80spp_ms"] = timeit(
        lambda a: jnp.mean(fused_mlp_chain(a, p, tile=4096)), (x2,))

    xn = jax.device_put(
        jax.random.normal(rng, (R, Sn, fin), jnp.bfloat16), dev)
    keeps = jax.device_put(
        jax.random.normal(rng, (R * 32, 69), jnp.bfloat16), dev)
    dc = jax.device_put(jnp.full((R, 48), 0.04, jnp.float32), dev)
    ranks = jax.device_put(
        jnp.broadcast_to(jnp.arange(48, dtype=jnp.int32), (R, 48)).copy(),
        dev)
    res["fine_kernel_ms"] = timeit(
        lambda a: jnp.mean(fused_march_fine(a, keeps, dc, ranks, p,
                                            num_keep=32)[0]), (xn,))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
