"""Break down the composite+pdf+sort stage cost on TPU."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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
    from havatar_tpu.ops.volume_render import (
        volume_render_radiance_field, sample_pdf, cumprod_exclusive)

    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    Rn, S = 16384, 80
    rf = jax.device_put(jax.random.normal(rng, (Rn, S, 68)), dev)
    zv = jax.device_put(jnp.broadcast_to(jnp.linspace(1., 4., S), (Rn, S)), dev)
    rd = jax.device_put(jax.random.normal(rng, (Rn, 3)), dev)
    bg = jax.device_put(jax.random.uniform(rng, (Rn, 3)), dev)
    res = {}

    res["volrender_ms"] = bench(
        lambda a: volume_render_radiance_field(a, zv, rd, background_prior=bg),
        rf)
    res["cumprod_ms"] = bench(lambda a: cumprod_exclusive(a[..., 0]), rf)

    bins = jax.device_put(jnp.broadcast_to(jnp.linspace(1., 4., 63), (Rn, 63)), dev)
    wts = jax.device_put(jax.random.uniform(rng, (Rn, 62)), dev)
    res["sample_pdf_ms"] = bench(lambda w: sample_pdf(bins, w, 16, det=True), wts)

    zc = jax.device_put(jnp.sort(jax.random.uniform(rng, (Rn, 32)), -1), dev)
    zs = jax.device_put(jnp.sort(jax.random.uniform(rng, (Rn, 16)), -1), dev)
    res["sort48_ms"] = bench(
        lambda a: jnp.sort(jnp.concatenate([a, zs], -1), -1), zc)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
