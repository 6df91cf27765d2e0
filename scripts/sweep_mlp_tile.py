"""Sweep the fused-MLP kernel tile size + re-time the einsum composite."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, args, n=10):
    def run(*a):
        def one(i):
            a0 = (a[0] * (1.0 + i * 1e-9)).astype(a[0].dtype)
            return fn(a0, *a[1:])
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))
    f = jax.jit(run)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return round((time.perf_counter() - t0) / n * 1e3, 2)


def main():
    from havatar_tpu.ops import volume_render_radiance_field
    from havatar_tpu.ops.pallas_mlp import fused_mlp_chain

    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    R = 16384
    N = R * 80
    res = {}

    x = jax.device_put(jax.random.normal(rng, (N, 176), jnp.bfloat16), dev)
    params = {
        "layer0": {"kernel": jax.random.normal(rng, (176, 128)) * 0.05,
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
    params = jax.device_put(params, dev)
    for tile in (1024, 2048, 4096, 8192):
        try:
            res[f"mlp_tile{tile}_ms"] = timeit(
                lambda a, t=tile: jnp.mean(fused_mlp_chain(a, params, tile=t)),
                (x,))
        except Exception as e:
            res[f"mlp_tile{tile}_ms"] = f"fail: {type(e).__name__}"
        print(json.dumps({k: res[k] for k in list(res)[-1:]}), flush=True)

    k1, k2 = jax.random.split(rng)
    bg = jax.device_put(jnp.ones((R, 3)), dev)
    rd = jax.device_put(jnp.full((R, 3), -0.6), dev)
    for tag, S in (("composite64_ms", 64), ("composite48_ms", 48)):
        rad = jax.device_put(jax.random.normal(k1, (R, S, 68)), dev)
        z = jnp.sort(jax.random.uniform(k2, (R, S)) * 2.6 + 1.4, axis=-1)
        z = jax.device_put(z, dev)
        res[tag] = timeit(
            lambda r: jnp.mean(volume_render_radiance_field(
                r, z, rd, background_prior=bg)[0]), (rad,))
        print(json.dumps({tag: res[tag]}), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
