"""Isolate the hierarchical fine pass cost: march with num_fine=0 vs 16.

The coarse-pass bisect (bisect_march.py) accounts for ~45 ms bf16 but the
full march measures ~60-75 ms — this pins down where the fine pass spends
time (16 new field evals/ray + pdf + merge + second composite).
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


def main():
    from havatar_tpu.models import AvatarRenderer
    from havatar_tpu.models.renderer import AvatarRenderer as AR

    use_pallas = "--no-pallas" not in sys.argv
    B = 1
    renderer = AvatarRenderer(compute_dtype="bfloat16",
                              use_pallas_mlp=use_pallas)
    R = 128 * 128
    rays = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0),
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), -1.0),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    bg = jnp.ones((B, R, 3))
    latent = jnp.zeros((B, 32))
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    conds = [jnp.full((B, 256, 256, 7), 0.5)] * 3

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        nerf_vars = renderer.init(rng, rays[:, :64], bg[:, :64], latent,
                                  inv_T, *conds, num_coarse=4, num_fine=2,
                                  perturb=False)
    dev = jax.devices()[0]
    nerf_vars, rays, bg, latent, inv_T = jax.device_put(
        (nerf_vars, rays, bg, latent, inv_T), dev)
    conds = jax.device_put(conds, dev)

    planes = renderer.apply(nerf_vars, latent, inv_T.reshape(B, -1), *conds,
                            method=lambda m, *a: m.field.generate_planes(*a))
    planes = jax.block_until_ready(planes)

    N = 10
    res = {}
    for nf in (0, 16):
        def march_fn(v, planes, rays, bg, inv_T):
            def one(i):
                out = renderer.apply(
                    v, planes + i * 1e-6, rays, bg, inv_T,
                    num_coarse=64, num_fine=nf, perturb=False,
                    method=AR.render_rays)
                rgb = out["rgb_fine"] if out["rgb_fine"] is not None else out["rgb_coarse"]
                return jnp.mean(rgb.astype(jnp.float32))
            return jax.lax.map(one, jnp.arange(N, dtype=jnp.float32))

        f = jax.jit(march_fn)
        args = (nerf_vars, planes, rays, bg, inv_T)
        np.asarray(f(*args))
        t0 = time.perf_counter()
        np.asarray(f(*args))
        res[f"march_fine{nf}_ms"] = round(
            (time.perf_counter() - t0) / N * 1e3, 2)

    res["fine_pass_ms"] = round(
        res["march_fine16_ms"] - res["march_fine0_ms"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
