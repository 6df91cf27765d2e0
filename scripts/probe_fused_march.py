"""Compile + time the fused-march renderer path alone on the TPU."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from havatar_tpu.models.renderer import AvatarRenderer as AR

    B = 1
    R = 128 * 128
    renderer = AR(compute_dtype="bfloat16", use_pallas_march=True)
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
    skin_vol = jax.device_put(
        renderer.apply(nerf_vars, method=AR.skin_volume), dev)
    planes = jax.device_put(
        jax.random.normal(rng, (2, B, 128, 128, 64), jnp.bfloat16), dev)

    def march(rays, planes, bg, inv_T, vol):
        out = renderer.apply(
            nerf_vars, planes, rays, bg, inv_T,
            num_coarse=64, num_fine=16, perturb=False, fixed_volume=vol,
            method=AR.render_rays)
        return jnp.mean(out["rgb_fine"].astype(jnp.float32))

    n = 10

    def run(rays, planes, bg, inv_T, vol):
        def one(i):
            r = (rays * (1.0 + i * 1e-9)).astype(rays.dtype)
            return march(r, planes, bg, inv_T, vol)
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))

    f = jax.jit(run)
    t0 = time.perf_counter()
    out = np.asarray(f(rays, planes, bg, inv_T, skin_vol))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    np.asarray(f(rays, planes, bg, inv_T, skin_vol))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(json.dumps({"fused_march_ms": round(dt, 2)}))


if __name__ == "__main__":
    main()
