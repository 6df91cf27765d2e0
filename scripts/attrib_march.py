"""Attribute the ray-march cost by stubbing each gather family.

Times the REAL render_rays (bf16 + Pallas MLP, inference config) in four
variants: full, skin-gathers-stubbed, plane-gathers-stubbed, both-stubbed.
The deltas attribute the march milliseconds to (a) the two skinning volume
fetches/pt, (b) the two plane fetches/pt, (c) everything else (posenc, MLP,
composite, fine merge).
"""

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
            return fn(a[0] * (1.0 + i * 1e-9), *a[1:])
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))
    f = jax.jit(run)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from havatar_tpu.models import renderer as renderer_mod
    from havatar_tpu.models import nerf_field as field_mod
    from havatar_tpu.models import skinning as skin_mod
    from havatar_tpu.models.renderer import AvatarRenderer as AR

    B = 1
    R = 128 * 128
    renderer = AR(compute_dtype="bfloat16", use_pallas_mlp=True)
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

    real_gs3 = skin_mod.grid_sample_3d
    real_tri = field_mod.sample_from_triplane

    def fake_gs3(vol, coords, padding_mode="border"):
        # same shape/dtype result, no gather: mean of volume + tiny coord dep
        m = jnp.mean(vol, axis=(1, 2, 3))  # [B, C]
        return (m[:, None, :]
                + 1e-6 * jnp.sum(coords, -1, keepdims=True)).astype(vol.dtype)

    def fake_tri(coords, planes, padding_mode="zeros"):
        P, B = planes.shape[0], planes.shape[1]
        C = planes.shape[-1]
        m = jnp.mean(planes, axis=(2, 3))  # [P, B, C]
        base = m.transpose(1, 2, 0)[:, None]  # [B, 1, C, P]
        return (base + 1e-6 * jnp.sum(coords, -1)[..., None, None]
                ).astype(planes.dtype)

    res = {}
    args = (rays, planes, bg, inv_T, skin_vol)
    res["full_ms"] = timeit(march, args)

    skin_mod.grid_sample_3d = fake_gs3
    res["no_skin_gather_ms"] = timeit(march, args)
    skin_mod.grid_sample_3d = real_gs3

    field_mod.sample_from_triplane = fake_tri
    res["no_plane_gather_ms"] = timeit(march, args)

    skin_mod.grid_sample_3d = fake_gs3
    res["no_gather_ms"] = timeit(march, args)
    skin_mod.grid_sample_3d = real_gs3
    field_mod.sample_from_triplane = real_tri

    res["skin_gather_cost_ms"] = round(res["full_ms"] - res["no_skin_gather_ms"], 2)
    res["plane_gather_cost_ms"] = round(res["full_ms"] - res["no_plane_gather_ms"], 2)
    res["other_ms"] = round(res["no_gather_ms"], 2)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
