"""Per-component timing of the flagship inference pipeline on the TPU.

Times (a) the two condition-plane generators, (b) the ray march (skinning +
triplane sampling + field MLP + volume rendering, coarse+fine), and (c) the
StyleUNet super-resolution, each as its own jitted program, batched over
N iterations inside one device program so tunnel latency is excluded.
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


def timeit(fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0)


def main():
    import argparse

    from havatar_tpu.models import AvatarRenderer, StyleUNetSR
    from havatar_tpu.models.renderer import AvatarRenderer as AR

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="compute dtype (flagship inference uses bfloat16)")
    ap.add_argument("--no-pallas-mlp", action="store_true",
                    help="disable the fused Pallas field MLP")
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--fine", type=int, default=16)
    ap.add_argument("--gated", action="store_true",
                    help="tighten per-ray near/far to the head AABB "
                         "(the bench default pairs this with --coarse 16)")
    flags = ap.parse_args()

    B = 1
    renderer = AvatarRenderer(compute_dtype=flags.dtype,
                              use_pallas_mlp=not flags.no_pallas_mlp,
                              use_pallas_march=not flags.no_pallas_mlp)
    sr = StyleUNetSR(compute_dtype=flags.dtype)

    # the bench camera (diverging portrait rays — __graft_entry__) so gather
    # coherence matches the headline measurement, not a degenerate ray set
    from havatar_tpu.ops import get_rays_np

    rs = 128
    R = rs * rs
    c2w = np.array([[1.0, 0.0, 0.0, 0.0],
                    [0.0, -1.0, 0.0, -0.1],
                    [0.0, 0.0, -1.0, 3.0]], dtype=np.float32)
    ro_np, rd_np = get_rays_np(rs, rs, (1.2 * rs, 1.2 * rs, 0.5, 0.5), c2w)
    rays = jnp.concatenate([
        jnp.asarray(ro_np.reshape(1, R, 3)),
        jnp.asarray(rd_np.reshape(1, R, 3)),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    bg = jnp.ones((B, R, 3))
    latent = jnp.zeros((B, 32))
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    conds = [jnp.full((B, 256, 256, 7), 0.5)] * 3
    style = jnp.zeros((B, 64))

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        nerf_vars = renderer.init(rng, rays[:, :64], bg[:, :64], latent,
                                  inv_T, *conds, num_coarse=4, num_fine=2,
                                  perturb=False)
        sr_vars = sr.init(rng, style, jnp.zeros((B, 128, 128, 64)))
    dev = jax.devices()[0]
    nerf_vars, sr_vars, rays, bg, latent, inv_T, style = jax.device_put(
        (nerf_vars, sr_vars, rays, bg, latent, inv_T, style), dev)
    conds = jax.device_put(conds, dev)

    N = 20

    # (a) plane generation
    def planes_fn(v, latent, inv_T, f, l, r):
        def one(i):
            return renderer.apply(
                v, latent, inv_T.reshape(B, -1), f + i * 0.001, l, r,
                method=lambda m, *a: m.field.generate_planes(*a))
        return jax.lax.map(one, jnp.arange(N, dtype=jnp.float32))

    t_planes = timeit(jax.jit(planes_fn),
                      (nerf_vars, latent, inv_T, *conds)) / N

    planes = renderer.apply(nerf_vars, latent, inv_T.reshape(B, -1), *conds,
                            method=lambda m, *a: m.field.generate_planes(*a))
    planes = jax.block_until_ready(planes)

    # (b) ray march given planes
    if flags.gated:
        from havatar_tpu.ops import tighten_ray_near_far

        rays = tighten_ray_near_far(rays, renderer.gate_aabb, inv_T)

    def march_fn(v, planes, rays, bg, inv_T):
        def one(i):
            out = renderer.apply(
                v, planes + i * 1e-6, rays, bg, inv_T,
                num_coarse=flags.coarse, num_fine=flags.fine, perturb=False,
                method=AR.render_rays)
            return out["rgb_fine"]
        return jax.lax.map(one, jnp.arange(N, dtype=jnp.float32))

    t_march = timeit(jax.jit(march_fn),
                     (nerf_vars, planes, rays, bg, inv_T)) / N

    feat = jnp.zeros((B, 128, 128, 64))

    # (c) super-resolution
    def sr_fn(v, style, feat):
        def one(i):
            return sr.apply(v, [style], feat + i * 1e-6)
        return jax.lax.map(one, jnp.arange(N, dtype=jnp.float32))

    t_sr = timeit(jax.jit(sr_fn), (sr_vars, style, feat)) / N

    total = t_planes + t_march + t_sr
    print(json.dumps({
        "plane_gen_ms": round(t_planes * 1e3, 2),
        "ray_march_ms": round(t_march * 1e3, 2),
        "super_res_ms": round(t_sr * 1e3, 2),
        "total_ms": round(total * 1e3, 2),
        "implied_fps": round(1.0 / total, 2),
    }))


if __name__ == "__main__":
    main()
