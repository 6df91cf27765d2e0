"""Bisect the ray-march cost: cumulative stage timings at real sizes."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from havatar_tpu.ops import (
    positional_encoding,
    sample_from_triplane,
    grid_sample_3d,
    volume_render_radiance_field,
    sample_pdf,
)


def bench(fn, *args, n=10):
    """Non-hoistable: the body perturbs arg0 by i*1e-9 (not foldable)."""
    def run(*a):
        def one(i):
            return fn(a[0] * (1.0 + i * 1e-9), *a[1:])
        return jax.lax.map(one, jnp.arange(n, dtype=a[0].dtype))
    f = jax.jit(run)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    Rn, S = 16384, 64
    N = Rn * S
    planes = jax.device_put(jax.random.normal(rng, (2, 1, 128, 128, 64)), dev)
    vol = jax.device_put(jax.random.uniform(rng, (1, 64, 64, 64, 2)), dev)
    ro = jnp.zeros((1, Rn, 3)).at[..., 2].set(3.0)
    rd = jnp.zeros((1, Rn, 3)).at[..., 2].set(-1.0)
    near, far = 1.4, 4.0
    w0 = jax.random.normal(rng, (176, 128)) * 0.05
    w1 = jax.random.normal(rng, (128, 128)) * 0.05
    w2 = jax.random.normal(rng, (128, 68)) * 0.05
    inv_R = jnp.eye(3)[None]
    inv_t = jnp.zeros((1, 1, 3))
    bg = jnp.ones((Rn, 3))
    ws = jax.device_put((w0, w1, w2), dev)
    w0, w1, w2 = ws

    t = jnp.linspace(0.0, 1.0, S)
    z_vals = near * (1 - t) + far * t
    z_vals = jnp.broadcast_to(z_vals, (1, Rn, S))

    def stage_pts(ro):
        pts = ro[..., None, :] + rd[..., None, :] * z_vals[..., :, None]
        return pts.reshape(1, -1, 3)

    def mlp(feat):
        h = jax.nn.relu(feat @ w0.astype(feat.dtype))
        h = jax.nn.relu(h @ w1.astype(feat.dtype))
        return h @ w2.astype(feat.dtype)

    res = {}

    # 1) posenc + MLP only (constant plane feats)
    def s1(ro):
        pts = stage_pts(ro)
        emb = positional_encoding(pts, 8)
        feat = jnp.concatenate(
            [jnp.zeros(pts.shape[:-1] + (128,), pts.dtype), emb], -1)
        return mlp(feat)

    res["posenc_mlp_ms"] = bench(s1, ro)

    # 2) + triplane sampling
    def s2(ro):
        pts = stage_pts(ro)
        pf = sample_from_triplane(pts * 0.5, planes).reshape(1, N, -1)
        emb = positional_encoding(pts, 8)
        return mlp(jnp.concatenate([pf, emb], -1))

    res["plus_triplane_ms"] = bench(s2, ro)

    # 3) + skinning (two transforms, two trilinear samples, blend)
    def s3(ro):
        pts = stage_pts(ro)
        w_a = grid_sample_3d(vol[..., 0:1], pts * 0.4, "border")
        w_b = grid_sample_3d(vol[..., 1:2], pts * 0.4 + 0.01, "border")
        w = jnp.concatenate([w_a, w_b], -1)
        w = w / (w.sum(-1, keepdims=True) + 1e-8)
        pts = w[..., 0:1] * pts + w[..., 1:2] * (pts + 0.01)
        pf = sample_from_triplane(pts * 0.5, planes).reshape(1, N, -1)
        emb = positional_encoding(pts, 8)
        return mlp(jnp.concatenate([pf, emb], -1))

    res["plus_skinning_ms"] = bench(s3, ro)

    # 4) compositing + pdf + sort alone
    def s4(rad):
        rad_r = rad.reshape(Rn, S, -1)
        rgb, disp, acc, w, d = volume_render_radiance_field(
            rad_r, z_vals[0], rd[0], background_prior=bg)
        zm = 0.5 * (z_vals[0, :, 1:] + z_vals[0, :, :-1])
        zs = sample_pdf(zm, w[:, 1:-1], 16, det=True)
        z_all = jnp.sort(jnp.concatenate([z_vals[0, :, ::2], zs], -1), -1)
        return rgb, z_all

    rad = jax.device_put(jax.random.normal(rng, (N, 68)), dev)
    res["composite_pdf_sort_ms"] = bench(s4, rad)

    # variants: bf16 triplane sampling
    def s2b(ro):
        pts = stage_pts(ro)
        pf = sample_from_triplane(pts.astype(jnp.bfloat16) * 0.5,
                                  planes.astype(jnp.bfloat16)).reshape(1, N, -1)
        emb = positional_encoding(pts, 8).astype(jnp.bfloat16)
        return mlp(jnp.concatenate([pf, emb], -1))

    res["plus_triplane_bf16_ms"] = bench(s2b, ro)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
