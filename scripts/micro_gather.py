"""Microbenchmarks for the ray-march bottleneck: gather formulations,
skinning volume sampling, and the field MLP, on the TPU."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=20):
    """Times n executions INSIDE one device program (lax.map over a varying
    scalar folded into arg 0) so per-dispatch tunnel latency is excluded."""
    def run(args):
        first, rest = args[0], args[1:]
        def one(i):
            return fn(first + i.astype(first.dtype) * 0, *rest)
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))
    f = jax.jit(run)
    out = f(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    N = 1_310_720  # 16384 rays x 80 samples
    C = 64
    H = W = 128
    D = 64

    plane = jax.device_put(jax.random.normal(rng, (1, H, W, C)), dev)
    coords = jax.device_put(
        jax.random.uniform(rng, (1, N, 2), minval=-1, maxval=1), dev)
    vol = jax.device_put(jax.random.normal(rng, (1, D, D, D, 1)), dev)
    coords3 = jax.device_put(
        jax.random.uniform(rng, (1, N, 3), minval=-1, maxval=1), dev)

    res = {}

    from havatar_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d

    res["grid2d_current_ms"] = bench(
        lambda p, c: grid_sample_2d(p, c, "zeros"), plane, coords)

    # variant: flat take along axis 0 (single-batch fast path)
    def grid2d_take(p, c):
        Hh, Ww = p.shape[1], p.shape[2]
        x = (c[0, :, 0] + 1) * 0.5 * (Ww - 1)
        y = (c[0, :, 1] + 1) * 0.5 * (Hh - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, Ww - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, Hh - 1)
        x1 = jnp.minimum(x0 + 1, Ww - 1)
        y1 = jnp.minimum(y0 + 1, Hh - 1)
        wx = x - x0
        wy = y - y0
        flat = p[0].reshape(Hh * Ww, -1)
        f00 = jnp.take(flat, y0 * Ww + x0, axis=0)
        f01 = jnp.take(flat, y0 * Ww + x1, axis=0)
        f10 = jnp.take(flat, y1 * Ww + x0, axis=0)
        f11 = jnp.take(flat, y1 * Ww + x1, axis=0)
        out = (f00 * ((1 - wy) * (1 - wx))[:, None] + f01 * ((1 - wy) * wx)[:, None]
               + f10 * (wy * (1 - wx))[:, None] + f11 * (wy * wx)[:, None])
        return out

    res["grid2d_take_ms"] = bench(grid2d_take, plane, coords)

    # bf16 plane
    res["grid2d_take_bf16_ms"] = bench(
        grid2d_take, plane.astype(jnp.bfloat16), coords)

    res["grid3d_current_ms"] = bench(
        lambda v, c: grid_sample_3d(v, c, "border"), vol, coords3)

    # one-hot matmul for the 64^3 x 1 volume: separable per axis?
    # exact trilinear via three chained small matmuls is not separable per
    # point; instead test: gather on flattened volume with jnp.take
    def grid3d_take(v, c):
        Dd = v.shape[1]
        pix = (c[0] + 1) * 0.5 * (Dd - 1)
        pix = jnp.clip(pix, 0, Dd - 1)
        i0 = jnp.clip(jnp.floor(pix).astype(jnp.int32), 0, Dd - 1)
        i1 = jnp.minimum(i0 + 1, Dd - 1)
        w = pix - i0
        flat = v[0].reshape(-1)
        out = 0.0
        for dz, wz in ((i0[:, 2], 1 - w[:, 2]), (i1[:, 2], w[:, 2])):
            for dy, wy in ((i0[:, 1], 1 - w[:, 1]), (i1[:, 1], w[:, 1])):
                for dx, wx in ((i0[:, 0], 1 - w[:, 0]), (i1[:, 0], w[:, 0])):
                    idx = (dz * Dd + dy) * Dd + dx
                    out = out + jnp.take(flat, idx) * (wz * wy * wx)
        return out

    res["grid3d_take_ms"] = bench(grid3d_take, vol, coords3)

    # field MLP alone (176 -> 128 -> 128 -> heads)
    x = jax.device_put(jax.random.normal(rng, (N, 176)), dev)
    w0 = jax.device_put(jax.random.normal(rng, (176, 128)), dev)
    w1 = jax.device_put(jax.random.normal(rng, (128, 128)), dev)
    w2 = jax.device_put(jax.random.normal(rng, (128, 68)), dev)

    def mlp(x, w0, w1, w2):
        h = jax.nn.relu(x @ w0)
        h = jax.nn.relu(h @ w1)
        return h @ w2

    res["mlp_f32_ms"] = bench(mlp, x, w0, w1, w2)
    res["mlp_bf16_ms"] = bench(mlp, x.astype(jnp.bfloat16),
                               w0.astype(jnp.bfloat16),
                               w1.astype(jnp.bfloat16),
                               w2.astype(jnp.bfloat16))

    # posenc
    from havatar_tpu.ops import positional_encoding

    pts = jax.device_put(jax.random.normal(rng, (1, N, 3)), dev)
    res["posenc_ms"] = bench(lambda p: positional_encoding(p, 8), pts)

    # volume render compositing
    from havatar_tpu.ops.volume_render import volume_render_radiance_field

    rf = jax.device_put(jax.random.normal(rng, (16384, 80, 68)), dev)
    zv = jax.device_put(
        jnp.broadcast_to(jnp.linspace(1.0, 4.0, 80), (16384, 80)), dev)
    rd = jax.device_put(jax.random.normal(rng, (16384, 3)), dev)
    bgp = jax.device_put(jax.random.uniform(rng, (16384, 3)), dev)
    res["volrender_ms"] = bench(
        lambda a, b, c, d: volume_render_radiance_field(
            a, b, c, background_prior=d), rf, zv, rd, bgp)

    # sample_pdf
    from havatar_tpu.ops.volume_render import sample_pdf

    bins = jax.device_put(
        jnp.broadcast_to(jnp.linspace(1.0, 4.0, 63), (16384, 63)), dev)
    wts = jax.device_put(jax.random.uniform(rng, (16384, 62)), dev)
    res["sample_pdf_ms"] = bench(
        lambda b, w: sample_pdf(b, w, 16, det=True), bins, wts)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
