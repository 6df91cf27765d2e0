"""Standalone timings of the non-gather march pieces at real sizes:
positional encoding, the fused Pallas MLP, volume rendering (coarse+fine
sized), sample_pdf + the deterministic fine merge/reorder einsums."""

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
    return round((time.perf_counter() - t0) / n * 1e3, 2)


def main():
    from havatar_tpu.ops import (positional_encoding, sample_pdf,
                                 volume_render_radiance_field)
    from havatar_tpu.ops.pallas_mlp import fused_mlp_chain

    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    R, Sc, Sf = 16384, 64, 48
    N = R * (Sc + 16)
    res = {}

    # posenc (8 freqs, no identity) on all march points
    pts = jax.device_put(jax.random.normal(rng, (1, N, 3)), dev)
    res["posenc_ms"] = timeit(
        lambda p: jnp.mean(positional_encoding(p, 8, include_input=False)),
        (pts,))

    # fused Pallas MLP on all march points
    x = jax.device_put(
        jax.random.normal(rng, (N, 176), jnp.bfloat16), dev)
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
    res["pallas_mlp_ms"] = timeit(
        lambda a: jnp.mean(fused_mlp_chain(a, params)), (x,))

    # volume render, coarse [R, 64] + fine [R, 48+16... use 48] shapes
    k1, k2, k3 = jax.random.split(rng, 3)
    bg = jnp.ones((R, 3))
    rd = jnp.full((R, 3), -0.6)
    for tag, S in (("composite_coarse_ms", Sc), ("composite_fine_ms", 64)):
        rad = jax.device_put(jax.random.normal(k1, (R, S, 68)), dev)
        z = jnp.sort(jax.random.uniform(k2, (R, S)) * 2.6 + 1.4, axis=-1)
        z, bg_, rd_ = jax.device_put((z, bg, rd), dev)
        res[tag] = timeit(
            lambda r: jnp.mean(volume_render_radiance_field(
                r, z, rd_, background_prior=bg_)[0]), (rad,))

    # sample_pdf (det) + the comparison-count merge + one-hot reorder
    zf = jax.device_put(
        jnp.broadcast_to(jnp.linspace(1.4, 4.0, Sc), (R, Sc)).copy(), dev)
    w = jax.device_put(jax.random.uniform(k3, (R, Sc - 2)) + 0.01, dev)
    rad_cat = jax.device_put(jax.random.normal(k1, (R, 48, 68)), dev)

    def merge(zf, w, rad_cat):
        z_mid = 0.5 * (zf[..., 1:] + zf[..., :-1])
        z_samples = sample_pdf(z_mid, w, 16, det=True)
        a, b = zf[:, ::2], z_samples
        nA = a.shape[-1]
        pos_a = (jnp.arange(nA)
                 + jnp.sum(b[:, None, :] < a[:, :, None], axis=-1))
        pos_b = (jnp.arange(b.shape[-1])
                 + jnp.sum(a[:, :, None] <= b[:, None, :], axis=1))
        ranks = jnp.concatenate([pos_a, pos_b], axis=-1)
        S_all = 48
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S_all), 2)
        onehot = (ranks[:, :, None] == iota_s).astype(rad_cat.dtype)
        z_cat = jnp.concatenate([a, b], axis=-1)
        z_all = jnp.einsum("rks,rk->rs", onehot, z_cat)
        radiance_f = jnp.einsum("rks,rkc->rsc", onehot, rad_cat)
        return jnp.mean(radiance_f) + jnp.mean(z_all)

    res["pdf_merge_reorder_ms"] = timeit(merge, (zf, w, rad_cat))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
