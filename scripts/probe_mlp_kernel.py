"""Probe fused-MLP kernel variants to find the 20x-off-floor culprit.

V1 current (concat heads, lane slicing), V2 split-head dots (no slicing),
V3 split-head + 128-lane padded output, V4 = V3 with bf16 output,
V5 dots only (no epilogue) as the floor.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4096


def run_kernel(kernel, x, weights, out_ch, out_dtype, n=10):
    N, fin = x.shape
    n_tiles = N // TILE

    def call(xx):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((TILE, fin), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(len(weights))],
            out_specs=pl.BlockSpec((TILE, out_ch), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, out_ch), out_dtype),
        )(xx, *weights)

    def run(xx):
        def one(i):
            xi = (xx * (1.0 + i * 1e-9)).astype(xx.dtype)
            return jnp.mean(call(xi).astype(jnp.float32))
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))

    f = jax.jit(run)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    return round((time.perf_counter() - t0) / n * 1e3, 2)


def main():
    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    N = 16384 * 80
    cdt = jnp.bfloat16
    x = jax.device_put(jax.random.normal(rng, (N, 176), cdt), dev)
    ks = jax.random.split(rng, 8)
    w0 = jax.random.normal(ks[0], (176, 128), cdt) * 0.05
    b0 = jnp.zeros((1, 128), jnp.float32)
    w1 = jax.random.normal(ks[1], (128, 128), cdt) * 0.05
    b1 = jnp.zeros((1, 128), jnp.float32)
    wh = jax.random.normal(ks[2], (128, 65), cdt) * 0.05   # feat64 ++ alpha
    bh = jnp.zeros((1, 65), jnp.float32)
    wf = jax.random.normal(ks[3], (128, 64), cdt) * 0.05
    bf_ = jnp.zeros((1, 64), jnp.float32)
    wa = jax.random.normal(ks[4], (128, 1), cdt) * 0.05
    ba = jnp.zeros((1, 1), jnp.float32)
    wr = jax.random.normal(ks[5], (64, 3), cdt) * 0.05
    br = jnp.zeros((1, 3), jnp.float32)
    wrp = jax.random.normal(ks[5], (64, 128), cdt) * 0.05  # rgb padded to 128
    res = {}

    def v1(x_ref, w0r, b0r, w1r, b1r, whr, bhr, wrr, brr, out_ref):
        h = jnp.dot(x_ref[:], w0r[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b0r[:], 0.0).astype(cdt)
        h = jnp.dot(h, w1r[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1r[:], 0.0).astype(cdt)
        fa = jnp.dot(h, whr[:], preferred_element_type=jnp.float32) + bhr[:]
        feat = fa[:, :-1]
        alpha = fa[:, -1:]
        rgb = jnp.dot(feat.astype(cdt), wrr[:],
                      preferred_element_type=jnp.float32) + brr[:]
        out_ref[:] = jnp.concatenate([rgb, feat, alpha], axis=-1)

    res["v1_current_ms"] = run_kernel(
        v1, x, (w0, b0, w1, b1, wh, bh, wr, br), 68, jnp.float32)

    def v2(x_ref, w0r, b0r, w1r, b1r, wfr, bfr, war, bar, wrr, brr, out_ref):
        h = jnp.dot(x_ref[:], w0r[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b0r[:], 0.0).astype(cdt)
        h = jnp.dot(h, w1r[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1r[:], 0.0).astype(cdt)
        feat = jnp.dot(h, wfr[:], preferred_element_type=jnp.float32) + bfr[:]
        alpha = jnp.dot(h, war[:], preferred_element_type=jnp.float32) + bar[:]
        rgb = jnp.dot(feat.astype(cdt), wrr[:],
                      preferred_element_type=jnp.float32) + brr[:]
        out_ref[:] = jnp.concatenate([rgb, feat, alpha], axis=-1)

    res["v2_splithead_ms"] = run_kernel(
        v2, x, (w0, b0, w1, b1, wf, bf_, wa, ba, wr, br), 68, jnp.float32)

    def v3(x_ref, w0r, b0r, w1r, b1r, wfr, bfr, war, bar, wrr, brr, out_ref):
        h = jnp.dot(x_ref[:], w0r[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b0r[:], 0.0).astype(cdt)
        h = jnp.dot(h, w1r[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1r[:], 0.0).astype(cdt)
        feat = jnp.dot(h, wfr[:], preferred_element_type=jnp.float32) + bfr[:]
        alpha = jnp.dot(h, war[:], preferred_element_type=jnp.float32) + bar[:]
        # rgb projected into a 128-wide padded layout: lanes 0:3 rgb,
        # 3:67 feat, 67 alpha — assembled by matmul + masked adds, no
        # cross-lane relayout
        rgb_p = jnp.dot(feat.astype(cdt), wrr[:],
                        preferred_element_type=jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out = rgb_p + jnp.where((lane >= 3) & (lane < 67),
                                jnp.pad(feat, ((0, 0), (3, 61)))
                                if False else 0.0, 0.0)
        out_ref[:] = out + brr[:]

    # NOTE: v3's layout math is a placeholder for timing the dots+write only
    res["v3_padded_ms"] = run_kernel(
        v3, x, (w0, b0, w1, b1, wf, bf_, wa, ba, wrp,
                jnp.zeros((1, 128), jnp.float32)), 128, jnp.float32)

    def v5(x_ref, w0r, b0r, w1r, b1r, wfr, bfr, out_ref):
        h = jnp.dot(x_ref[:], w0r[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b0r[:], 0.0).astype(cdt)
        h = jnp.dot(h, w1r[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1r[:], 0.0).astype(cdt)
        out_ref[:] = jnp.dot(h, wfr[:], preferred_element_type=jnp.float32) + bfr[:]

    res["v5_dots_only_64out_ms"] = run_kernel(
        v5, x, (w0, b0, w1, b1, wf, bf_), 64, jnp.float32)

    res["v6_dots_only_bf16out_ms"] = run_kernel(
        lambda xr, w0r, b0r, w1r, b1r, wfr, bfr, o: o.__setitem__(
            slice(None),
            (jnp.dot(jnp.maximum(jnp.dot(jnp.maximum(
                jnp.dot(xr[:], w0r[:], preferred_element_type=jnp.float32)
                + b0r[:], 0.0).astype(cdt), w1r[:],
                preferred_element_type=jnp.float32) + b1r[:], 0.0).astype(cdt),
                wfr[:], preferred_element_type=jnp.float32) + bfr[:]
             ).astype(cdt)),
        x, (w0, b0, w1, b1, wf, bf_), 64, cdt)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
