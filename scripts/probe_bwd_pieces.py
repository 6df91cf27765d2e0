"""Decompose the stage-2 NeRF backward (attrib_g_step: 0.347 s of the
0.533 s bf16 fused-MLP no-remat dg step) into its gather/scatter pieces.

Isolated, device-resident timings at the exact training operating point:
B=2 frames x 16K rays x 80 samples = 2.62M points, planes [2][B,128,128,64],
skin volume [B,64,64,64,1] per transform (2 transforms).

Measured pieces (each grad consumed via an abs-sum so nothing is DCE'd;
per-iteration coords shift defeats cross-iteration CSE; transfer-synced):

  plane_fwd        grid_sample_2d of both planes (gather + corner einsum)
  plane_dplanes    grad wrt planes          == quad-row scatter-add
  plane_dcoords    grad wrt coords          == gather + weight-chain bwd
  skin_fwd         grid_sample_3d x 2 transforms
  skin_dvol        grad wrt volume          == packed-row scatter-add
  skin_dcoords     grad wrt coords

Measurement rules per docs/PERF.md / the verify skill: lax.scan inside one
jit, nonlinear per-iteration dependence, np.asarray sync, one process.

Usage: python scripts/probe_bwd_pieces.py [--dtype float32|bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from havatar_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d


def scan_time(fn, n=3):
    """Time fn(i) summed-abs over n iterations inside ONE jit."""

    def body(carry, i):
        return carry + fn(i), ()

    g = jax.jit(lambda: jax.lax.scan(
        body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.int32))[0])
    out = g()
    np.asarray(out)  # warm compile + honest sync
    t0 = time.perf_counter()
    out = g()
    np.asarray(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sorted", action="store_true",
                    help="sorted-scatter strategy in the custom VJP splat")
    flags = ap.parse_args()
    if flags.sorted:
        from havatar_tpu.ops import grid_sample as _gs
        _gs.SORTED_SCATTER = True
    dt = jnp.dtype(flags.dtype)

    B, R, S, C, P = 2, 128 * 128, 80, 64, 128
    N = R * S
    D = 64  # skin volume res

    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    planes = jax.random.normal(k1, (2, B, P, P, C), dtype=dt)
    coords3 = jax.random.uniform(k2, (B, N, 3), minval=-0.9, maxval=0.9)
    vol = jax.random.uniform(k3, (B, D, D, D, 1), dtype=dt)

    res = {"dtype": flags.dtype, "points": B * N}

    def plane_fwd(i):
        c = coords3 + i.astype(jnp.float32) * 1e-5
        out0 = grid_sample_2d(planes[0], c[..., (0, 1)], "zeros")
        out1 = grid_sample_2d(planes[1], c[..., (2, 1)], "zeros")
        return jnp.sum(jnp.abs(out0.astype(jnp.float32))
                       + jnp.abs(out1.astype(jnp.float32)))

    def plane_loss(pl, c):
        out0 = grid_sample_2d(pl[0], c[..., (0, 1)], "zeros")
        out1 = grid_sample_2d(pl[1], c[..., (2, 1)], "zeros")
        return jnp.sum(jnp.abs(out0.astype(jnp.float32))
                       + jnp.abs(out1.astype(jnp.float32)))

    def plane_dplanes(i):
        c = coords3 + i.astype(jnp.float32) * 1e-5
        g = jax.grad(plane_loss)(planes, c)
        return jnp.sum(jnp.abs(g.astype(jnp.float32)))

    def plane_dcoords(i):
        c = coords3 + i.astype(jnp.float32) * 1e-5
        g = jax.grad(plane_loss, argnums=1)(planes, c)
        return jnp.sum(jnp.abs(g))

    def skin_loss(v, c):
        # two transforms sample the volume at different points (identity /
        # inverse-head) — model as two offset coordinate sets
        w0 = grid_sample_3d(v[..., 0:1], c, "border")
        w1 = grid_sample_3d(v[..., 0:1], c[:, ::-1], "border")
        return jnp.sum(jnp.abs(w0.astype(jnp.float32))
                       + jnp.abs(w1.astype(jnp.float32)))

    def skin_loss_fc(v, c):
        # coords_grad=False — the actual training path (models/skinning.py):
        # backward is the splat alone, no re-gather / coords chain
        w0 = grid_sample_3d(v[..., 0:1], c, "border", coords_grad=False)
        w1 = grid_sample_3d(v[..., 0:1], c[:, ::-1], "border",
                            coords_grad=False)
        return jnp.sum(jnp.abs(w0.astype(jnp.float32))
                       + jnp.abs(w1.astype(jnp.float32)))

    def skin_dvol_fixed(i):
        c = coords3 + i.astype(jnp.float32) * 1e-5
        g = jax.grad(skin_loss_fc)(vol, c)
        return jnp.sum(jnp.abs(g.astype(jnp.float32)))

    def skin_fwd(i):
        c = coords3 + i.astype(jnp.float32) * 1e-5
        return skin_loss(vol, c)

    def skin_dvol(i):
        c = coords3 + i.astype(jnp.float32) * 1e-5
        g = jax.grad(skin_loss)(vol, c)
        return jnp.sum(jnp.abs(g.astype(jnp.float32)))

    def skin_dcoords(i):
        c = coords3 + i.astype(jnp.float32) * 1e-5
        g = jax.grad(skin_loss, argnums=1)(vol, c)
        return jnp.sum(jnp.abs(g))

    for name, fn in [("plane_fwd", plane_fwd),
                     ("plane_dplanes", plane_dplanes),
                     ("plane_dcoords", plane_dcoords),
                     ("skin_fwd", skin_fwd),
                     ("skin_dvol", skin_dvol),
                     ("skin_dvol_fixed", skin_dvol_fixed),
                     ("skin_dcoords", skin_dcoords)]:
        res[name + "_s"] = round(scan_time(fn, n=flags.n), 4)
        print(json.dumps({name: res[name + "_s"]}), flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
