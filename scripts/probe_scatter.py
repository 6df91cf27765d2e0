"""What is the TPU scatter-add (the adjoint splat of the plane gather)
actually bound by?

Context: probe_bwd_pieces.py puts the stage-2 NeRF backward's biggest
piece at the plane-grad scatter (~145 ms of 347 ms) — the adjoint of
``jnp.take(packed_quads, idx)`` is a scatter-add of [N, 4C] update rows
into the [16129, 4C] quad table (havatar_tpu/ops/grid_sample.py). This
probe isolates that scatter at the exact training shape (N = 1.31M
updates per plane per batch item, 256 f32 lanes) and sweeps the axes a
faster exact formulation could exploit:

  base          .at[idx].add(upd), random idx (the production pattern)
  narrow64      updates 64 lanes (256 B) — bytes-bound vs issue-bound?
  sorted_flag   PRE-sorted idx + indices_are_sorted=True (upper bound)
  sorted_noflag PRE-sorted idx, flag off (is it the flag or the order?)
  sorted_pipe   honest pipeline: sort keys + permute-gather upd + scatter
  bf16          bf16 updates (recorded 2x slower in commit 7903d71)
  collide_all   every update hits ONE row (collision serialization test)
  pad_m         table padded to 16384 rows (alignment effect)

Measurement rules (docs/PERF.md / memory): lax.scan in one jit,
per-iteration index shift to defeat CSE, np.asarray sync, one process.
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

M = 127 * 127          # quad-table rows (128^2 plane)
N = 128 * 128 * 80     # updates per plane per batch item
C4 = 256               # 4 corners x 64 ch


def scan_time(fn, n=3):
    def body(carry, i):
        return carry + fn(i), ()

    g = jax.jit(lambda: jax.lax.scan(
        body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.int32))[0])
    np.asarray(g())  # compile + honest sync
    t0 = time.perf_counter()
    np.asarray(g())
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    flags = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    idx = jax.random.randint(k1, (N,), 0, M, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    upd = jax.random.normal(k2, (N, C4), dtype=jnp.float32)
    upd_bf16 = upd.astype(jnp.bfloat16)

    # production-shaped COHERENT indices: 128² rays x 80 samples marching
    # through a 127x127 cell grid (neighboring rays/samples hit nearby
    # cells — the real splat's locality, which the random case understates)
    R, S = 128 * 128, 80
    u = (jnp.arange(R) % 128).astype(jnp.float32) / 128.0
    v = (jnp.arange(R) // 128).astype(jnp.float32) / 128.0
    t = jnp.arange(S, dtype=jnp.float32) / S
    x = u[:, None] * 0.7 + 0.15 + 0.12 * t[None, :]
    y = v[:, None] * 0.7 + 0.15 + 0.08 * t[None, :]
    x = x + jax.random.uniform(k3, (R, S)) * 0.01
    x0 = jnp.clip((x * 126).astype(jnp.int32), 0, 125)
    y0 = jnp.clip((y * 126).astype(jnp.int32), 0, 125)
    idx_coh = (y0 * 127 + x0).reshape(-1)          # ray-major [R*S]

    res = {"n_updates": N, "table_rows": M, "lanes": C4}

    def consume(t):
        return jnp.sum(jnp.abs(t[:8]))

    def base(i):
        ix = (idx + i) % M
        t = jnp.zeros((M, C4), jnp.float32).at[ix].add(upd)
        return consume(t)

    def narrow64(i):
        ix = (idx + i) % M
        t = jnp.zeros((M, 64), jnp.float32).at[ix].add(upd[:, :64])
        return consume(t)

    def sorted_flag(i):
        # shift preserves sortedness except at the wrap; clip instead
        ix = jnp.minimum(idx_sorted + i, M - 1)
        t = jnp.zeros((M, C4), jnp.float32).at[ix].add(
            upd, indices_are_sorted=True)
        return consume(t)

    def sorted_noflag(i):
        ix = jnp.minimum(idx_sorted + i, M - 1)
        t = jnp.zeros((M, C4), jnp.float32).at[ix].add(upd)
        return consume(t)

    def sorted_pipe(i):
        ix = (idx + i) % M
        sk, perm = jax.lax.sort_key_val(ix, jnp.arange(N, dtype=jnp.int32))
        su = jnp.take(upd, perm, axis=0)
        t = jnp.zeros((M, C4), jnp.float32).at[sk].add(
            su, indices_are_sorted=True)
        return consume(t)

    def bf16(i):
        ix = (idx + i) % M
        t = jnp.zeros((M, C4), jnp.bfloat16).at[ix].add(upd_bf16)
        return consume(t.astype(jnp.float32))

    def collide_all(i):
        ix = jnp.full((N,), 0, jnp.int32) + (i % M)
        t = jnp.zeros((M, C4), jnp.float32).at[ix].add(upd)
        return consume(t)

    def pad_m(i):
        ix = (idx + i) % M
        t = jnp.zeros((16384, C4), jnp.float32).at[ix].add(upd)
        return consume(t)

    def coh_base(i):
        ix = (idx_coh + i) % M
        t = jnp.zeros((M, C4), jnp.float32).at[ix].add(upd)
        return consume(t)

    def coh_smajor(i):
        # static sample-major reorder: consecutive updates = consecutive
        # RAYS at the same depth (stronger cell locality, no sort needed)
        ix = ((idx_coh + i) % M).reshape(R, S).T.reshape(-1)
        up = upd.reshape(R, S, C4).transpose(1, 0, 2).reshape(-1, C4)
        t = jnp.zeros((M, C4), jnp.float32).at[ix].add(up)
        return consume(t)

    def coh_sorted_pipe(i):
        ix = (idx_coh + i) % M
        sk, perm = jax.lax.sort_key_val(ix, jnp.arange(N, dtype=jnp.int32))
        su = jnp.take(upd, perm, axis=0)
        t = jnp.zeros((M, C4), jnp.float32).at[sk].add(
            su, indices_are_sorted=True)
        return consume(t)

    for name, fn in [("base", base), ("narrow64", narrow64),
                     ("sorted_flag", sorted_flag),
                     ("sorted_noflag", sorted_noflag),
                     ("sorted_pipe", sorted_pipe),
                     ("bf16", bf16),
                     ("collide_all", collide_all),
                     ("pad_m", pad_m),
                     ("coh_base", coh_base),
                     ("coh_smajor", coh_smajor),
                     ("coh_sorted_pipe", coh_sorted_pipe)]:
        res[name + "_s"] = round(scan_time(fn, n=flags.n), 4)
        print(json.dumps({name: res[name + "_s"]}), flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
