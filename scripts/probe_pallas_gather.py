"""Probe: Mosaic tpu.dynamic_gather throughput for the ray-march hot path.

JAX 0.9.0's Pallas TPU lowers lax.gather ONLY in the take_along_axis form
with indices.shape == operand.shape (2D), along dim 0 or dim 1
(jax/_src/pallas/mosaic/lowering.py:2464-2524). For our plane table
[16384, 64] that means point tiles of exactly 16384 indices, broadcast
across the 64 lanes.

Measures:
  A. pallas dynamic_gather along dim 0, tile == table rows (16384)
  B. XLA jnp.take baseline on identical shapes
Both timed inside one device program with per-iteration varying indices
(hoist-proof: idx depends on the loop var).

Result recorded in docs/PERF.md.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 16384, 64        # plane table: 128x128 spatial, 64 channels
N = 1_310_720           # 16K rays x 80 samples


def bench(fn, idx, *args, n=20):
    """fn(idx, *args); indices perturbed per iteration (mod R) so the body
    cannot be hoisted out of the timing loop."""

    def run(args):
        idx, rest = args[0], args[1:]

        def one(i):
            return fn((idx + i) % R, *rest)

        return jax.lax.map(one, jnp.arange(n, dtype=jnp.int32))

    f = jax.jit(run)
    out = f((idx,) + args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f((idx,) + args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def _dyn_gather_kernel(table_ref, idx_ref, out_ref):
    idx_b = jnp.broadcast_to(idx_ref[:], (R, C))
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_b, axis=0)


def pallas_gather(idx, table):
    return pl.pallas_call(
        _dyn_gather_kernel,
        grid=(N // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), table.dtype),
    )(table, idx)


def main():
    rng = jax.random.PRNGKey(0)
    table = jax.random.normal(rng, (R, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N, 1), 0, R, jnp.int32)

    res = {}
    res["xla_take_ms"] = bench(
        lambda i, t: jnp.take(t, i[:, 0], axis=0), idx, table)

    try:
        small = idx[:R]
        got = pallas_gather(small, table)[:R]
        want = jnp.take(table, small[:, 0], axis=0)
        res["pallas_dyn_gather_ok"] = bool(jnp.all(got == want))
        if res["pallas_dyn_gather_ok"]:
            res["pallas_dyn_gather_ms"] = bench(pallas_gather, idx, table)
    except Exception as e:  # noqa: BLE001
        res["pallas_dyn_gather_err"] = repr(e)[:500]

    for k, v in res.items():
        print(k, "=", v)


if __name__ == "__main__":
    main()
