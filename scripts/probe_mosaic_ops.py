"""Which rank-3 constructs does this Mosaic version support? Tiny kernels,
one construct each, compiled on the real TPU."""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_one(name, kernel, out_shape, *args):
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK")
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def main():
    TR, S, C = 8, 16, 64
    x = jnp.ones((TR, S, C), jnp.float32)

    def k_strided(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, ::2]

    try_one("strided_slice_axis1", k_strided,
            jax.ShapeDtypeStruct((TR, S // 2, C), jnp.float32), x)

    def k_lax_slice(x_ref, o_ref):
        o_ref[:] = jax.lax.slice(x_ref[:], (0, 0, 0), (TR, S, C), (1, 2, 1))

    try_one("lax_strided_slice", k_lax_slice,
            jax.ShapeDtypeStruct((TR, S // 2, C), jnp.float32), x)

    def k_reshape4(x_ref, o_ref):
        r4 = x_ref[:].reshape(TR, S // 2, 2, C)
        o_ref[:] = r4[:, :, 0, :]

    try_one("reshape4_slice", k_reshape4,
            jax.ShapeDtypeStruct((TR, S // 2, C), jnp.float32), x)

    def k_swap(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:][:, :, :1].reshape(TR, 1, S), 1, 2)

    xs = jnp.ones((TR, S, 1), jnp.float32)

    def k_swap2(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

    try_one("swapaxes_12_S1", k_swap2,
            jax.ShapeDtypeStruct((TR, 1, S), jnp.float32), xs)

    xl = jnp.ones((TR, 1, S), jnp.float32)

    def k_swap3(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

    try_one("swapaxes_12_1S", k_swap3,
            jax.ShapeDtypeStruct((TR, S, 1), jnp.float32), xl)

    def k_merge(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(TR * S, C) * 2.0

    try_one("merge_leading", k_merge,
            jax.ShapeDtypeStruct((TR * S, C), jnp.float32), x)

    x2 = jnp.ones((TR * S, C), jnp.float32)

    def k_split(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(TR, S, C) * 2.0

    try_one("split_leading", k_split,
            jax.ShapeDtypeStruct((TR, S, C), jnp.float32), x2)

    def k_cumshift(x_ref, o_ref):
        c = x_ref[:]
        sh = jnp.concatenate([jnp.ones_like(c[:, :1]), c[:, :S - 1]], axis=1)
        o_ref[:] = c * sh

    try_one("shift_concat_axis1", k_cumshift,
            jax.ShapeDtypeStruct((TR, S, C), jnp.float32), x)

    def k_reduce1(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:], axis=1)

    try_one("reduce_axis1", k_reduce1,
            jax.ShapeDtypeStruct((TR, C), jnp.float32), x)

    m1 = jnp.ones((TR, S, 1), jnp.float32)
    m2 = jnp.ones((TR, 1, S), jnp.float32)

    def k_bcast_cmp(a_ref, b_ref, o_ref):
        mask = a_ref[:] < b_ref[:]
        o_ref[:] = jnp.sum(jnp.where(mask, a_ref[:], 1.0), axis=1,
                           keepdims=True)

    try:
        out = pl.pallas_call(
            k_bcast_cmp,
            out_shape=jax.ShapeDtypeStruct((TR, 1, S), jnp.float32))(m1, m2)
        jax.block_until_ready(out)
        print("bcast_cmp_mask: OK")
    except Exception as e:
        print(f"bcast_cmp_mask: FAIL {type(e).__name__}: "
              + str(e).split(chr(10))[0][:120])


if __name__ == "__main__":
    main()
