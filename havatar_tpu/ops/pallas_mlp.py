"""Pallas TPU kernel: the NeRF field's dense chain, fused end to end.

Spec of the unfused math: the MLP tail of
``ConditionalTriplaneNeRFModel_multiRender_split_view.forward``
(reference model/nerf_model.py:101-117): two 128-wide relu layers over the
(plane-features ++ posenc) input, then the alpha / 64-d feature / rgb heads,
output ``cat(rgb, feat, alpha)``.

Why a kernel: XLA runs this as 5 separate HLO dots whose [N, 128]
activations round-trip through HBM — measured ~8 ms bf16 for 1.05M points
(~6% MXU utilization; it is activation-bandwidth bound). Here each N-tile
stays in VMEM across the whole chain: the only HBM traffic is the [N, 176]
input read and the [N, 68] output write. The positional encoding is NOT
computed in the kernel (round-1's attempt put the trig on a [T, 3] block —
lane-starved, 82 ms; see ops/pallas_field.py) — XLA computes it fused with
the gather epilogue and hands the kernel a pre-concatenated input.

Training support (round 3): ``fused_mlp_chain`` carries a ``jax.custom_vjp``
whose backward is itself one fused kernel — it re-computes the two hidden
activations from x in VMEM (remat-style: cheaper than writing them to HBM in
the forward) and produces dx plus all weight/bias grads, accumulated across
ray tiles in a VMEM-resident output block (TPU grid steps are sequential).
The same VMEM-residency argument that motivated the forward kernel applies
to the backward: the XLA backward round-trips every [N, 128] activation and
cotangent through HBM. Used by the stage-2 G step (the reference's hot
training loop, train_avatarHD.py:244-280) via ``models.use_pallas_mlp``.

bf16 matmul inputs, f32 accumulation — identical dtype contract to the
compute_dtype="bfloat16" XLA path (f32 in → f32 dots, used for training).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048


def _mlp_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, wh_ref, bh_ref,
                wr_ref, br_ref, out_ref):
    """One [TILE, Fin] block through the dense chain.

    wh/bh = concatenated (fc_rgbFeat ++ fc_alpha) weights [128, 65] so the
    two sibling heads share one MXU pass; rgb = feat @ wr + br.
    Output layout: [rgb (R), feat (64), alpha (1)].
    """
    cdt = x_ref.dtype
    h = jnp.dot(x_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0_ref[:], 0.0).astype(cdt)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0).astype(cdt)

    fa = jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[:]
    feat = fa[:, :-1]
    alpha = fa[:, -1:]
    rgb = (jnp.dot(feat.astype(cdt), wr_ref[:],
                   preferred_element_type=jnp.float32) + br_ref[:])
    out_ref[:] = jnp.concatenate([rgb, feat, alpha], axis=-1)


def _fused_mlp_fwd_impl(x: jnp.ndarray, params: dict,
                        interpret: bool = False,
                        tile: int = TILE) -> jnp.ndarray:
    """[N, Fin] (plane feats ++ posenc) -> [N, rgb+feat+1] f32 radiance.

    ``params``: the field's Dense params (flax naming: layer0, layer1,
    fc_alpha, fc_rgbFeat, fc_rgb with kernel/bias leaves).
    """
    N, fin = x.shape
    cdt = x.dtype

    w0 = params["layer0"]["kernel"].astype(cdt)
    b0 = params["layer0"]["bias"].astype(jnp.float32)[None, :]
    w1 = params["layer1"]["kernel"].astype(cdt)
    b1 = params["layer1"]["bias"].astype(jnp.float32)[None, :]
    wh = jnp.concatenate([params["fc_rgbFeat"]["kernel"],
                          params["fc_alpha"]["kernel"]], axis=1).astype(cdt)
    bh = jnp.concatenate([params["fc_rgbFeat"]["bias"],
                          params["fc_alpha"]["bias"]])
    bh = bh.astype(jnp.float32)[None, :]
    wr = params["fc_rgb"]["kernel"].astype(cdt)
    br = params["fc_rgb"]["bias"].astype(jnp.float32)[None, :]

    out_rgb = wr.shape[1]
    out_feat = params["fc_rgbFeat"]["kernel"].shape[1]
    out_ch = out_rgb + out_feat + 1

    pad = (-N) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, fin), x.dtype)], 0)
    n_tiles = (N + pad) // tile

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, fin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
        out_specs=pl.BlockSpec((tile, out_ch), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, out_ch), jnp.float32),
        interpret=interpret,
    )(x, w0, b0, w1, b1, wh, bh, wr, br)
    return out[:N]


def _dot_tn(a, b):
    """a [P, M], b [P, N] -> a^T b [M, N] without materializing a transpose
    (contract over rows; lowers to one MXU pass)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a [P, N], b [M, N] -> a b^T [P, M]."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mlp_bwd_kernel(x_ref, g_ref, w0_ref, b0_ref, w1_ref, b1_ref, wh_ref,
                    bh_ref, wr_ref, br_ref, dx_ref, dw0_ref, db0_ref,
                    dw1_ref, db1_ref, dwh_ref, dbh_ref, dwr_ref, dbr_ref):
    """Backward of the dense chain for one row tile. Recomputes h0/h1/feat
    from x in VMEM (remat), then runs the transposed chain. Weight/bias
    grads accumulate in VMEM across the (sequential) grid steps: their
    BlockSpecs map every step to block 0."""
    cdt = x_ref.dtype
    x = x_ref[:]
    g = g_ref[:].astype(jnp.float32)
    cf = wr_ref.shape[0]

    # --- recompute forward (same ops as _mlp_kernel)
    a0 = jnp.dot(x, w0_ref[:], preferred_element_type=jnp.float32) + b0_ref[:]
    h0 = jnp.maximum(a0, 0.0).astype(cdt)
    a1 = jnp.dot(h0, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = jnp.maximum(a1, 0.0).astype(cdt)
    fa = jnp.dot(h1, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[:]
    feat = fa[:, :-1].astype(cdt)

    # --- transposed chain (output layout [rgb (3), feat (cf), alpha (1)])
    g_rgb = g[:, :3]
    g_feat = g[:, 3:3 + cf]
    g_sig = g[:, 3 + cf:]
    dfeat = g_feat + _dot_nt(g_rgb, wr_ref[:].astype(jnp.float32))
    dfa = jnp.concatenate([dfeat, g_sig], axis=1)            # [P, cf+1]
    dh1 = _dot_nt(dfa.astype(cdt), wh_ref[:])
    da1 = jnp.where(a1 > 0.0, dh1, 0.0)
    dh0 = _dot_nt(da1.astype(cdt), w1_ref[:])
    da0 = jnp.where(a0 > 0.0, dh0, 0.0)
    dx_ref[:] = _dot_nt(da0.astype(cdt), w0_ref[:]).astype(x_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for ref in (dw0_ref, db0_ref, dw1_ref, db1_ref, dwh_ref, dbh_ref,
                    dwr_ref, dbr_ref):
            ref[:] = jnp.zeros_like(ref)

    da0c, da1c, dfac = (v.astype(cdt) for v in (da0, da1, dfa))
    dw0_ref[:] += _dot_tn(x, da0c)
    db0_ref[:] += jnp.sum(da0, axis=0, keepdims=True)
    dw1_ref[:] += _dot_tn(h0, da1c)
    db1_ref[:] += jnp.sum(da1, axis=0, keepdims=True)
    dwh_ref[:] += _dot_tn(h1, dfac)
    dbh_ref[:] += jnp.sum(dfa, axis=0, keepdims=True)
    dwr_ref[:] += _dot_tn(feat, g_rgb.astype(cdt))
    dbr_ref[:] += jnp.sum(g_rgb, axis=0, keepdims=True)


def _fused_mlp_bwd_impl(x, g, params, interpret=False, tile=TILE):
    """Returns (dx, dparams) for the chain at input x with output cotangent
    g [N, rgb+feat+1]."""
    N, fin = x.shape
    cdt = x.dtype
    if jnp.dtype(cdt).itemsize >= 4:
        # f32 training path: the bf16-sized tile holds x + g + recomputed
        # activations + weight-grad accumulators at 2x the bytes and
        # overflows the 16 MB scoped VMEM (measured 21.1 MB on hardware)
        tile = min(tile, 1024)
    hid = params["layer0"]["kernel"].shape[1]
    cf = params["fc_rgbFeat"]["kernel"].shape[1]
    out_rgb = params["fc_rgb"]["kernel"].shape[1]
    out_ch = out_rgb + cf + 1

    w0 = params["layer0"]["kernel"].astype(cdt)
    b0 = params["layer0"]["bias"].astype(jnp.float32)[None, :]
    w1 = params["layer1"]["kernel"].astype(cdt)
    b1 = params["layer1"]["bias"].astype(jnp.float32)[None, :]
    wh = jnp.concatenate([params["fc_rgbFeat"]["kernel"],
                          params["fc_alpha"]["kernel"]], axis=1).astype(cdt)
    bh = jnp.concatenate([params["fc_rgbFeat"]["bias"],
                          params["fc_alpha"]["bias"]])
    bh = bh.astype(jnp.float32)[None, :]
    wr = params["fc_rgb"]["kernel"].astype(cdt)
    br = params["fc_rgb"]["bias"].astype(jnp.float32)[None, :]

    pad = (-N) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, fin), x.dtype)], 0)
        # zero cotangent on pad rows -> zero contribution to every grad
        g = jnp.concatenate([g, jnp.zeros((pad, out_ch), g.dtype)], 0)
    n_tiles = (N + pad) // tile

    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((N + pad, fin), x.dtype),
        jax.ShapeDtypeStruct((fin, hid), jnp.float32),
        jax.ShapeDtypeStruct((1, hid), jnp.float32),
        jax.ShapeDtypeStruct((hid, hid), jnp.float32),
        jax.ShapeDtypeStruct((1, hid), jnp.float32),
        jax.ShapeDtypeStruct((hid, cf + 1), jnp.float32),
        jax.ShapeDtypeStruct((1, cf + 1), jnp.float32),
        jax.ShapeDtypeStruct((cf, out_rgb), jnp.float32),
        jax.ShapeDtypeStruct((1, out_rgb), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((tile, fin), lambda i: (i, 0), memory_space=pltpu.VMEM),
        acc((fin, hid)), acc((1, hid)), acc((hid, hid)), acc((1, hid)),
        acc((hid, cf + 1)), acc((1, cf + 1)), acc((cf, out_rgb)),
        acc((1, out_rgb)),
    )
    outs = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, fin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, out_ch), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, g.astype(jnp.float32), w0, b0, w1, b1, wh, bh, wr, br)
    dx, dw0, db0, dw1, db1, dwh, dbh, dwr, dbr = outs

    pdt = params["layer0"]["kernel"].dtype
    dparams = {
        "layer0": {"kernel": dw0.astype(pdt), "bias": db0[0].astype(pdt)},
        "layer1": {"kernel": dw1.astype(pdt), "bias": db1[0].astype(pdt)},
        "fc_rgbFeat": {"kernel": dwh[:, :cf].astype(pdt),
                       "bias": dbh[0, :cf].astype(pdt)},
        "fc_alpha": {"kernel": dwh[:, cf:].astype(pdt),
                     "bias": dbh[0, cf:].astype(pdt)},
        "fc_rgb": {"kernel": dwr.astype(pdt), "bias": dbr[0].astype(pdt)},
    }
    return dx[:N], dparams


# jax 0.9 requires custom_vjp nondiff_argnums to be LEADING arguments (the
# primal is re-invoked with them prepended) — hence the internal arg order.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_mlp_chain_vjp(interpret, tile, x, params):
    return _fused_mlp_fwd_impl(x, params, interpret, tile)


def _fused_mlp_chain_fwd(interpret, tile, x, params):
    return _fused_mlp_fwd_impl(x, params, interpret, tile), (x, params)


def _fused_mlp_chain_bwd(interpret, tile, res, g):
    x, params = res
    return _fused_mlp_bwd_impl(x, g, params, interpret, tile)


_fused_mlp_chain_vjp.defvjp(_fused_mlp_chain_fwd, _fused_mlp_chain_bwd)


def fused_mlp_chain(x: jnp.ndarray, params: dict,
                    interpret: Optional[bool] = None,
                    tile: int = TILE) -> jnp.ndarray:
    """Differentiable fused dense chain: forward and backward are each ONE
    Pallas kernel (see module docstring). Same signature/semantics as the
    round-2 inference-only version. ``interpret=None`` auto-selects
    interpreter mode on CPU (Mosaic needs a real TPU), matching
    ops/pallas_march.py — so renderer paths built with use_pallas_mlp run
    unchanged in CPU tests and the multichip dryrun."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_mlp_chain_vjp(interpret, tile, x, params)
