"""Quad-consuming fused field MLP for TRAINING (fwd + bwd Pallas kernels).

The inference march kernels (ops/pallas_march.py) showed that consuming RAW
quad gather rows and corner-reducing in VMEM removes the [N, 4C] corner
einsum's HBM round-trip plus the [N, 176] MLP-input materialization. This
module brings the same input contract to the TRAINING path (the stage-2
G step — the reference's hot loop, train_avatarHD.py:244-280), where the
existing ``ops/pallas_mlp.py`` kernels still eat those round-trips in both
directions:

  XLA path per iter (bf16, N = 2.62M):   quad rows -> corner einsum
  (read 2.7 GB, write 0.7) -> concat posenc (write+read 1.34 GB padded)
  -> MLP kernel; backward mirrors it plus a re-gather.

  this path:  quad rows -> kernel (corner-reduce + 5-dot chain in VMEM);
  backward kernel recomputes everything from the re-gathered quads and
  emits d(quad rows) + d(aux) + weight grads directly.

``field_radiance_quad`` spans gather -> corner reduce -> MLP per batch item
under ONE custom_vjp so the backward controls the whole memory system:
  * the quad rows are RE-GATHERED in the backward (inputs-only residuals,
    same rationale as ops/grid_sample.py);
  * the plane splat runs through ``_splat_rows`` — f32 accumulation
    (bf16 scatter lowers ~2x slower) with the sorted-scatter strategy knob;
  * d(coords) flows through jax.vjp of the corner-weight chain (exact,
    incl. the border clip), d(posenc) is handed back to XLA's trig chain.

Spec of the math: the reference field MLP (model/nerf_model.py:101-117)
over (plane feats ++ posenc) with plane channels interleaved c*P+p
(model/nerf_model.py:99). Grad math is oracle-tested against XLA autodiff
of the plain path (tests/test_pallas_mlp_quad.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from havatar_tpu.ops.grid_sample import (
    _idx_2d,
    _quad_pack_2d,
    _splat_rows,
    _w4_2d,
)
from havatar_tpu.ops.pallas_mlp import _dot_nt, _dot_tn


def _perm_list(C: int, n_pe: int):
    """layer0 input rows: reference interleaved order (c*2+p) -> kernel
    block order [xy (C), zy (C), posenc] (same as pallas_march._perm_w0)."""
    return ([2 * c for c in range(C)] + [2 * c + 1 for c in range(C)]
            + list(range(2 * C, 2 * C + n_pe)))


def _prep_weights(params: Dict, cdt, C: int, n_pe: int):
    w0 = params["layer0"]["kernel"]
    w0p = w0[jnp.asarray(_perm_list(C, n_pe))].astype(cdt)
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
    return w0p, b0, w1, b1, wh, bh, wr, br


def _build_x(q, aux, C: int, n_pe: int, cdt):
    """Corner-reduce [T, 8C] quad rows against the w4 lanes of aux
    [T, n_pe+8] and assemble the block-order MLP input [T, 2C+n_pe]."""
    xy = sum(q[:, k * C:(k + 1) * C].astype(jnp.float32)
             * aux[:, n_pe + k:n_pe + k + 1] for k in range(4))
    zy = sum(q[:, (4 + k) * C:(5 + k) * C].astype(jnp.float32)
             * aux[:, n_pe + 4 + k:n_pe + 5 + k] for k in range(4))
    return jnp.concatenate([xy, zy, aux[:, :n_pe]], axis=1).astype(cdt)


def _fwd_kernel(C, n_pe, q_ref, aux_ref, w0, b0, w1, b1, wh, bh, wr, br,
                out_ref):
    cdt = q_ref.dtype
    x = _build_x(q_ref[:], aux_ref[:], C, n_pe, cdt)
    h = jnp.dot(x, w0[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0[:], 0.0).astype(cdt)
    h = jnp.dot(h, w1[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1[:], 0.0).astype(cdt)
    fa = jnp.dot(h, wh[:], preferred_element_type=jnp.float32) + bh[:]
    feat = fa[:, :-1]
    alpha = fa[:, -1:]
    rgb = (jnp.dot(feat.astype(cdt), wr[:],
                   preferred_element_type=jnp.float32) + br[:])
    out_ref[:] = jnp.concatenate([rgb, feat, alpha], axis=-1)


def _bwd_kernel(C, n_pe, q_ref, aux_ref, g_ref, w0, b0, w1, b1, wh, bh, wr,
                br, dq_ref, daux_ref, dw0_ref, db0_ref, dw1_ref, db1_ref,
                dwh_ref, dbh_ref, dwr_ref, dbr_ref):
    """Recompute the forward from (quads, aux) in VMEM, then the transposed
    chain; emit d(quads) [T, 8C] f32 + d(aux) [T, n_pe+8] f32 and VMEM-
    accumulated weight grads (sequential grid — same pattern as
    pallas_mlp._mlp_bwd_kernel)."""
    cdt = q_ref.dtype
    q = q_ref[:]
    aux = aux_ref[:]
    g = g_ref[:].astype(jnp.float32)
    cf = wr.shape[0]

    # --- recompute forward
    x = _build_x(q, aux, C, n_pe, cdt)
    a0 = jnp.dot(x, w0[:], preferred_element_type=jnp.float32) + b0[:]
    h0 = jnp.maximum(a0, 0.0).astype(cdt)
    a1 = jnp.dot(h0, w1[:], preferred_element_type=jnp.float32) + b1[:]
    h1 = jnp.maximum(a1, 0.0).astype(cdt)
    fa = jnp.dot(h1, wh[:], preferred_element_type=jnp.float32) + bh[:]
    feat = fa[:, :-1].astype(cdt)

    # --- transposed dense chain (output layout [rgb (3), feat (cf), alpha])
    g_rgb = g[:, :3]
    g_feat = g[:, 3:3 + cf]
    g_sig = g[:, 3 + cf:]
    dfeat = g_feat + _dot_nt(g_rgb, wr[:].astype(jnp.float32))
    dfa = jnp.concatenate([dfeat, g_sig], axis=1)
    dh1 = _dot_nt(dfa.astype(cdt), wh[:])
    da1 = jnp.where(a1 > 0.0, dh1, 0.0)
    dh0 = _dot_nt(da1.astype(cdt), w1[:])
    da0 = jnp.where(a0 > 0.0, dh0, 0.0)
    dx = _dot_nt(da0.astype(cdt), w0[:])                      # [T, 2C+n_pe]

    # --- corner-reduce adjoint, all in VMEM
    dxy = dx[:, :C]
    dzy = dx[:, C:2 * C]
    dpe = dx[:, 2 * C:]
    parts = [dxy * aux[:, n_pe + k:n_pe + k + 1] for k in range(4)]
    parts += [dzy * aux[:, n_pe + 4 + k:n_pe + 5 + k] for k in range(4)]
    dq_ref[:] = jnp.concatenate(parts, axis=1)                # [T, 8C] f32
    # dw4[t, k] = sum_c q[t, kC+c] * dplane[t, c]: one MXU pass against a
    # block-indicator matrix (8 separate [T, C] lane reductions otherwise)
    dplane8 = jnp.concatenate([dxy] * 4 + [dzy] * 4, axis=1)  # [T, 8C]
    e = q.astype(jnp.float32) * dplane8
    sel = (jax.lax.broadcasted_iota(jnp.int32, (8 * C, 8), 0) // C
           == jax.lax.broadcasted_iota(jnp.int32, (8 * C, 8), 1))
    dw4 = jnp.dot(e, sel.astype(jnp.float32),
                  preferred_element_type=jnp.float32)         # [T, 8]
    daux_ref[:] = jnp.concatenate([dpe, dw4], axis=1)

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


def _pad_rows(a, pad):
    if not pad:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)


def _run_fwd(quads, aux, weights, C, n_pe, out_ch, interpret, tile):
    N = quads.shape[0]
    pad = (-N) % tile
    quads, aux = _pad_rows(quads, pad), _pad_rows(aux, pad)
    n_tiles = (N + pad) // tile
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C, n_pe),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 8 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_pe + 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
        out_specs=pl.BlockSpec((tile, out_ch), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, out_ch), jnp.float32),
        interpret=interpret,
    )(quads, aux, *weights)
    return out[:N]


def _run_bwd(quads, aux, g, weights, C, n_pe, fin, hid, cf, out_rgb,
             interpret, tile):
    N = quads.shape[0]
    out_ch = out_rgb + cf + 1
    pad = (-N) % tile
    quads, aux = _pad_rows(quads, pad), _pad_rows(aux, pad)
    g = _pad_rows(g.astype(jnp.float32), pad)  # zero cotangent on pad rows
    n_tiles = (N + pad) // tile

    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((N + pad, 8 * C), jnp.float32),
        jax.ShapeDtypeStruct((N + pad, n_pe + 8), jnp.float32),
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
        pl.BlockSpec((tile, 8 * C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, n_pe + 8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        acc((fin, hid)), acc((1, hid)), acc((hid, hid)), acc((1, hid)),
        acc((hid, cf + 1)), acc((1, cf + 1)), acc((cf, out_rgb)),
        acc((1, out_rgb)),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, C, n_pe),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 8 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n_pe + 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, out_ch), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(quads, aux, g, *weights)
    dq, daux = outs[0][:N], outs[1][:N]
    dw0p, db0, dw1, db1, dwh, dbh, dwr, dbr = outs[2:]
    return dq, daux, (dw0p, db0, dw1, db1, dwh, dbh, dwr, dbr)


def _gather_quads(plane_xy, plane_zy, warped, padding_mode):
    H, W, _ = plane_xy.shape
    c_xy = warped[:, (0, 1)]
    c_zy = warped[:, (2, 1)]
    idx_xy = _idx_2d(c_xy, H, W, padding_mode)
    idx_zy = _idx_2d(c_zy, H, W, padding_mode)
    rows_xy = jnp.take(_quad_pack_2d(plane_xy), idx_xy, axis=0)
    rows_zy = jnp.take(_quad_pack_2d(plane_zy), idx_zy, axis=0)
    return jnp.concatenate([rows_xy, rows_zy], axis=-1), idx_xy, idx_zy


def _w8(warped, H, W, padding_mode):
    return jnp.concatenate([
        _w4_2d(warped[:, (0, 1)], H, W, padding_mode),
        _w4_2d(warped[:, (2, 1)], H, W, padding_mode),
    ], axis=-1).astype(jnp.float32)


def _tile_for(dtype, tile: Optional[int], bwd: bool = False) -> int:
    if tile is not None:
        return tile
    # The bwd kernel holds ~2.5x the fwd's per-row state (dq f32 rows +
    # recomputed activations + weight-grad accumulators): at tile 1024/bf16
    # the v5e compiler measures 19.03 MB scoped VMEM against the 16 MB
    # limit (stack OOM at compile). Halve the auto tile in the backward;
    # the kernel is bandwidth-bound, so the extra grid steps are free.
    if bwd:
        return 512 if jnp.dtype(dtype).itemsize <= 2 else 256
    return 1024 if jnp.dtype(dtype).itemsize <= 2 else 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _frq_vjp(padding_mode: str, interpret: bool,
             tile: Optional[int], plane_xy: jnp.ndarray,
             plane_zy: jnp.ndarray, warped: jnp.ndarray,
             pe: jnp.ndarray, params: Dict) -> jnp.ndarray:
    H, W, C = plane_xy.shape
    n_pe = pe.shape[1]
    t = _tile_for(plane_xy.dtype, tile)
    quads, _, _ = _gather_quads(plane_xy, plane_zy, warped, padding_mode)
    aux = jnp.concatenate([pe, _w8(warped, H, W, padding_mode)], axis=-1)
    weights = _prep_weights(params, plane_xy.dtype, C, n_pe)
    out_ch = params["fc_rgb"]["kernel"].shape[1] + \
        params["fc_rgbFeat"]["kernel"].shape[1] + 1
    return _run_fwd(quads, aux, weights, C, n_pe, out_ch, interpret, t)


def _frq_fwd(padding_mode, interpret, tile, plane_xy, plane_zy, warped, pe,
             params):
    out = _frq_vjp(padding_mode, interpret, tile, plane_xy,
                   plane_zy, warped, pe, params)
    return out, (plane_xy, plane_zy, warped, pe, params)


_BWD_CHUNK_ROWS = 1 << 18
"""Row-chunk size for the backward. At the reference stage-2 operating
point the un-chunked backward holds three full-N f32 [1M, 8C] temps at
once (fwd-gathered quads + re-gathered quads + the dq kernel output,
~2 GB each at C=64) — the compile-measured peak was 16.29 GB against the
chip's 15.75 GB HBM (round-4 queue, rc=1). Scanning the backward in
256k-row chunks caps those temps at ~512 MB each; the splat and weight
grads accumulate in f32 across chunks ([(H-1)(W-1), 4C] ~ 16 MB at
plane_res 128). The kernel is bandwidth-bound, so the extra grid
launches are noise; only f32 summation ORDER changes (chunk-major)."""


def _frq_bwd(padding_mode, interpret, tile, res, g):
    plane_xy, plane_zy, warped, pe, params = res
    H, W, C = plane_xy.shape
    n_pe = pe.shape[1]
    t = _tile_for(plane_xy.dtype, tile, bwd=True)

    weights = _prep_weights(params, plane_xy.dtype, C, n_pe)
    hid = params["layer0"]["kernel"].shape[1]
    cf = params["fc_rgbFeat"]["kernel"].shape[1]
    out_rgb = params["fc_rgb"]["kernel"].shape[1]
    N = warped.shape[0]

    def piece_bwd(w_c, pe_c, g_c):
        """Backward for one row chunk: re-gather, fused bwd kernel, splat.
        Returns (dpacked_xy, dpacked_zy, dws, dwarped_c, dpe_c)."""
        quads, idx_xy, idx_zy = _gather_quads(plane_xy, plane_zy, w_c,
                                              padding_mode)
        w8, pull = jax.vjp(lambda c: _w8(c, H, W, padding_mode), w_c)
        aux = jnp.concatenate([pe_c, w8], axis=-1)
        dq, daux, dws = _run_bwd(quads, aux, g_c, weights, C, n_pe,
                                 2 * C + n_pe, hid, cf, out_rgb, interpret, t)
        dpe_c = daux[:, :n_pe].astype(pe.dtype)
        dwarped_c = pull(daux[:, n_pe:])[0].astype(warped.dtype)
        dpk_xy = _splat_rows(dq[:, :4 * C], idx_xy, (H - 1) * (W - 1))
        dpk_zy = _splat_rows(dq[:, 4 * C:], idx_zy, (H - 1) * (W - 1))
        return dpk_xy, dpk_zy, dws, dwarped_c, dpe_c

    ch = _BWD_CHUNK_ROWS
    if N <= ch:
        dpacked_xy, dpacked_zy, dws, dwarped, dpe = piece_bwd(warped, pe, g)
    else:
        k = -(-N // ch)
        pad = k * ch - N          # zero cotangent on pad rows -> zero grads
        xs = (_pad_rows(warped, pad).reshape(k, ch, -1),
              _pad_rows(pe, pad).reshape(k, ch, -1),
              _pad_rows(g.astype(jnp.float32), pad).reshape(k, ch, -1))

        def body(carry, x):
            acc_xy, acc_zy, acc_ws = carry
            dpk_xy, dpk_zy, dws_c, dwarped_c, dpe_c = piece_bwd(*x)
            acc_ws = tuple(a + b for a, b in zip(acc_ws, dws_c))
            return ((acc_xy + dpk_xy, acc_zy + dpk_zy, acc_ws),
                    (dwarped_c, dpe_c))

        pk = ((H - 1) * (W - 1), 4 * C)
        fin = 2 * C + n_pe
        zeros_ws = tuple(jnp.zeros(s, jnp.float32) for s in (
            (fin, hid), (1, hid), (hid, hid), (1, hid),
            (hid, cf + 1), (1, cf + 1), (cf, out_rgb), (1, out_rgb)))
        init = (jnp.zeros(pk, jnp.float32), jnp.zeros(pk, jnp.float32),
                zeros_ws)
        (dpacked_xy, dpacked_zy, dws), (dw_k, dpe_k) = jax.lax.scan(
            body, init, xs)
        dwarped = dw_k.reshape(k * ch, -1)[:N]
        dpe = dpe_k.reshape(k * ch, -1)[:N]

    def unpack(dpacked, dtype):
        q = dpacked.reshape(H - 1, W - 1, 4, C)
        d = jnp.zeros((H, W, C), jnp.float32)
        d = d.at[:-1, :-1].add(q[:, :, 0])
        d = d.at[:-1, 1:].add(q[:, :, 1])
        d = d.at[1:, :-1].add(q[:, :, 2])
        d = d.at[1:, 1:].add(q[:, :, 3])
        return d.astype(dtype)

    dplane_xy = unpack(dpacked_xy, plane_xy.dtype)
    dplane_zy = unpack(dpacked_zy, plane_zy.dtype)

    # weight grads: un-permute layer0 rows (block order -> reference
    # interleaved), split the concatenated head
    dw0p, db0, dw1, db1, dwh, dbh, dwr, dbr = dws
    perm = _perm_list(C, n_pe)
    inv = np.argsort(np.asarray(perm))
    dw0 = dw0p[jnp.asarray(inv)]
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
    return dplane_xy, dplane_zy, dwarped, dpe, dparams


_frq_vjp.defvjp(_frq_fwd, _frq_bwd)


def field_radiance_quad(padding_mode: str, interpret: Optional[bool],
                        tile: Optional[int], plane_xy: jnp.ndarray,
                        plane_zy: jnp.ndarray, warped: jnp.ndarray,
                        pe: jnp.ndarray, params: Dict) -> jnp.ndarray:
    """One batch item: [H, W, C] x2 planes, [N, 3] box-warped coords,
    [N, n_pe] f32 posenc -> [N, rgb+feat+1] f32 radiance.

    Forward = quad gather (XLA) + fused corner-reduce+MLP kernel. The
    custom backward re-gathers, runs the fused bwd kernel, and splats
    d(planes) in f32 (see module docstring). ``interpret=None``
    auto-selects interpreter mode on CPU (Mosaic needs a real TPU),
    matching ops/pallas_march.py — so renderer paths built with
    use_pallas_mlp_quad run unchanged in CPU tests and the multichip
    dryrun."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _frq_vjp(padding_mode, bool(interpret), tile, plane_xy, plane_zy,
                    warped, pe, params)
