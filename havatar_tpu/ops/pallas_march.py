"""Pallas TPU kernels: NeRF field MLP + alpha compositing, fused per ray tile.

Spec of the unfused math: the field tail (reference model/nerf_model.py:101-117)
followed by ``volume_render_radiance_field`` (utils/nerf_util.py:28-73) and, for
the hierarchical pass, the depth-merged re-evaluation (model/nerf_trainer.py:
165-193). The fused form exists because this chip is HBM-bandwidth bound
(~150 GB/s read / ~220 GB/s r+w measured — scripts/probe_hbm_bw.py): the
unfused chain writes the [N, 68] radiance tensor to HBM and reads it back for
compositing; in TPU tiled layouts (8, 128) that round-trip moves ~1.3 GB
padded. Here radiance never leaves VMEM.

IO-layout rule that shaped this file: HBM arrays are tiled (8, 128) over the
two minor dims, so ANY array whose minor dim is small (e.g. [..., S, 1]
dists/weights) is padded 1 -> 128 and moves 128x its logical bytes. All kernel
inputs/outputs are therefore 2D with a >=64-lane minor dim ([R, S] dists and
weights, one packed [R*S/2, 69] keep tensor), and per-sample column vectors
are built IN KERNEL via lane->sublane transposes of [TR, 1, S] views (tiny,
VMEM-local).

Exactness notes (inference path only; training and parity tests keep the XLA
path):
* the transmittance cumprod is computed by log2(S) shift-multiplies — a
  different association order than jnp.cumprod, same values to f32 roundoff;
* the fine pass composites in CONCAT order using rank comparisons (weight of
  sample i multiplies the product of (1-alpha) over samples ranked before it)
  — algebraically identical to sorting first, so no in-kernel permutation is
  needed; the per-ray sums over samples are order-independent;
* the coarse radiance reused by the fine pass is stored bf16 (rgb/feat), a
  second rounding of values already produced by bf16 matmuls; sigma is kept
  to f32 accuracy as a bf16 (hi, lo) pair in the same packed tensor.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sized for the 16 MB v5e VMEM (a 64-ray coarse tile overflowed scoped vmem)
TILE_RAYS_COARSE = 32
TILE_RAYS_FINE = 32
# the quad-consuming coarse kernel reads [TR, S, 8C] raw rows (4x the
# pre-reduced input): a 32-ray tile hit 21.2 MB scoped vmem on hardware
TILE_RAYS_COARSE_QUAD = 16


def _field_params(params: Dict, cdt) -> Tuple:
    """Flax field params -> flat weight tuple (bf16 matmul inputs, f32 bias)."""
    def w(name):
        return params[name]["kernel"].astype(cdt)

    def b(name):
        return params[name]["bias"].astype(jnp.float32)[None, :]

    return (w("layer0"), b("layer0"), w("layer1"), b("layer1"),
            w("fc_rgbFeat"), b("fc_rgbFeat"), w("fc_alpha"), b("fc_alpha"),
            w("fc_rgb"), b("fc_rgb"))


def _mlp(x2, w0, b0, w1, b1, wf, bf_, wa, ba, wr, br):
    """[P, Fin] -> (rgb [P, 3] f32, feat [P, 64] f32, sigma [P, 1] f32).

    Split-head formulation (separate feat/alpha dots) so no lane slicing of a
    65-wide head is needed.
    """
    cdt = x2.dtype
    h = jnp.dot(x2, w0, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0, 0.0).astype(cdt)
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1, 0.0).astype(cdt)
    feat = jnp.dot(h, wf, preferred_element_type=jnp.float32) + bf_
    sigma = jnp.dot(h, wa, preferred_element_type=jnp.float32) + ba
    rgb = jnp.dot(feat.astype(cdt), wr,
                  preferred_element_type=jnp.float32) + br
    return rgb, feat, sigma


def _to_col(v2, TR, S):
    """[TR, S] (S on lanes) -> [TR, S, 1] (S on sublanes)."""
    return jnp.swapaxes(v2.reshape(TR, 1, S), 1, 2)


def _from_col(v3, TR, S):
    """[TR, S, 1] -> [TR, S] (S on lanes)."""
    return jnp.swapaxes(v3, 1, 2).reshape(TR, S)


def _split_hi_lo(x):
    """f32 -> (bf16 hi, bf16 lo) with hi + lo ~= x to f32 accuracy."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _cumprod_exclusive_lanes(om2):
    """Exclusive cumprod of [TR, S] along the LANE axis by shift-multiplies
    (2D lane concats are the Mosaic-safe shift; rank-3 concats with 1-lane
    operands hit "offset mismatch on non-concat dimension")."""
    S = om2.shape[1]
    c = jnp.concatenate([jnp.ones_like(om2[:, :1]), om2[:, :S - 1]], axis=1)
    k = 1
    while k < S:
        c = c * jnp.concatenate(
            [jnp.ones_like(c[:, :k]), c[:, :S - k]], axis=1)
        k *= 2
    return c


def _build_x_quad(q2, aux2, C, n_pe, cdt):
    """Corner-reduce raw quad rows in VMEM and assemble the MLP input.

    q2: [T, 8C] (XY quad row ++ ZY quad row, corner-major: k*C..(k+1)*C is
    corner k's channels). aux2: [T, n_pe+8] f32 (posenc ++ w4_xy ++ w4_zy).
    Returns [T, 2C+n_pe] in BLOCK order [xy, zy, posenc] — pair with the
    permuted layer0 weights (``_perm_w0``). The reduction is 8 lane-slice
    multiply-adds in f32 — the same math as grid_sample_2d's corner einsum,
    relocated from an HBM round-trip into VMEM.
    """
    xy = sum(q2[:, k * C:(k + 1) * C].astype(jnp.float32)
             * aux2[:, n_pe + k:n_pe + k + 1] for k in range(4))
    zy = sum(q2[:, (4 + k) * C:(5 + k) * C].astype(jnp.float32)
             * aux2[:, n_pe + 4 + k:n_pe + 5 + k] for k in range(4))
    return jnp.concatenate(
        [xy, zy, aux2[:, :n_pe]], axis=1).astype(cdt)


def _perm_w0(w0, C, n_pe):
    """Permute layer0's input rows from the reference's interleaved plane
    channels (index c*2+p, model/nerf_model.py:99) to the kernel's block
    order [xy (C), zy (C), posenc]."""
    perm = ([2 * c for c in range(C)] + [2 * c + 1 for c in range(C)]
            + list(range(2 * C, 2 * C + n_pe)))
    return w0[jnp.asarray(perm)]


def _coarse_kernel(x_ref, d_ref, w0, b0, w1, b1, wf, bf_, wa, ba, wr, br,
                   rgbmap_ref, w_ref, keep_ref):
    TR, S, fin = x_ref.shape
    x2 = x_ref[:].reshape(TR * S, fin)
    _coarse_body(x2, TR, S, d_ref, w0, b0, w1, b1, wf, bf_, wa, ba, wr, br,
                 rgbmap_ref, w_ref, keep_ref)


def _coarse_kernel_quad(C, n_pe, q_ref, aux_ref, d_ref, w0, b0, w1, b1, wf,
                        bf_, wa, ba, wr, br, rgbmap_ref, w_ref, keep_ref):
    TR, S, _ = q_ref.shape
    q2 = q_ref[:].reshape(TR * S, 8 * C)
    aux2 = aux_ref[:].reshape(TR * S, n_pe + 8)
    x2 = _build_x_quad(q2, aux2, C, n_pe, q_ref.dtype)
    _coarse_body(x2, TR, S, d_ref, w0, b0, w1, b1, wf, bf_, wa, ba, wr, br,
                 rgbmap_ref, w_ref, keep_ref)


def _coarse_body(x2, TR, S, d_ref, w0, b0, w1, b1, wf, bf_, wa, ba, wr, br,
                 rgbmap_ref, w_ref, keep_ref):
    rgb, feat, sigma = _mlp(x2, w0[:], b0[:], w1[:], b1[:], wf[:], bf_[:],
                            wa[:], ba[:], wr[:], br[:])
    cf = feat.shape[-1]
    rgb3 = rgb.reshape(TR, S, 3)
    feat3 = feat.reshape(TR, S, cf)
    sig2 = _from_col(sigma.reshape(TR, S, 1), TR, S)  # [TR, S], S on lanes

    # compositing runs 2D (S on lanes): the scan shifts are lane concats
    alpha2 = 1.0 - jnp.exp(-jnp.maximum(sig2, 0.0) * d_ref[:])
    w2 = alpha2 * _cumprod_exclusive_lanes(1.0 - alpha2 + 1e-10)
    w_ref[:] = w2
    w = _to_col(w2, TR, S)                            # [TR, S, 1]

    rgb_map = jnp.sum(w * jax.nn.sigmoid(rgb3), axis=1)    # [TR, 3]
    feat_map = jnp.sum(w * feat3, axis=1)                  # [TR, cf]
    rgbmap_ref[:] = jnp.concatenate([rgb_map, feat_map], axis=-1)

    # half-rate keeps, packed [feat | rgb | sigma_hi | sigma_lo] so ONE
    # 69-lane bf16 tensor carries them (separate [..., 3]/[..., 1] outputs
    # would lane-pad to 128 and move up to 128x their bytes). [:, ::2] is a
    # strided sublane slice (Mosaic rejects it) -> pair-reshape, element 0.
    def keep(v):
        # -> 2D [TR*S/2, C]: lane-concats of rank-3 operands hit a Mosaic
        # "offset mismatch" limitation; 2D lane concat is supported
        c = v.shape[-1]
        return v.reshape(TR, S // 2, 2, c)[:, :, 0, :].reshape(
            TR * (S // 2), c)

    sig_k = keep(sigma.reshape(TR, S, 1))             # [TR*S/2, 1]
    s_hi, s_lo = _split_hi_lo(sig_k)
    keep_ref[:] = jnp.concatenate(
        [keep(feat3).astype(jnp.bfloat16), keep(rgb3).astype(jnp.bfloat16),
         s_hi, s_lo], axis=-1)                        # [TR*S/2, cf+5]


def fused_march_coarse(x: jnp.ndarray, dists: jnp.ndarray, params: Dict,
                       interpret: bool = None):
    """x: [R, S, Fin] (bf16), dists: [R, S] f32 (pre-scaled by ||rd||).

    Returns (rgb_map [R, 3+cf] f32 — no background composite,
             weights [R, S] f32,
             keeps [R * S//2, cf+5] bf16 packed [feat|rgb|sig_hi|sig_lo] —
             feed to fused_march_fine).
    """
    if interpret is None:   # Mosaic needs a real TPU; CPU runs interpreted
        interpret = jax.default_backend() == "cpu"
    R, S, fin = x.shape
    TR = min(TILE_RAYS_COARSE, R)
    assert R % TR == 0, (R, TR)
    ws = _field_params(params, x.dtype)
    cf = params["fc_rgbFeat"]["kernel"].shape[1]
    S2 = S // 2

    out_shapes = (
        jax.ShapeDtypeStruct((R, 3 + cf), jnp.float32),
        jax.ShapeDtypeStruct((R, S), jnp.float32),
        jax.ShapeDtypeStruct((R * S2, cf + 5), jnp.bfloat16),
    )
    out_specs = (
        pl.BlockSpec((TR, 3 + cf), lambda i: (i, 0)),
        pl.BlockSpec((TR, S), lambda i: (i, 0)),
        pl.BlockSpec((TR * S2, cf + 5), lambda i: (i, 0)),
    )
    rgbmap, w, keeps = pl.pallas_call(
        _coarse_kernel,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, S, fin), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, S), lambda i: (i, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, dists, *ws)
    return rgbmap, w, keeps


def fused_march_coarse_quad(quads: jnp.ndarray, aux: jnp.ndarray,
                            dists: jnp.ndarray, params: Dict,
                            interpret: bool = None):
    """Quad-consuming coarse march: the kernel reads RAW gathered quad rows
    and does the bilinear corner reduction in VMEM (docs/PERF.md round-3:
    removes the corner-einsum + MLP-input HBM round-trips; the gather itself
    stays in XLA — grid_sample_2d_quad / field_inputs_quad).

    quads: [R, S, 8C] (bf16) — XY quad row ++ ZY quad row per point.
    aux:   [R, S, n_pe+8] f32 — posenc ++ w4_xy ++ w4_zy.
    dists: [R, S] f32 (pre-scaled by ||rd||). Outputs identical in meaning to
    ``fused_march_coarse``.
    """
    import functools

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, S, qc = quads.shape
    C = qc // 8
    n_pe = aux.shape[-1] - 8
    TR = min(TILE_RAYS_COARSE_QUAD, R)
    assert R % TR == 0, (R, TR)
    ws = list(_field_params(params, quads.dtype))
    ws[0] = _perm_w0(ws[0], C, n_pe)
    cf = params["fc_rgbFeat"]["kernel"].shape[1]
    S2 = S // 2

    out_shapes = (
        jax.ShapeDtypeStruct((R, 3 + cf), jnp.float32),
        jax.ShapeDtypeStruct((R, S), jnp.float32),
        jax.ShapeDtypeStruct((R * S2, cf + 5), jnp.bfloat16),
    )
    out_specs = (
        pl.BlockSpec((TR, 3 + cf), lambda i: (i, 0)),
        pl.BlockSpec((TR, S), lambda i: (i, 0)),
        pl.BlockSpec((TR * S2, cf + 5), lambda i: (i, 0)),
    )
    rgbmap, w, keeps = pl.pallas_call(
        functools.partial(_coarse_kernel_quad, C, n_pe),
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, S, 8 * C), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, S, n_pe + 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, S), lambda i: (i, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(quads, aux, dists, *ws)
    return rgbmap, w, keeps


def _fine_kernel(xn_ref, keep_ref, d_ref, r_ref, w0, b0, w1, b1, wf, bf_,
                 wa, ba, wr, br, rgbmap_ref, w_ref):
    TR, Sn, fin = xn_ref.shape
    x2 = xn_ref[:].reshape(TR * Sn, fin)
    _fine_body(x2, TR, Sn, keep_ref, d_ref, r_ref, w0, b0, w1, b1, wf, bf_,
               wa, ba, wr, br, rgbmap_ref, w_ref)


def _fine_kernel_quad(C, n_pe, qn_ref, auxn_ref, keep_ref, d_ref, r_ref,
                      w0, b0, w1, b1, wf, bf_, wa, ba, wr, br,
                      rgbmap_ref, w_ref):
    TR, Sn, _ = qn_ref.shape
    q2 = qn_ref[:].reshape(TR * Sn, 8 * C)
    aux2 = auxn_ref[:].reshape(TR * Sn, n_pe + 8)
    x2 = _build_x_quad(q2, aux2, C, n_pe, qn_ref.dtype)
    _fine_body(x2, TR, Sn, keep_ref, d_ref, r_ref, w0, b0, w1, b1, wf, bf_,
               wa, ba, wr, br, rgbmap_ref, w_ref)


def _fine_body(x2, TR, Sn, keep_ref, d_ref, r_ref, w0, b0, w1, b1, wf, bf_,
               wa, ba, wr, br, rgbmap_ref, w_ref):
    cf = wf.shape[-1]
    Sk = keep_ref.shape[0] // TR
    Sa = Sn + Sk
    rgb_n, feat_n, sig_n = _mlp(
        x2, w0[:], b0[:], w1[:], b1[:], wf[:],
        bf_[:], wa[:], ba[:], wr[:], br[:])

    # unpack in 2D (lane slices/concats of rank-3 operands are
    # Mosaic-fragile), then split the leading dim where rank-3 is needed
    k2 = keep_ref[:]
    kfeat = k2[:, :cf].astype(jnp.float32).reshape(TR, Sk, cf)
    krgb = k2[:, cf:cf + 3].astype(jnp.float32).reshape(TR, Sk, 3)
    ksig2 = _from_col((k2[:, cf + 3:cf + 4].astype(jnp.float32)
                       + k2[:, cf + 4:cf + 5].astype(jnp.float32))
                      .reshape(TR, Sk, 1), TR, Sk)         # [TR, Sk]
    sign2 = _from_col(sig_n.reshape(TR, Sn, 1), TR, Sn)    # [TR, Sn]

    # sigma/alpha/weights all run 2D with the CONCAT order on lanes
    sig2 = jnp.concatenate([ksig2, sign2], axis=1)         # [TR, Sa]
    alpha2 = 1.0 - jnp.exp(-jnp.maximum(sig2, 0.0) * d_ref[:])
    om = _to_col(1.0 - alpha2 + 1e-10, TR, Sa)             # [TR, Sa, 1]

    # transmittance in CONCAT order: T_i = prod_{j: rank_j < rank_i} om_j.
    # ranks arrive once as [TR, Sa] (i on lanes); the j-on-sublanes view is
    # an in-kernel transpose of the same data.
    r_lane = r_ref[:].reshape(TR, 1, Sa)
    r_sub = jnp.swapaxes(r_lane, 1, 2)                     # [TR, Sa, 1]
    mask = r_sub < r_lane                                  # [TR, Sa, Sa]
    masked = jnp.where(mask, om, 1.0)                      # om broadcasts
    T2 = jnp.exp(jnp.sum(jnp.log(masked), axis=1,
                         keepdims=True)).reshape(TR, Sa)
    w2 = alpha2 * T2
    w_ref[:] = w2

    # weighted sums: keep and new parts reduced separately (their radiance
    # never needs to be concatenated into one rank-3 tensor)
    w3 = _to_col(w2, TR, Sa)
    w_keep, w_new = w3[:, :Sk], w3[:, Sk:]
    rgb_n3 = rgb_n.reshape(TR, Sn, 3)
    feat_n3 = feat_n.reshape(TR, Sn, cf)
    rgb_map = (jnp.sum(w_keep * jax.nn.sigmoid(krgb), axis=1)
               + jnp.sum(w_new * jax.nn.sigmoid(rgb_n3), axis=1))
    feat_map = (jnp.sum(w_keep * kfeat, axis=1)
                + jnp.sum(w_new * feat_n3, axis=1))
    rgbmap_ref[:] = jnp.concatenate([rgb_map, feat_map], axis=-1)


def fused_march_fine(x_new: jnp.ndarray, keeps: jnp.ndarray,
                     dists_concat: jnp.ndarray, ranks: jnp.ndarray,
                     params: Dict, num_keep: int, interpret: bool = None):
    """Hierarchical pass over merged samples in CONCAT order [keep ++ new].

    x_new: [R, Sn, Fin] bf16 — field inputs of the NEW samples only.
    keeps: the coarse kernel's packed [R*Sk, cf+5] output. dists_concat:
    [R, Sa] f32 — each concat element's sorted-neighbor delta (x ||rd||).
    ranks: [R, Sa] — sorted position of each concat element.

    Returns (rgb_map [R, 3+cf] f32 — no background, weights [R, Sa] f32 in
    concat order; per-ray sums/max of weights are order-independent).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, Sn, fin = x_new.shape
    Sk = num_keep
    Sa = Sn + Sk
    TR = min(TILE_RAYS_FINE, R)
    assert R % TR == 0, (R, TR)
    ws = _field_params(params, x_new.dtype)
    cf = params["fc_rgbFeat"]["kernel"].shape[1]

    out_shapes = (
        jax.ShapeDtypeStruct((R, 3 + cf), jnp.float32),
        jax.ShapeDtypeStruct((R, Sa), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((TR, 3 + cf), lambda i: (i, 0)),
        pl.BlockSpec((TR, Sa), lambda i: (i, 0)),
    )
    rgbmap, w = pl.pallas_call(
        _fine_kernel,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, Sn, fin), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR * Sk, cf + 5), lambda i: (i, 0)),
            pl.BlockSpec((TR, Sa), lambda i: (i, 0)),
            pl.BlockSpec((TR, Sa), lambda i: (i, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_new, keeps, dists_concat, ranks.astype(jnp.float32), *ws)
    return rgbmap, w


def fused_march_fine_quad(q_new: jnp.ndarray, aux_new: jnp.ndarray,
                          keeps: jnp.ndarray, dists_concat: jnp.ndarray,
                          ranks: jnp.ndarray, params: Dict, num_keep: int,
                          interpret: bool = None):
    """Quad-consuming hierarchical pass (see ``fused_march_coarse_quad``).

    q_new/aux_new: raw quad rows + (posenc ++ corner weights) of the NEW
    samples only ([R, Sn, 8C] / [R, Sn, n_pe+8]); the rest as
    ``fused_march_fine``.
    """
    import functools

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, Sn, qc = q_new.shape
    C = qc // 8
    n_pe = aux_new.shape[-1] - 8
    Sk = num_keep
    Sa = Sn + Sk
    TR = min(TILE_RAYS_FINE, R)
    assert R % TR == 0, (R, TR)
    ws = list(_field_params(params, q_new.dtype))
    ws[0] = _perm_w0(ws[0], C, n_pe)
    cf = params["fc_rgbFeat"]["kernel"].shape[1]

    out_shapes = (
        jax.ShapeDtypeStruct((R, 3 + cf), jnp.float32),
        jax.ShapeDtypeStruct((R, Sa), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((TR, 3 + cf), lambda i: (i, 0)),
        pl.BlockSpec((TR, Sa), lambda i: (i, 0)),
    )
    rgbmap, w = pl.pallas_call(
        functools.partial(_fine_kernel_quad, C, n_pe),
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, Sn, 8 * C), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, Sn, n_pe + 8), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR * Sk, cf + 5), lambda i: (i, 0)),
            pl.BlockSpec((TR, Sa), lambda i: (i, 0)),
            pl.BlockSpec((TR, Sa), lambda i: (i, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(q_new, aux_new, keeps, dists_concat, ranks.astype(jnp.float32), *ws)
    return rgbmap, w
