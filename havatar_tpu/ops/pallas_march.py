"""Pallas TPU kernels: NeRF field MLP + alpha compositing, fused per ray tile.

Spec of the unfused math: the field tail (reference model/nerf_model.py:101-117)
followed by ``volume_render_radiance_field`` (utils/nerf_util.py:28-73) and, for
the hierarchical pass, the depth-merged re-evaluation (model/nerf_trainer.py:
165-193). The fused form exists because this chip is HBM-bandwidth bound: the
unfused chain writes the [N, 68] radiance tensor to HBM (f32, ~356 MB/frame)
and reads it back for compositing — at the measured ~150-220 GB/s effective
bandwidth (scripts/probe_hbm_bw.py) that round-trip alone is ~4-5 ms/frame.
Here radiance never leaves VMEM: each grid step owns TR whole rays, runs all
their samples through the dense chain, composites in-register, and writes only
per-ray maps plus the (bf16) half-rate samples the fine pass reuses.

Exactness notes (inference path only; training and parity tests keep the XLA
path):
* the transmittance cumprod is computed by log2(S) masked shift-multiplies —
  a different association order than jnp.cumprod, same values to f32 roundoff;
* the fine pass composites in CONCAT order using rank comparisons (weight of
  sample i multiplies the product of (1-alpha) over samples ranked before it)
  — algebraically identical to sorting first, so no in-kernel permutation is
  needed; the per-ray sums over samples are order-independent;
* the coarse radiance reused by the fine pass is stored bf16 (rgb/feat; sigma
  stays f32), a second rounding of values already produced by bf16 matmuls.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_RAYS_COARSE = 64
TILE_RAYS_FINE = 128


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


def _cumprod_exclusive_axis1(om):
    """Exclusive cumprod of [TR, S, 1] along axis 1 by shift-multiplies."""
    S = om.shape[1]
    # exclusive: shift down by one, leading one
    c = jnp.concatenate(
        [jnp.ones_like(om[:, :1]), om[:, :S - 1]], axis=1)
    k = 1
    while k < S:
        shifted = jnp.concatenate(
            [jnp.ones_like(c[:, :k]), c[:, :S - k]], axis=1)
        c = c * shifted
        k *= 2
    return c


def _coarse_kernel(x_ref, d_ref, w0, b0, w1, b1, wf, bf_, wa, ba, wr, br,
                   rgbmap_ref, w_ref, krgb_ref, kfeat_ref, ksig_ref):
    TR, S, fin = x_ref.shape
    x2 = x_ref[:].reshape(TR * S, fin)
    rgb, feat, sigma = _mlp(x2, w0[:], b0[:], w1[:], b1[:], wf[:], bf_[:],
                            wa[:], ba[:], wr[:], br[:])
    rgb3 = rgb.reshape(TR, S, 3)
    feat3 = feat.reshape(TR, S, feat.shape[-1])
    sig3 = sigma.reshape(TR, S, 1)

    alpha = 1.0 - jnp.exp(-jnp.maximum(sig3, 0.0) * d_ref[:])
    T = _cumprod_exclusive_axis1(1.0 - alpha + 1e-10)
    w = alpha * T                                     # [TR, S, 1]

    rgb_map = jnp.sum(w * jax.nn.sigmoid(rgb3), axis=1)    # [TR, 3]
    feat_map = jnp.sum(w * feat3, axis=1)                  # [TR, 64]
    rgbmap_ref[:] = jnp.concatenate([rgb_map, feat_map], axis=-1)
    w_ref[:] = w
    # [:, ::2] — Mosaic rejects strided sublane slices (lowers to gather);
    # reshape to [TR, S/2, 2, C] and take pair element 0 instead
    krgb_ref[:] = rgb3.reshape(TR, S // 2, 2, 3)[:, :, 0, :].astype(
        krgb_ref.dtype)
    kfeat_ref[:] = feat3.reshape(TR, S // 2, 2, feat3.shape[-1])[
        :, :, 0, :].astype(kfeat_ref.dtype)
    ksig_ref[:] = sig3.reshape(TR, S // 2, 2, 1)[:, :, 0, :]


def fused_march_coarse(x: jnp.ndarray, dists: jnp.ndarray, params: Dict,
                       interpret: bool = None):
    """x: [R, S, Fin] (bf16), dists: [R, S] f32 (pre-scaled by ||rd||).

    Returns (rgb_map [R, 67] f32 — no background composite,
             weights [R, S] f32,
             keep_rgb [R, S//2, 3] bf16, keep_feat [R, S//2, Cf] bf16,
             keep_sigma [R, S//2] f32).
    """
    if interpret is None:   # Mosaic needs a real TPU; CPU runs interpreted
        interpret = jax.default_backend() == "cpu"
    R, S, fin = x.shape
    TR = min(TILE_RAYS_COARSE, R)
    assert R % TR == 0, (R, TR)
    cdt = x.dtype
    ws = _field_params(params, cdt)
    cf = params["fc_rgbFeat"]["kernel"].shape[1]
    n = R // TR
    S2 = S // 2

    out_shapes = (
        jax.ShapeDtypeStruct((R, 3 + cf), jnp.float32),
        jax.ShapeDtypeStruct((R, S, 1), jnp.float32),
        jax.ShapeDtypeStruct((R, S2, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((R, S2, cf), jnp.bfloat16),
        jax.ShapeDtypeStruct((R, S2, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((TR, 3 + cf), lambda i: (i, 0)),
        pl.BlockSpec((TR, S, 1), lambda i: (i, 0, 0)),
        pl.BlockSpec((TR, S2, 3), lambda i: (i, 0, 0)),
        pl.BlockSpec((TR, S2, cf), lambda i: (i, 0, 0)),
        pl.BlockSpec((TR, S2, 1), lambda i: (i, 0, 0)),
    )
    rgbmap, w, krgb, kfeat, ksig = pl.pallas_call(
        _coarse_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((TR, S, fin), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, S, 1), lambda i: (i, 0, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, dists[..., None], *ws)
    return rgbmap, w[..., 0], krgb, kfeat, ksig[..., 0]


def _fine_kernel(xn_ref, krgb_ref, kfeat_ref, ksig_ref, d_ref, rsub_ref,
                 rlane_ref, w0, b0, w1, b1, wf, bf_, wa, ba, wr, br,
                 rgbmap_ref, w_ref):
    TR, Sn, fin = xn_ref.shape
    Sk = krgb_ref.shape[1]
    rgb_n, feat_n, sig_n = _mlp(
        xn_ref[:].reshape(TR * Sn, fin), w0[:], b0[:], w1[:], b1[:], wf[:],
        bf_[:], wa[:], ba[:], wr[:], br[:])
    cf = feat_n.shape[-1]

    rgb_c = jnp.concatenate(
        [krgb_ref[:].astype(jnp.float32), rgb_n.reshape(TR, Sn, 3)], axis=1)
    feat_c = jnp.concatenate(
        [kfeat_ref[:].astype(jnp.float32), feat_n.reshape(TR, Sn, cf)], axis=1)
    sig_c = jnp.concatenate(
        [ksig_ref[:], sig_n.reshape(TR, Sn, 1)], axis=1)   # [TR, Sa, 1]

    alpha = 1.0 - jnp.exp(-jnp.maximum(sig_c, 0.0) * d_ref[:])
    om = 1.0 - alpha + 1e-10                               # [TR, Sa, 1]

    # transmittance in CONCAT order: T_i = prod_{j: rank_j < rank_i} om_j.
    # ranks come in twice — [TR, Sa, 1] (j on sublanes) and [TR, 1, Sa]
    # (i on lanes) — so the mask is a pure broadcast compare, no transpose
    # of in-kernel data.
    mask = rsub_ref[:] < rlane_ref[:]                      # [TR, Sa, Sa]
    masked = jnp.where(mask, om, 1.0)                      # om broadcasts
    T_lane = jnp.exp(jnp.sum(jnp.log(masked), axis=1, keepdims=True))
    T = jnp.swapaxes(T_lane, 1, 2)                         # [TR, Sa, 1]
    w = alpha * T

    rgb_map = jnp.sum(w * jax.nn.sigmoid(rgb_c), axis=1)
    feat_map = jnp.sum(w * feat_c, axis=1)
    rgbmap_ref[:] = jnp.concatenate([rgb_map, feat_map], axis=-1)
    w_ref[:] = w


def fused_march_fine(x_new: jnp.ndarray, keep_rgb: jnp.ndarray,
                     keep_feat: jnp.ndarray, keep_sigma: jnp.ndarray,
                     dists_concat: jnp.ndarray, ranks: jnp.ndarray,
                     params: Dict, interpret: bool = None):
    """Hierarchical pass over merged samples in CONCAT order [keep ++ new].

    x_new: [R, Sn, Fin] bf16 — field inputs of the NEW samples only.
    keep_*: the coarse kernel's half-rate outputs. dists_concat: [R, Sa] f32 —
    each concat element's sorted-neighbor delta (already x ||rd||).
    ranks: [R, Sa] — sorted position of each concat element.

    Returns (rgb_map [R, 67] f32 — no background, weights [R, Sa] f32 in
    concat order; per-ray sums/max of weights are order-independent).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, Sn, fin = x_new.shape
    Sk = keep_rgb.shape[1]
    Sa = Sn + Sk
    TR = min(TILE_RAYS_FINE, R)
    assert R % TR == 0, (R, TR)
    cdt = x_new.dtype
    ws = _field_params(params, cdt)
    cf = keep_feat.shape[-1]

    rf = ranks.astype(jnp.float32)
    out_shapes = (
        jax.ShapeDtypeStruct((R, 3 + cf), jnp.float32),
        jax.ShapeDtypeStruct((R, Sa, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((TR, 3 + cf), lambda i: (i, 0)),
        pl.BlockSpec((TR, Sa, 1), lambda i: (i, 0, 0)),
    )
    rgbmap, w = pl.pallas_call(
        _fine_kernel,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, Sn, fin), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, Sk, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, Sk, cf), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, Sk, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, Sa, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, Sa, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((TR, 1, Sa), lambda i: (i, 0, 0)),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x_new, keep_rgb, keep_feat, keep_sigma[..., None],
      dists_concat[..., None], rf[..., None], rf[:, None, :], *ws)
    return rgbmap, w[..., 0]
