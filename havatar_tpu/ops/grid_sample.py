"""Bilinear/trilinear grid sampling with ``align_corners=True`` semantics.

Executable specs: the reference's hand-rolled differentiable samplers
``my_grid_sample_2d`` / ``my_grid_sample_3d`` (utils/util.py:421-610) and
torch ``F.grid_sample(..., align_corners=True)`` as used by
``sample_from_2dgrid`` (utils/util.py:395-406) and ``voxel_feature``
(utils/util.py:409-418).

TPU design (measured on v5e): XLA gathers are only fast when each fetched
slice is a single contiguous run of >= ~64 lanes, and the cost is per-FETCH
(issue-rate bound), nearly independent of row width up to >= 1 KB. Multi-dim
(2,2[,2],C) corner-block gathers lower ~40x slower; per-corner SCALAR
gathers (C=1) lower ~100x slower. So both samplers pre-pack all bilinear
corners of a cell into ONE contiguous row and issue a single fetch per
sample point:

* 2D: the operand is "quad-packed" into [(H-1)*(W-1), 4C] where row
  (y0, x0) holds the 4 corner texels (y0|y0+1) x (x0|x0+1). One 4C-lane
  fetch per point replaces four C-lane corner fetches.
* 3D: packed into [(D-1)*(H-1), 4*W*C] — each row holds the 4 (z,y) corner
  x-ROWS; the x-axis interpolation is a 2-sparse one-hot dot over W on the
  VPU. One fetch per point replaces four.

Packing is a handful of shifted slices + concat (bandwidth-trivial next to
the gather win, and autodiff through it is exact adds), done per call —
XLA CSEs repeated packs of the same operand within one program.

Per-axis weights are computed against the *unclamped* floor index so a
fetched corner automatically gets weight 0 when it is not the true corner —
exact `zeros` semantics (out-of-bounds corners contribute 0) and exact
`border` semantics (coordinates pre-clamped) with no branches.

Coordinate convention (torch-compatible): coords in [-1, 1];
coords[..., 0]=x indexes W, coords[..., 1]=y indexes H, coords[..., 2]=z
indexes D. align_corners=True maps -1 -> 0 and +1 -> size-1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# The backward of both samplers is a scatter-add splat (the adjoint of the
# row gather). When True, updates are sorted by destination row and the
# scatter runs with indices_are_sorted=True (sort keys + permute-gather the
# payload first) — whether that beats XLA's unsorted scatter emitter is
# hardware-dependent; scripts/probe_scatter.py measures it. Trace-time flag:
# set before building the train step.
SORTED_SCATTER = False


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    # align_corners=True: x_pix = (x + 1) / 2 * (size - 1)
    return (coord + 1.0) * 0.5 * (size - 1)


def _axis_weights(pix: jnp.ndarray, size: int):
    """Block start + per-row weights along one axis.

    The gathered block covers absolute rows (start, start+1) with
    start = clip(floor(pix), 0, size-2). Row r's weight is nonzero only when
    its absolute index equals floor(pix) (weight 1-frac) or floor(pix)+1
    (weight frac) — out-of-bounds corners therefore contribute 0 exactly.
    """
    fl = jnp.floor(pix)
    frac = pix - fl
    start = jnp.clip(fl, 0, size - 2).astype(jnp.int32)
    a0 = start.astype(pix.dtype)
    w0 = (jnp.where(a0 == fl, 1.0 - frac, 0.0)
          + jnp.where(a0 == fl + 1.0, frac, 0.0))
    a1 = a0 + 1.0
    w1 = (jnp.where(a1 == fl, 1.0 - frac, 0.0)
          + jnp.where(a1 == fl + 1.0, frac, 0.0))
    return start, w0, w1


def _quad_pack_2d(feat_hwc: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] -> [(H-1)*(W-1), 4C]: row (y0, x0) holds the 4 bilinear
    corner texels (y0|y0+1) x (x0|x0+1) contiguously, so each sample point
    costs ONE row fetch (gathers are issue-rate bound)."""
    H, W, C = feat_hwc.shape
    p = feat_hwc
    quad = jnp.stack([p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=2)
    return quad.reshape((H - 1) * (W - 1), 4 * C)


def _w4_2d(coords_n2: jnp.ndarray, H: int, W: int, padding_mode: str):
    """Bilinear corner weights [N, 4] (differentiable in coords)."""
    x = _unnormalize(coords_n2[:, 0], W)
    y = _unnormalize(coords_n2[:, 1], H)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    _, wx0, wx1 = _axis_weights(x, W)
    _, wy0, wy1 = _axis_weights(y, H)
    return jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)


def _idx_2d(coords_n2: jnp.ndarray, H: int, W: int,
            padding_mode: str) -> jnp.ndarray:
    """Quad-table row index [N] int32 (integer path, non-differentiable)."""
    x = _unnormalize(coords_n2[:, 0], W)
    y = _unnormalize(coords_n2[:, 1], H)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    return y0 * (W - 1) + x0


def _splat_rows(upd: jnp.ndarray, idx: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Scatter-add [N, L] f32 update rows at [N] row indices -> [rows, L].

    The adjoint of ``jnp.take(packed, idx)``. With SORTED_SCATTER the
    updates are pre-sorted by destination (sort keys, permute-gather the
    payload) and the scatter runs indices_are_sorted=True."""
    if SORTED_SCATTER:
        sk, perm = lax.sort_key_val(
            idx, jnp.arange(idx.shape[0], dtype=jnp.int32))
        upd = jnp.take(upd, perm, axis=0)
        return jnp.zeros((rows, upd.shape[1]), jnp.float32).at[sk].add(
            upd, indices_are_sorted=True)
    return jnp.zeros((rows, upd.shape[1]), jnp.float32).at[idx].add(upd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gs2d_one(padding_mode: str, feat_hwc: jnp.ndarray,
              coords_n2: jnp.ndarray) -> jnp.ndarray:
    H, W, C = feat_hwc.shape
    packed = _quad_pack_2d(feat_hwc)
    row = jnp.take(packed, _idx_2d(coords_n2, H, W, padding_mode), axis=0)
    w4 = _w4_2d(coords_n2, H, W, padding_mode)
    val = jnp.einsum("nkc,nk->nc", row.reshape(-1, 4, C).astype(w4.dtype), w4)
    return val.astype(feat_hwc.dtype)


def _gs2d_one_fwd(padding_mode, feat_hwc, coords_n2):
    # Residuals: the INPUTS only. The gathered [N, 4C] rows are re-gathered
    # in the backward (one extra fetch pass) instead of being saved — saving
    # them costs an HBM write in fwd + read in bwd of the same bytes AND
    # ~1.3 GB of residency per call at the stage-2 operating point (the
    # no-remat G-step graph is within 41 MB of this chip's HBM — PERF.md).
    # The narrow per-point residuals (w4 [N,4], indices [N]) are recomputed
    # from coords: TPU tiles pad a 4-lane f32 residual to 128 lanes, i.e.
    # 32x its logical bytes on the wire (docs/PERF.md "tiled-layout tax").
    return _gs2d_one(padding_mode, feat_hwc, coords_n2), (feat_hwc, coords_n2)


def _gs2d_one_bwd(padding_mode, res, g):
    feat_hwc, coords_n2 = res
    H, W, C = feat_hwc.shape
    idx = _idx_2d(coords_n2, H, W, padding_mode)
    packed = _quad_pack_2d(feat_hwc)
    rowf = jnp.take(packed, idx, axis=0).reshape(-1, 4, C)
    rowf = rowf.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    # d coords: through the weight chain (exact, incl. the border clip)
    w4, pull = jax.vjp(
        lambda c: _w4_2d(c, H, W, padding_mode).astype(jnp.float32),
        coords_n2)
    dw4 = jnp.einsum("nkc,nc->nk", rowf, gf)
    dcoords = pull(dw4)[0]
    # d feat: splat w4 (x) g into the quad table, then un-pack (4 dense
    # shifted adds). Updates accumulate in f32 regardless of the feature
    # dtype: bf16 scatter lowers ~2x slower (probe_bwd_pieces.py).
    upd = (w4.astype(jnp.float32)[:, :, None] * gf[:, None, :]).reshape(
        -1, 4 * C)
    dpacked = _splat_rows(upd, idx, (H - 1) * (W - 1))
    q = dpacked.reshape(H - 1, W - 1, 4, C)
    dfeat = jnp.zeros((H, W, C), jnp.float32)
    dfeat = dfeat.at[:-1, :-1].add(q[:, :, 0])
    dfeat = dfeat.at[:-1, 1:].add(q[:, :, 1])
    dfeat = dfeat.at[1:, :-1].add(q[:, :, 2])
    dfeat = dfeat.at[1:, 1:].add(q[:, :, 3])
    return dfeat.astype(feat_hwc.dtype), dcoords.astype(coords_n2.dtype)


_gs2d_one.defvjp(_gs2d_one_fwd, _gs2d_one_bwd)


def grid_sample_2d(
    feat: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample [B, H, W, C] features at [B, N, 2] normalized (x, y) coords.

    Returns [B, N, C]. Matches torch F.grid_sample(bilinear,
    align_corners=True) with grid shape [B, N, 1, 2]. Carries a custom VJP
    (see ``_gs2d_one_bwd``) whose splat/residual layout is shaped for the
    TPU memory system; the gradient math is identical to XLA autodiff.
    """
    assert padding_mode in ("zeros", "border")
    B = feat.shape[0]
    # static python loop over the (small) batch: vmap would produce a
    # batched gather, which lowers ~4x slower on TPU
    return jnp.stack(
        [_gs2d_one(padding_mode, feat[b], coords[b]) for b in range(B)], 0)


def grid_sample_2d_quad(
    feat: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
):
    """The gather half of ``grid_sample_2d``: one quad-packed row fetch per
    point, WITHOUT the corner reduction.

    Returns (rows [B, N, 4C] in the feature dtype, w4 [B, N, 4] f32 corner
    weights, ordered (y0x0, y0x1, y1x0, y1x1)). The bilinear value is
    ``einsum('nkc,nk->nc', rows.reshape(N,4,C).astype(f32), w4)`` — the fused
    march kernels (ops/pallas_march.py) perform exactly that reduction
    in VMEM via lane slices, which removes the corner-einsum HBM round-trip
    of the [N, 4C] gather output (docs/PERF.md round-3 lever)."""
    assert padding_mode in ("zeros", "border")
    B, H, W, C = feat.shape

    def one(feat_hwc, coords_n2):
        packed = _quad_pack_2d(feat_hwc)
        row = jnp.take(packed, _idx_2d(coords_n2, H, W, padding_mode), axis=0)
        w4 = _w4_2d(coords_n2, H, W, padding_mode)
        return row, w4.astype(jnp.float32)

    rows, ws = zip(*[one(feat[b], coords[b]) for b in range(B)])
    return jnp.stack(rows, 0), jnp.stack(ws, 0)


def _tile_geom_3d(W: int, C: int, itemsize: int):
    """Static x-tile geometry of the 3D packer: (TW, stride, starts).

    The volume sampler fetches one packed row of the 4 (z,y) corner x-RUNS
    per point; TW picks the measured-fastest row width (scripts/
    probe_fetch_width2.py): 64 B rows fetch ~1.5x faster than 128-256 B, so
    the tile narrows to 8 when the row fits in 64 B (C=1 bf16 — the
    inference-path skinning volume)."""
    TW = min(8 if C * itemsize <= 2 else 16, W)
    stride = max(TW // 2, 1)
    n_tiles = max(1, -(-(W - TW) // stride) + 1)
    starts = tuple(min(s * stride, W - TW) for s in range(n_tiles))
    return TW, stride, starts


def _pack_3d(vol_dhwc: jnp.ndarray, TW: int, starts) -> jnp.ndarray:
    """[D, H, W, C] -> [(D-1)*(H-1)*n_tiles, 4*TW*C]: each row holds the 4
    (z, y) corner x-runs of one overlapping x-tile."""
    D, H, W, C = vol_dhwc.shape
    tiles = jnp.stack([vol_dhwc[:, :, s: s + TW] for s in starts],
                      axis=2)  # [D, H, T, TW, C]
    quad = jnp.stack([tiles[:-1, :-1], tiles[:-1, 1:],
                      tiles[1:, :-1], tiles[1:, 1:]], axis=3)
    return quad.reshape((D - 1) * (H - 1) * len(starts), 4 * TW * C)


def _w_3d(coords_n3: jnp.ndarray, D: int, H: int, W: int,
          padding_mode: str, TW: int, stride: int, n_tiles: int):
    """(wzy [N, 4], wx_vec [N, TW]) — differentiable in coords."""
    x = _unnormalize(coords_n3[:, 0], W)
    y = _unnormalize(coords_n3[:, 1], H)
    z = _unnormalize(coords_n3[:, 2], D)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)
    x0, wx0, wx1 = _axis_weights(x, W)
    _, wy0, wy1 = _axis_weights(y, H)
    _, wz0, wz1 = _axis_weights(z, D)
    k_tile = jnp.minimum(x0 // stride, n_tiles - 1)
    x_local = x0 - jnp.minimum(k_tile * stride, W - TW)
    xi = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
    wx_vec = (jnp.where(xi == x_local[:, None], wx0[:, None], 0.0)
              + jnp.where(xi == (x_local + 1)[:, None], wx1[:, None], 0.0))
    wzy = jnp.stack([wz0 * wy0, wz0 * wy1, wz1 * wy0, wz1 * wy1], axis=-1)
    return wzy, wx_vec


def _idx_3d(coords_n3: jnp.ndarray, D: int, H: int, W: int,
            padding_mode: str, stride: int, n_tiles: int) -> jnp.ndarray:
    """Packed-table row index [N] int32 (integer path)."""
    x = _unnormalize(coords_n3[:, 0], W)
    y = _unnormalize(coords_n3[:, 1], H)
    z = _unnormalize(coords_n3[:, 2], D)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
        z = jnp.clip(z, 0.0, D - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    z0 = jnp.clip(jnp.floor(z), 0, D - 2).astype(jnp.int32)
    k_tile = jnp.minimum(x0 // stride, n_tiles - 1)
    return (z0 * (H - 1) + y0) * n_tiles + k_tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gs3d_one(padding_mode: str, vol_dhwc: jnp.ndarray,
              coords_n3: jnp.ndarray) -> jnp.ndarray:
    # the skinning volume has C=1, so per-corner gathers would be
    # scalar-class (≈100x slow); see _tile_geom_3d/_pack_3d: ONE packed-row
    # fetch per point + a 2-sparse one-hot x-interpolation on the VPU.
    D, H, W, C = vol_dhwc.shape
    TW, stride, starts = _tile_geom_3d(W, C, jnp.dtype(vol_dhwc.dtype).itemsize)
    packed = _pack_3d(vol_dhwc, TW, starts)
    idx = _idx_3d(coords_n3, D, H, W, padding_mode, stride, len(starts))
    wzy, wx_vec = _w_3d(coords_n3, D, H, W, padding_mode, TW, stride,
                        len(starts))
    row = jnp.take(packed, idx, axis=0).reshape(-1, 4, TW, C)
    val = jnp.einsum("nkwc,nw->nkc", row.astype(wzy.dtype), wx_vec)
    acc = jnp.einsum("nkc,nk->nc", val, wzy)
    return acc.astype(vol_dhwc.dtype)


def _gs3d_one_fwd(padding_mode, vol_dhwc, coords_n3):
    # inputs-only residuals — same rationale as _gs2d_one_fwd
    return _gs3d_one(padding_mode, vol_dhwc, coords_n3), (vol_dhwc, coords_n3)


def _unpack_3d_grad(dpacked, D, H, W, C, TW, starts):
    """Adjoint of ``_pack_3d``: fold the packed-table gradient back onto the
    dense volume (4 shifted adds + overlapping x-tile accumulation)."""
    n_tiles = len(starts)
    q = dpacked.reshape(D - 1, H - 1, n_tiles, 4, TW, C)
    dtiles = jnp.zeros((D, H, n_tiles, TW, C), jnp.float32)
    dtiles = dtiles.at[:-1, :-1].add(q[:, :, :, 0])
    dtiles = dtiles.at[:-1, 1:].add(q[:, :, :, 1])
    dtiles = dtiles.at[1:, :-1].add(q[:, :, :, 2])
    dtiles = dtiles.at[1:, 1:].add(q[:, :, :, 3])
    dvol = jnp.zeros((D, H, W, C), jnp.float32)
    for k, s in enumerate(starts):  # overlapping x-tiles accumulate
        dvol = dvol.at[:, :, s: s + TW].add(dtiles[:, :, k])
    return dvol


def _gs3d_one_bwd(padding_mode, res, g):
    vol_dhwc, coords_n3 = res
    D, H, W, C = vol_dhwc.shape
    TW, stride, starts = _tile_geom_3d(W, C, jnp.dtype(vol_dhwc.dtype).itemsize)
    n_tiles = len(starts)
    idx = _idx_3d(coords_n3, D, H, W, padding_mode, stride, n_tiles)
    packed = _pack_3d(vol_dhwc, TW, starts)
    rowf = jnp.take(packed, idx, axis=0).reshape(-1, 4, TW, C)
    rowf = rowf.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    (wzy, wx_vec), pull = jax.vjp(
        lambda c: tuple(map(
            lambda a: a.astype(jnp.float32),
            _w_3d(c, D, H, W, padding_mode, TW, stride, n_tiles))),
        coords_n3)
    val = jnp.einsum("nkwc,nw->nkc", rowf, wx_vec)      # [N, 4, C]
    dwzy = jnp.einsum("nkc,nc->nk", val, gf)
    dval = wzy[:, :, None] * gf[:, None, :]             # [N, 4, C]
    dwx = jnp.einsum("nkwc,nkc->nw", rowf, dval)
    dcoords = pull((dwzy, dwx))[0]

    drow = jnp.einsum("nkc,nw->nkwc", dval, wx_vec).reshape(-1, 4 * TW * C)
    dpacked = _splat_rows(drow, idx, (D - 1) * (H - 1) * n_tiles)
    dvol = _unpack_3d_grad(dpacked, D, H, W, C, TW, starts)
    return dvol.astype(vol_dhwc.dtype), dcoords.astype(coords_n3.dtype)


_gs3d_one.defvjp(_gs3d_one_fwd, _gs3d_one_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gs3d_one_fc(padding_mode: str, vol_dhwc: jnp.ndarray,
                 coords_n3: jnp.ndarray) -> jnp.ndarray:
    """``_gs3d_one`` for FIXED coordinates: identical forward, but the
    backward computes only d(volume) — no row re-gather and no coords
    weight-chain. The skinning field always samples its canonical volume at
    box-warped *ray points* (data, not params — models/skinning.py), where
    the full VJP's dcoords chain measured +77 ms/step dead work at the
    stage-2 operating point (scripts/probe_bwd_pieces.py, f32)."""
    return _gs3d_one(padding_mode, vol_dhwc, coords_n3)


def _gs3d_one_fc_fwd(padding_mode, vol_dhwc, coords_n3):
    # residuals: coords only (vol is kept for static shape/dtype; its data
    # is never read in the backward)
    return _gs3d_one_fc(padding_mode, vol_dhwc, coords_n3), (vol_dhwc,
                                                             coords_n3)


def _gs3d_one_fc_bwd(padding_mode, res, g):
    vol_dhwc, coords_n3 = res
    D, H, W, C = vol_dhwc.shape
    TW, stride, starts = _tile_geom_3d(W, C, jnp.dtype(vol_dhwc.dtype).itemsize)
    n_tiles = len(starts)
    idx = _idx_3d(coords_n3, D, H, W, padding_mode, stride, n_tiles)
    wzy, wx_vec = _w_3d(coords_n3, D, H, W, padding_mode, TW, stride, n_tiles)
    gf = g.astype(jnp.float32)
    dval = wzy.astype(jnp.float32)[:, :, None] * gf[:, None, :]   # [N, 4, C]
    drow = jnp.einsum("nkc,nw->nkwc", dval,
                      wx_vec.astype(jnp.float32)).reshape(-1, 4 * TW * C)
    dpacked = _splat_rows(drow, idx, (D - 1) * (H - 1) * n_tiles)
    dvol = _unpack_3d_grad(dpacked, D, H, W, C, TW, starts)
    return dvol.astype(vol_dhwc.dtype), jnp.zeros_like(coords_n3)


_gs3d_one_fc.defvjp(_gs3d_one_fc_fwd, _gs3d_one_fc_bwd)


def grid_sample_3d(
    vol: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "border",
    coords_grad: bool = True,
) -> jnp.ndarray:
    """Sample [B, D, H, W, C] volume at [B, N, 3] normalized (x, y, z) coords.

    Returns [B, N, C]. Matches torch F.grid_sample 3D (trilinear,
    align_corners=True) with grid [B, N, 1, 1, 3]: x indexes W, y indexes H,
    z indexes D (reference utils/util.py:409-418). Custom VJP with a
    TPU-shaped splat backward (see ``_gs3d_one_bwd``); gradient math is
    identical to XLA autodiff.

    ``coords_grad=False`` declares the coordinates non-differentiated (their
    cotangent comes back zero): the backward is then just the d(volume)
    splat — it skips the row re-gather and the coords weight chain, which
    custom_vjp otherwise pins as live code even when the caller never uses
    dcoords. Use for lookups at data points (e.g. the skinning volume at
    box-warped ray samples).
    """
    assert padding_mode in ("zeros", "border")
    B = vol.shape[0]
    one = _gs3d_one if coords_grad else _gs3d_one_fc
    return jnp.stack(
        [one(padding_mode, vol[b], coords[b]) for b in range(B)], 0)


def sample_from_triplane(
    coords: jnp.ndarray,
    planes: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample per-point features from up to 3 axis-aligned feature planes.

    Plane-axis convention matches the reference's ``sample_from_triplane_new``
    (utils/util.py:359-392): plane 0 reads (x, y), plane 1 reads (z, y),
    plane 2 reads (x, z); each plane satisfies top-left=(-1,-1),
    bottom-right=(1,1).

    Args:
      coords: [B, N, 3] box-warped coordinates.
      planes: [P, B, H, W, C] with P in {1, 2, 3}.

    Returns: [B, N, C, P].
    """
    P = planes.shape[0]
    assert 1 <= P <= 3
    axes = ((0, 1), (2, 1), (0, 2))[:P]
    feats = [
        grid_sample_2d(planes[p], coords[..., list(ax)], padding_mode)
        for p, ax in enumerate(axes)
    ]
    return jnp.stack(feats, axis=-1)


def sample_image_features(
    xy: jnp.ndarray,
    features: jnp.ndarray,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Multi-view image feature lookup: [B, V, N, 2] normalized coords x
    [B, V, H, W, C] feature maps -> [B, V, N, C]
    (spec: ``img_feature``, reference utils/util.py:345-356)."""
    B, V = xy.shape[:2]
    out = [
        grid_sample_2d(features[:, v], xy[:, v], padding_mode)
        for v in range(V)
    ]
    return jnp.stack(out, axis=1)
