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

import jax
import jax.numpy as jnp
from jax import lax


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


def grid_sample_2d(
    feat: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample [B, H, W, C] features at [B, N, 2] normalized (x, y) coords.

    Returns [B, N, C]. Matches torch F.grid_sample(bilinear,
    align_corners=True) with grid shape [B, N, 1, 2].
    """
    assert padding_mode in ("zeros", "border")
    B, H, W, C = feat.shape

    def one(feat_hwc, coords_n2):
        x = _unnormalize(coords_n2[:, 0], W)
        y = _unnormalize(coords_n2[:, 1], H)
        if padding_mode == "border":
            x = jnp.clip(x, 0.0, W - 1)
            y = jnp.clip(y, 0.0, H - 1)
        x0, wx0, wx1 = _axis_weights(x, W)
        y0, wy0, wy1 = _axis_weights(y, H)
        # quad-pack: row (y0, x0) holds all 4 bilinear corners contiguously,
        # so each point costs ONE row fetch (gathers are issue-rate bound)
        p = feat_hwc
        quad = jnp.stack(
            [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=2)
        packed = quad.reshape((H - 1) * (W - 1), 4 * C)
        row = jnp.take(packed, y0 * (W - 1) + x0, axis=0)
        w4 = jnp.stack(
            [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
        val = jnp.einsum("nkc,nk->nc",
                         row.reshape(-1, 4, C).astype(w4.dtype), w4)
        return val.astype(feat_hwc.dtype)

    # static python loop over the (small) batch: vmap would produce a
    # batched gather, which lowers ~4x slower on TPU
    return jnp.stack([one(feat[b], coords[b]) for b in range(B)], 0)


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
        x = _unnormalize(coords_n2[:, 0], W)
        y = _unnormalize(coords_n2[:, 1], H)
        if padding_mode == "border":
            x = jnp.clip(x, 0.0, W - 1)
            y = jnp.clip(y, 0.0, H - 1)
        x0, wx0, wx1 = _axis_weights(x, W)
        y0, wy0, wy1 = _axis_weights(y, H)
        p = feat_hwc
        quad = jnp.stack(
            [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=2)
        packed = quad.reshape((H - 1) * (W - 1), 4 * C)
        row = jnp.take(packed, y0 * (W - 1) + x0, axis=0)
        w4 = jnp.stack(
            [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
        return row, w4.astype(jnp.float32)

    rows, ws = zip(*[one(feat[b], coords[b]) for b in range(B)])
    return jnp.stack(rows, 0), jnp.stack(ws, 0)


def grid_sample_3d(
    vol: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Sample [B, D, H, W, C] volume at [B, N, 3] normalized (x, y, z) coords.

    Returns [B, N, C]. Matches torch F.grid_sample 3D (trilinear,
    align_corners=True) with grid [B, N, 1, 1, 3]: x indexes W, y indexes H,
    z indexes D (reference utils/util.py:409-418).
    """
    assert padding_mode in ("zeros", "border")
    B, D, H, W, C = vol.shape

    def one(vol_dhwc, coords_n3):
        x = _unnormalize(coords_n3[:, 0], W)
        y = _unnormalize(coords_n3[:, 1], H)
        z = _unnormalize(coords_n3[:, 2], D)
        if padding_mode == "border":
            x = jnp.clip(x, 0.0, W - 1)
            y = jnp.clip(y, 0.0, H - 1)
            z = jnp.clip(z, 0.0, D - 1)
        x0, wx0, wx1 = _axis_weights(x, W)
        y0, wy0, wy1 = _axis_weights(y, H)
        z0, wz0, wz1 = _axis_weights(z, D)

        # the skinning volume has C=1, so per-corner gathers would be
        # scalar-class (≈100x slow). The gather fast path is ~bandwidth
        # bound, so fetch as FEW bytes as possible per point while keeping
        # each row one contiguous >=64-value run: pack the 4 (z,y) corner
        # x-runs of an overlapping x-TILE (width TW, stride TW/2) into one
        # row, fetch one row per point, and interpolate x with a 2-sparse
        # one-hot dot over the TW lanes on the VPU. For the 64³ skinning
        # volume this is 4·TW·C values/point instead of 4·64·C (4x fewer
        # bytes than full x-rows; ~16x fewer than naive corner gathers).
        # TW picks the measured-fastest row width (scripts/
        # probe_fetch_width2.py): 64 B rows fetch ~1.5x faster than
        # 128-256 B, so narrow the tile to 8 when the row fits in 64 B
        # (C=1 bf16 — the inference-path skinning volume).
        itemsize = jnp.dtype(vol_dhwc.dtype).itemsize
        TW = min(8 if C * itemsize <= 2 else 16, W)
        stride = max(TW // 2, 1)
        n_tiles = max(1, -(-(W - TW) // stride) + 1)
        starts = [min(s * stride, W - TW) for s in range(n_tiles)]
        k_tile = jnp.minimum(x0 // stride, n_tiles - 1)
        x_local = x0 - jnp.minimum(k_tile * stride, W - TW)

        xi = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
        wx_vec = (jnp.where(xi == x_local[:, None], wx0[:, None], 0.0)
                  + jnp.where(xi == (x_local + 1)[:, None], wx1[:, None], 0.0))

        v = vol_dhwc
        tiles = jnp.stack([v[:, :, s: s + TW]
                           for s in starts], axis=2)  # [D,H,T,TW,C]
        quad = jnp.stack([tiles[:-1, :-1], tiles[:-1, 1:],
                          tiles[1:, :-1], tiles[1:, 1:]], axis=3)
        packed = quad.reshape((D - 1) * (H - 1) * n_tiles, 4 * TW * C)
        row = jnp.take(packed, (z0 * (H - 1) + y0) * n_tiles + k_tile, axis=0)
        row = row.reshape(-1, 4, TW, C).astype(wz0.dtype)
        wzy = jnp.stack(
            [wz0 * wy0, wz0 * wy1, wz1 * wy0, wz1 * wy1], axis=-1)
        val = jnp.einsum("nkwc,nw->nkc", row, wx_vec)
        acc = jnp.einsum("nkc,nk->nc", val, wzy)
        return acc.astype(vol_dhwc.dtype)

    return jnp.stack([one(vol[b], coords[b]) for b in range(B)], 0)


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
