"""Bilinear/trilinear grid sampling with ``align_corners=True`` semantics.

Executable specs: the reference's hand-rolled differentiable samplers
``my_grid_sample_2d`` / ``my_grid_sample_3d`` (utils/util.py:421-610) and
torch ``F.grid_sample(..., align_corners=True)`` as used by
``sample_from_2dgrid`` (utils/util.py:395-406) and ``voxel_feature``
(utils/util.py:409-418).

TPU design (measured on v5e): XLA gathers are only fast when each fetched
slice is a single contiguous run of >= ~64 lanes. Multi-dim (2,2[,2],C)
corner-block gathers lower ~40x slower; per-corner SCALAR gathers (C=1)
lower ~100x slower. So:

* 2D: four per-corner row fetches from the [H*W, C] flattening (C=64 lanes
  for the feature planes);
* 3D: four (z,y)-row fetches from the [D*H, W*C] flattening — the full x-run
  rides the lanes — and the x-axis interpolation becomes a 2-sparse one-hot
  dot over W on the VPU. This turns the skinning volume's scalar samples
  into 64-lane fetches (~30x faster than the naive form).

Per-axis weights are computed against the *unclamped* floor index so a
fetched row automatically gets weight 0 when it is not the true corner —
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
        flat = feat_hwc.reshape(H * W, C)
        acc = None
        for yi, wy in ((y0, wy0), (y0 + 1, wy1)):
            for xi, wx in ((x0, wx0), (x0 + 1, wx1)):
                corner = jnp.take(flat, yi * W + xi, axis=0)
                term = corner.astype(wy.dtype) * (wy * wx)[:, None]
                acc = term if acc is None else acc + term
        return acc.astype(feat_hwc.dtype)

    # static python loop over the (small) batch: vmap would produce a
    # batched gather, which lowers ~4x slower on TPU
    return jnp.stack([one(feat[b], coords[b]) for b in range(B)], 0)


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
        # scalar-class (≈100x slow). Fetch full x-ROWS instead (W*C lanes)
        # and interpolate x with a 2-sparse one-hot dot on the VPU:
        # 4 wide row fetches per point instead of 8 scalar fetches.
        xi = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        wx_vec = (jnp.where(xi == x0[:, None], wx0[:, None], 0.0)
                  + jnp.where(xi == (x0 + 1)[:, None], wx1[:, None], 0.0))

        rows_all = vol_dhwc.reshape(D * H, W * C)
        acc = None
        for zi, wz in ((z0, wz0), (z0 + 1, wz1)):
            for yi, wy in ((y0, wy0), (y0 + 1, wy1)):
                row = jnp.take(rows_all, zi * H + yi, axis=0)  # [N, W*C]
                row = row.reshape(-1, W, C).astype(wz.dtype)
                val = jnp.einsum("nwc,nw->nc", row, wx_vec)
                term = val * (wz * wy)[:, None]
                acc = term if acc is None else acc + term
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
