"""Camera ray generation and importance-sampling maps.

Specs: ``get_rays`` (reference dataloader/data_util.py:28-56) — intrinsics in
(fx, fy, cx/W, cy/H) normalized format, pixel grid through K^-1, rotated by
c2w, normalized directions — and ``make_ray_importance_sampling_map``
(data_util.py:5-10).

Host-side numpy versions are provided for the data pipeline (rays are
generated once per (frame, view) on the host, then shipped to device as one
contiguous array), plus a jnp version for on-device use.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def intrinsics_to_K(intr, W: int, H: int) -> np.ndarray:
    """(fx, fy, cx_frac, cy_frac) -> 3x3 K (spec: data_util.py:38-39)."""
    K = np.eye(3, dtype=np.float32)
    K[0, 0], K[1, 1] = intr[0], intr[1]
    K[0, 2], K[1, 2] = intr[2] * W, intr[3] * H
    return K


def get_rays_np(
    H: int, W: int, intr, c2w: np.ndarray, normalize: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel ray origins/directions in world space.

    Args:
      intr: (fx, fy, cx/W, cy/H) normalized intrinsics.
      c2w: [3, 4] or [4, 4] camera-to-world.

    Returns: (rays_o [H, W, 3], rays_d [H, W, 3]).
    """
    fx, fy = float(intr[0]), float(intr[1])
    cx, cy = float(intr[2]) * W, float(intr[3]) * H
    c2w = np.asarray(c2w, dtype=np.float32)
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    # analytic K^-1 for a pinhole K (exact; avoids f32 matrix inversion noise)
    dirs = np.stack([(i - cx) / fx, (j - cy) / fy, np.ones_like(i)], axis=-1)
    rays_d = dirs @ c2w[:3, :3].T
    if normalize:
        rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape).copy()
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def get_rays(H: int, W: int, intr, c2w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp variant of :func:`get_rays_np` (for on-device freeview cameras)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2] * W, intr[3] * H
    c2w = jnp.asarray(c2w)
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    dirs = jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], axis=-1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def make_ray_importance_sampling_map(mask: np.ndarray, p: float = 0.9) -> np.ndarray:
    """Probability map: p mass on mask>0 pixels (spec: data_util.py:5-10)."""
    probs = np.full(mask.shape, 1.0 - p, dtype=np.float32)
    probs[mask > 0] = p
    return probs / probs.sum()


def perspective_project(pts: jnp.ndarray, extr: jnp.ndarray, K: jnp.ndarray,
                        normalize: bool = False, width: int = 0,
                        height: int = 0) -> jnp.ndarray:
    """Project [N, 3] world points through a [4, 4] extrinsic and [3, 3] K.

    Spec: ``perspective_projection`` (reference utils/util.py:298-322,
    mode='real'): cam = pts @ R^T + t; pix = (cam @ K^T); divide by z; with
    ``normalize`` map to [-1, 1] using the align_corners=True convention
    (x / (W-1) * 2 - 1) for grid sampling.
    """
    R, t = extr[:3, :3], extr[:3, 3]
    cam = pts @ R.T + t
    proj = cam @ K.T
    xy = proj[..., :2] / proj[..., 2:3]
    if normalize:
        scale = jnp.asarray([2.0 / (width - 1), 2.0 / (height - 1)],
                            dtype=xy.dtype)
        xy = xy * scale - 1.0
    return jnp.concatenate([xy, proj[..., 2:3]], axis=-1)


def project_multiview(pts: jnp.ndarray, extrs: jnp.ndarray,
                      intrs: jnp.ndarray, img_w: int, img_h: int) -> jnp.ndarray:
    """[B, N, 3] points x [B, V, 4, 4] extr x [B, V, 3, 3] K ->
    [B, V, N, 3] normalized projections (spec: utils/util.py:325-341,
    vectorized instead of the reference's double python loop)."""
    def per_view(p, e, k):
        return perspective_project(p, e, k, normalize=True,
                                   width=img_w, height=img_h)

    return jax.vmap(  # over batch
        jax.vmap(per_view, in_axes=(None, 0, 0))  # over views
    )(pts, extrs, intrs)
