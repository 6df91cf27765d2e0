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


def ray_aabb_near_far(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    box_min: jnp.ndarray,
    box_max: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-method ray/AABB intersection, clamped to the incoming
    ``[near, far]`` interval.

    The reference marches 64 blind stratified samples over the full dataset
    near/far (model/nerf_trainer.py:129-139) even though the avatar occupies
    a known bounding box; tightening the integration interval per ray lets
    an inference caller spend fewer samples at the SAME spatial density
    (occupancy-gated sampling — see ``tighten_ray_near_far``).

    Rays that miss the box get a collapsed ``[near, near]`` interval: every
    sample dist is then exactly 0, so alpha == 0 and the renderer composites
    the pure background — bit-exact with a blind march through zero-density
    space.

    Args:
      rays_o, rays_d: [..., 3] (directions need not be normalized).
      box_min, box_max: [3] world-space AABB corners.
      near, far: [..., 1] incoming bounds.

    Returns: (near', far') each [..., 1].
    """
    inv = 1.0 / rays_d                      # +-inf where d == 0
    t0 = (box_min - rays_o) * inv
    t1 = (box_max - rays_o) * inv
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    # d == 0 along an axis: the ray is parallel to that slab — inside it the
    # axis never constrains t, outside it the ray can never hit. (The inf
    # arithmetic above yields NaN when the origin sits ON a slab face; the
    # where() rewrites that lane entirely.)
    zero = rays_d == 0
    inside = (rays_o >= box_min) & (rays_o <= box_max)
    lo = jnp.where(zero, jnp.where(inside, -jnp.inf, jnp.inf), lo)
    hi = jnp.where(zero, jnp.where(inside, jnp.inf, -jnp.inf), hi)
    t_enter = jnp.maximum(jnp.max(lo, axis=-1, keepdims=True), near)
    t_exit = jnp.minimum(jnp.min(hi, axis=-1, keepdims=True), far)
    hit = t_exit > t_enter
    return (jnp.where(hit, t_enter, near),
            jnp.where(hit, t_exit, near))


def head_world_aabb(xyz_bounding, inv_head_T: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-space AABB of the avatar's canonical field box under the
    skinning transforms.

    The field's plane features are sampled with zero padding outside
    ``xyz_bounding`` in CANONICAL space (model/nerf_model.py:95-99 —
    ops/grid_sample.py padding_mode='zeros'), and the skinning blend maps a
    world point through either the identity or the inverse-head transform
    (model/Skinning_Field.py:88-101). A world point can therefore only see
    nonzero plane features if it lands in the box under at least one of the
    two transforms — i.e. world occupancy is contained in
    box ∪ head_T·box. This returns the AABB of that union: the elementwise
    min/max over the canonical corners and their images under the INVERSE
    of inv_head_T (conservative, never clips real occupancy).

    Args:
      xyz_bounding: ((x0,x1),(y0,y1),(z0,z1)).
      inv_head_T: [B, 4, 3] — rows 0-2 right-multiplied rotation M,
        row 3 translation t: canonical = (world + t) @ M.

    Returns: (box_min [B, 3], box_max [B, 3]).
    """
    b = jnp.asarray(xyz_bounding, dtype=jnp.float32)   # [3, 2]
    corners = jnp.stack(jnp.meshgrid(b[0], b[1], b[2], indexing="ij"),
                        axis=-1).reshape(8, 3)
    M = inv_head_T[:, :3, :]                            # [B, 3, 3]
    t = inv_head_T[:, 3:4, :]                           # [B, 1, 3]
    # world = canonical @ M^-1 - t
    back = jnp.einsum("kj,bji->bki", corners, jnp.linalg.inv(M)) - t
    allc = jnp.concatenate(
        [jnp.broadcast_to(corners, back.shape), back], axis=1)  # [B, 16, 3]
    return jnp.min(allc, axis=1), jnp.max(allc, axis=1)


def tighten_ray_near_far(ray_batch: jnp.ndarray, xyz_bounding,
                         inv_head_T: jnp.ndarray) -> jnp.ndarray:
    """Rewrite a [B, R, 8+] ray batch's near/far (channels 6:8) to the
    per-ray intersection with the avatar's world AABB (see
    ``head_world_aabb``). Pure ray preprocessing: the renderer's stratified
    sampler already supports per-ray near/far, so occupancy-gated inference
    is this call plus a smaller ``num_coarse``."""
    box_min, box_max = head_world_aabb(xyz_bounding, inv_head_T)
    nf = ray_aabb_near_far(
        ray_batch[..., 0:3], ray_batch[..., 3:6],
        box_min[:, None, :], box_max[:, None, :],
        ray_batch[..., 6:7], ray_batch[..., 7:8])
    return jnp.concatenate(
        [ray_batch[..., :6], nf[0], nf[1], ray_batch[..., 8:]], axis=-1)


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
