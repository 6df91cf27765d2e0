"""Head-pose skinning: canonical weight volume + 2-way rigid blend.

Behavioral specs:
* ``VolumeDecoder`` (reference model/network/voxel_encoder.py:150-179): a
  fixed random 1024-d seed decoded by 6 (upsample-trilinear ×2 → 3³ conv →
  instance-norm → relu) blocks to a 64³ sigmoid volume, output concat(x, 1-x).
* ``SkinningField`` == ``Deformation_Field_new``
  (model/Skinning_Field.py:43-125): two candidate inverse transforms
  (identity, inverse-head), trilinear weight lookup per transformed point,
  normalized blend of transformed points and view dirs; ``fix_canonical_W``
  inference clamping; ``pretrain_wc`` BCE box-prior fit.

TPU notes: the volume decode is a handful of tiny 3D convs — negligible next
to the ray march — and is evaluated ONCE per step (not per point). The
per-point work is two trilinear gathers + a blend, which fuses into the ray
pipeline.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from havatar_tpu.ops import BoxWarp, grid_sample_3d


def _conv3d(x, w, b=None, padding=1):
    out = lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=[(padding, padding)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b
    return out


def _instance_norm(x, eps=1e-5):
    """InstanceNorm3d(affine=False): normalize over spatial dims per (B, C)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def _upsample_trilinear_2x(x):
    """scale_factor=2, align_corners=False trilinear (half-pixel centers)."""
    B, D, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * D, 2 * H, 2 * W, C), method="trilinear")


class VolumeDecoder(nn.Module):
    """Learned seed -> [1, R, R, R, 2] weight volume (channels: x, 1-x)."""

    num_in: int = 1024
    num_out: int = 1
    final_res: int = 64

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        # fixed random seed tensor: a torch *buffer* (voxel_encoder.py:158),
        # not trained — kept in its own collection so optimizers skip it.
        init_lc = self.variable(
            "buffers", "init_lc",
            lambda: jax.random.uniform(self.make_rng("params"), (1, 1, 1, 1, self.num_in)),
        ).value

        num_layers = int(math.log2(self.final_res))
        init_log2 = int(math.log2(self.num_in))
        x = init_lc
        for i in range(num_layers):
            out_ch = 2 ** (init_log2 - i - 1)
            x = _upsample_trilinear_2x(x)
            w = self.param(f"up{i}_weight",
                           nn.initializers.xavier_normal(),
                           (3, 3, 3, x.shape[-1], out_ch))
            b = self.param(f"up{i}_bias", nn.initializers.zeros, (out_ch,))
            x = _conv3d(x, w, b)
            x = _instance_norm(x)
            x = jax.nn.relu(x)
        w = self.param("final_weight", nn.initializers.xavier_normal(),
                       (3, 3, 3, x.shape[-1], self.num_out))
        b = self.param("final_bias", nn.initializers.zeros, (self.num_out,))
        x = jax.nn.sigmoid(_conv3d(x, w, b))
        return jnp.concatenate([x, 1.0 - x], axis=-1)  # [1, D, H, W, 2]


def fix_canonical_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """Inference-time clamping (spec: model/Skinning_Field.py:57-62).

    vol: [1, D, H, W, 2]. Forces the head-follow weight (channel 1) to 1 at
    the y=-1 slab and the z=-1, y<W/8 corner, then rebuilds channel 0 = 1-w1.
    """
    w1 = vol[..., 1:]
    w1 = w1.at[:, :, 0, :, :].set(1.0)
    w1 = w1.at[:, 0, : vol.shape[3] // 8, :, :].set(1.0)
    return jnp.concatenate([1.0 - w1, w1], axis=-1)


class SkinningField(nn.Module):
    """Blend points between identity and inverse-head transforms by a learned
    canonical weight volume."""

    # box warp of the skinning volume: XYZ bounds with Y[0] = 0.3*Y[1]
    # (spec: model/nerf_trainer.py:29-34)
    scales: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    trans: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    vol_res: int = 64
    # "bfloat16" halves the weight-volume gather rows to 64 B (the fetch
    # engine is issue/byte bound — see ops/grid_sample.py); blend math and
    # geometry stay f32. Inference-path knob; training/parity keep f32.
    compute_dtype: str = "float32"

    def setup(self):
        self.canonical_volume = VolumeDecoder(final_res=self.vol_res)
        self.warp = BoxWarp(self.scales, self.trans)

    def volume(self) -> jnp.ndarray:
        return self.canonical_volume()

    def __call__(
        self,
        pts: jnp.ndarray,
        viewdirs: Optional[jnp.ndarray],
        inv_head_T: jnp.ndarray,
        fixed_volume: Optional[jnp.ndarray] = None,
    ):
        """Args:
          pts: [B, N, 3]; viewdirs: [B, N, 3] or None; inv_head_T: [B, 4, 3]
          (rows 0-2: right-multiplied rotation, row 3: translation).
          fixed_volume: optional precomputed/clamped volume [1, D, H, W, 2]
          (inference path, see ``fix_canonical_volume``).

        Returns: (pts_canonical [B, N, 3], viewdirs_canonical [B, N, 3] | 0).
        """
        B = pts.shape[0]
        vol = self.canonical_volume() if fixed_volume is None else fixed_volume
        vol = jnp.broadcast_to(vol, (B,) + vol.shape[1:])
        if self.compute_dtype == "bfloat16":
            vol = vol.astype(jnp.bfloat16)

        eye = jnp.concatenate(
            [jnp.eye(3, dtype=pts.dtype), jnp.zeros((1, 3), pts.dtype)], axis=0
        )
        transforms = [jnp.broadcast_to(eye, (B, 4, 3)), inv_head_T]

        pts_inv, weights = [], []
        for i, T in enumerate(transforms):
            # geometry transforms stay full f32 regardless of the global
            # matmul precision (3x3 matmuls — precision over speed)
            p = jnp.matmul(pts + T[:, -1:], T[:, :3, :3],
                           precision=lax.Precision.HIGHEST)
            pts_inv.append(p)
            # coords_grad=False: the lookup points are box-warped ray
            # samples — data, never differentiated (training losses take
            # grads wrt params only). The fixed-coords VJP drops the row
            # re-gather + coords weight chain from the backward
            # (scripts/probe_bwd_pieces.py: +77 ms/step of dead work at the
            # stage-2 operating point otherwise).
            w = grid_sample_3d(vol[..., i:i + 1], self.warp(p),
                               padding_mode="border", coords_grad=False)
            weights.append(w)
        w = jnp.concatenate(weights, axis=-1).astype(pts.dtype)  # [B, N, 2]
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)

        out_pts = sum(w[..., i:i + 1] * pts_inv[i] for i in range(2))
        out_dirs = 0
        if viewdirs is not None:
            out_dirs = sum(
                w[..., i:i + 1] * jnp.matmul(viewdirs, transforms[i][:, :3, :3],
                                             precision=lax.Precision.HIGHEST)
                for i in range(2)
            )
        return out_pts, out_dirs

    def sample_weight(self, pts: jnp.ndarray, channel: int = 1) -> jnp.ndarray:
        """Sample one weight channel at [N, 3] world points (debug/pretrain)."""
        vol = self.canonical_volume()
        return grid_sample_3d(
            vol[..., channel:channel + 1], self.warp(pts[None]), "border",
            coords_grad=False,  # pretrain queries at fixed grid points
        )[0]


def make_volume_pts(steps: int = 20, rng: Optional[jax.Array] = None,
                    warp: Optional[BoxWarp] = None) -> jnp.ndarray:
    """Regular [-1,1]^3 grid of points, optionally perturbed and un-warped to
    world space (spec: utils/util.py:239-254)."""
    ax = jnp.linspace(-1.0, 1.0, steps)
    xv, yv, zv = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pts = jnp.stack([xv, yv, zv], axis=-1).reshape(-1, 3)
    if rng is not None:
        pts = pts + jax.random.uniform(rng, pts.shape) * (2.0 / (steps - 1))
    if warp is not None:
        pts = warp.inv(pts)
    return pts
