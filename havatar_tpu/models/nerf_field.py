"""Facial-model-conditioned double-plane NeRF field.

Behavioral spec: reference
``ConditionalTriplaneNeRFModel_multiRender_split_view``
(model/nerf_model.py:10-117) at its default operating point
(model/nerf_trainer.py:20-26): enc_mode='split', triPlane_feat_dim=64,
rgb_feat_dim=3, triplane_res=128, sh_deg=0, posenc 8 freqs without identity.

Two StyleGAN generators turn orthographic 3DMM condition renders into feature
planes — XY from the front condition, ZY from (flipped-left, right)
(model/nerf_model.py:58-86; the left cond is flipped horizontally and its
mask channel dropped, :70-72). Points are box-warped, sampled against both
planes (plane-axis convention utils/util.py:378-384), and a small MLP
produces (rgb 3, feature 64, sigma 1).

TPU notes: plane generation happens ONCE per frame; the per-point MLP is the
hot loop — formulated as [N, C] matmuls that tile directly onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from havatar_tpu.models.generators import (
    PlaneGenerator,
    TwoHeadPlaneGenerator,
)
from havatar_tpu.ops import (
    BoxWarp,
    eval_sh,
    positional_encoding,
    posenc_dim,
    sample_from_triplane,
)


class DoublePlaneNeRFField(nn.Module):
    xyz_bounding: Tuple[Tuple[float, float], ...] = (
        (-1.5, 1.5), (-1.6, 1.4), (-1.6, 1.2))
    num_encoding_fn_xyz: int = 8
    latent_code_dim: int = 44      # latent 32 + flattened inv_head_T 12
    plane_feat_dim: int = 64
    rgb_feat_dim: int = 3
    plane_res: int = 128
    cond_res: int = 256
    plane_middle_size: int = 16
    sh_deg: int = 0
    # plane-generator topology (model/nerf_model.py:28-42): 'split' (default,
    # two independent generators), 'shared_backbone' (one trunk, channel-split
    # planes), 'two_head' (shared trunk to 32², per-plane heads)
    enc_mode: str = "split"
    hidden: int = 128
    compute_dtype: str = "float32"   # "bfloat16" for MXU-speed inference
    # fuse the 5-dot dense chain into one Pallas kernel (inference only —
    # keeps activations VMEM-resident; the XLA path is ~6% MXU-utilized,
    # activation-bandwidth bound). Identical dtype contract; same params.
    use_pallas_mlp: bool = False
    # fuse gather -> corner reduce -> dense chain under ONE custom_vjp
    # (ops/pallas_mlp_quad.py): the TRAINING counterpart of the march
    # kernels' quad-consuming input contract — removes the corner-einsum
    # and MLP-input HBM round-trips from the stage-2 G step in both
    # directions. Supersedes use_pallas_mlp when set. TPU only.
    use_pallas_mlp_quad: bool = False
    # fc_rgbFeat width: the feature-image channel count fed to the SR net
    # (model/nerf_model.py:50 hardcodes 64; configurable here)
    feat_dim: int = 64

    def setup(self):
        cdt = jnp.dtype(self.compute_dtype)
        if self.enc_mode == "split":
            self.XY_gen = PlaneGenerator(
                out_ch=self.plane_feat_dim, out_size=self.plane_res,
                style_dim=self.latent_code_dim,
                middle_size=self.plane_middle_size,
                inp_size=self.cond_res, inp_ch=7, n_mlp=4,
                compute_dtype=self.compute_dtype,
            )
            self.YZ_gen = PlaneGenerator(
                out_ch=self.plane_feat_dim, out_size=self.plane_res,
                style_dim=self.latent_code_dim,
                middle_size=self.plane_middle_size,
                inp_size=self.cond_res, inp_ch=13, n_mlp=4,
                compute_dtype=self.compute_dtype,
            )
        elif self.enc_mode == "shared_backbone":
            # one trunk emits both planes stacked on channels
            # (model/nerf_model.py:33-34, 73-77). The reference's own
            # construction omits no_skip=True there, which would make its
            # forward return a 4*out_ch wavelet skip and crash the plane
            # split — we build the intended no_skip configuration.
            self.XY_gen = PlaneGenerator(
                out_ch=2 * self.plane_feat_dim, out_size=self.plane_res,
                style_dim=self.latent_code_dim, middle_size=16,
                inp_size=self.cond_res, inp_ch=20, n_mlp=4,
                compute_dtype=self.compute_dtype,
            )
        elif self.enc_mode == "two_head":
            # shared trunk to 32², then per-plane cond-injected heads
            # (model/nerf_model.py:36-37)
            self.XY_gen = TwoHeadPlaneGenerator(
                out_ch=self.plane_feat_dim, out_size=self.plane_res,
                style_dim=self.latent_code_dim, middle_size=8, split_size=32,
                inp_size=self.cond_res, inp_ch=(7, 13), n_mlp=4,
                compute_dtype=self.compute_dtype,
            )
        else:
            raise ValueError(f"unknown enc_mode {self.enc_mode!r}")
        self.gridwarper = BoxWarp.from_bounds(self.xyz_bounding)
        self.layer0 = nn.Dense(self.hidden, dtype=cdt)
        self.layer1 = nn.Dense(self.hidden, dtype=cdt)
        self.fc_alpha = nn.Dense(1, dtype=cdt)
        self.fc_rgbFeat = nn.Dense(self.feat_dim, dtype=cdt)
        self.fc_rgb = nn.Dense(self.rgb_feat_dim * (self.sh_deg + 1) ** 2,
                               dtype=cdt)

    def generate_planes(
        self,
        latents: jnp.ndarray,       # [B, 32]
        cond_c: jnp.ndarray,        # [B, 12] flattened inv_head_T
        front_cond: jnp.ndarray,    # [B, H, W, 7]
        left_cond: jnp.ndarray,     # [B, H, W, 7]
        right_cond: jnp.ndarray,    # [B, H, W, 7]
    ) -> jnp.ndarray:
        """-> conditioned feature planes [2, B, R, R, C]."""
        z = jnp.concatenate([latents, cond_c.reshape(latents.shape[0], -1)], -1)
        # flip left cond horizontally so the right plane satisfies
        # top-left=(-1,-1) (model/nerf_model.py:70); drop its mask channel
        left = jnp.flip(left_cond, axis=2)[..., :-1]
        if self.enc_mode == "shared_backbone":
            both = self.XY_gen(z, jnp.concatenate(
                [front_cond, left, right_cond], axis=-1))
            xy = both[..., :self.plane_feat_dim]
            zy = both[..., self.plane_feat_dim:]
        elif self.enc_mode == "two_head":
            xy, zy = self.XY_gen(
                z, front_cond, jnp.concatenate([left, right_cond], axis=-1))
        else:
            xy = self.XY_gen(z, front_cond)
            zy = self.YZ_gen(z, jnp.concatenate([left, right_cond], axis=-1))
        return jnp.stack([xy, zy], axis=0)

    def sample_plane_features(self, pts: jnp.ndarray, planes: jnp.ndarray) -> jnp.ndarray:
        """[B, N, 3] x [2, B, R, R, C] -> [B, N, 2C]."""
        warped = self.gridwarper(pts)
        feats = sample_from_triplane(warped, planes, padding_mode="zeros")
        B, N = feats.shape[:2]
        # channel order matches the reference's reshape of [B,N,C,P] -> C*P
        # (model/nerf_model.py:99): feature index = c*P + p
        return feats.reshape(B, N, -1)

    def field_inputs(self, pts: jnp.ndarray, planes: jnp.ndarray) -> jnp.ndarray:
        """[B, N, 3] canonical points -> the MLP input (plane feats ++ posenc)
        [B, N, 2C+posenc] in the compute dtype (the fused-march path consumes
        this directly — see ops/pallas_march.py)."""
        cdt = jnp.dtype(self.compute_dtype)
        pts_feat = self.sample_plane_features(pts, planes)
        xyz_emb = positional_encoding(pts, self.num_encoding_fn_xyz,
                                      include_input=False)
        return jnp.concatenate(
            [pts_feat.astype(cdt), xyz_emb.astype(cdt)], axis=-1)

    def field_inputs_quad(self, pts: jnp.ndarray, planes: jnp.ndarray):
        """Raw-gather variant of ``field_inputs`` for the quad-consuming
        march kernels: the corner reduction happens IN the Pallas kernel
        (VMEM), not in XLA, removing the [N, 4C] einsum HBM round-trip.

        Returns (quads [B, N, 8C] plane-dtype — XY quad row ++ ZY quad row,
        aux [B, N, posenc+8] f32 — posenc ++ w4_xy ++ w4_zy). The kernel
        rebuilds the MLP input as [xy, zy, posenc] BLOCK order; layer0's
        weight rows are permuted accordingly (ops/pallas_march.py) since the
        reference interleaves plane channels as c*P+p (model/nerf_model.py:99).
        """
        from havatar_tpu.ops import grid_sample_2d_quad

        warped = self.gridwarper(pts)
        rows_xy, w_xy = grid_sample_2d_quad(
            planes[0], warped[..., (0, 1)], "zeros")
        rows_zy, w_zy = grid_sample_2d_quad(
            planes[1], warped[..., (2, 1)], "zeros")
        xyz_emb = positional_encoding(pts, self.num_encoding_fn_xyz,
                                      include_input=False)
        quads = jnp.concatenate([rows_xy, rows_zy], axis=-1)
        aux = jnp.concatenate(
            [xyz_emb.astype(jnp.float32), w_xy, w_zy], axis=-1)
        return quads, aux

    def mlp_params(self):
        """The dense-chain params (bound module only; fused kernels)."""
        return {
            name: dict(getattr(self, name).variables["params"])
            for name in ("layer0", "layer1", "fc_alpha", "fc_rgbFeat",
                         "fc_rgb")
        }

    def __call__(
        self,
        pts: jnp.ndarray,            # [B, N, 3] canonical points (unwarped)
        viewdirs: Optional[jnp.ndarray],  # [B, N, 3] (unused when sh_deg=0)
        planes: jnp.ndarray,         # [2, B, R, R, C]
    ) -> jnp.ndarray:
        """-> radiance field [B, N, rgb + feat + 1]."""
        cdt = jnp.dtype(self.compute_dtype)
        if (self.use_pallas_mlp_quad and self.sh_deg == 0
                and not self.is_initializing()):
            from havatar_tpu.ops.pallas_mlp_quad import field_radiance_quad

            warped = self.gridwarper(pts)
            pe = positional_encoding(
                pts, self.num_encoding_fn_xyz,
                include_input=False).astype(jnp.float32)
            prm = self.mlp_params()
            # static python loop over the batch (same rationale as
            # grid_sample_2d: batched gathers lower ~4x slower)
            outs = [
                field_radiance_quad("zeros", None, None, planes[0][b],
                                    planes[1][b], warped[b], pe[b], prm)
                for b in range(pts.shape[0])
            ]
            return jnp.stack(outs, 0)
        x = self.field_inputs(pts, planes)
        if (self.use_pallas_mlp and self.sh_deg == 0
                and not self.is_initializing()):
            from havatar_tpu.ops.pallas_mlp import fused_mlp_chain

            B, N, F = x.shape
            out = fused_mlp_chain(x.reshape(B * N, F), self.mlp_params())
            return out.reshape(B, N, -1)
        x = jax.nn.relu(self.layer0(x))
        x = jax.nn.relu(self.layer1(x))
        alpha = self.fc_alpha(x).astype(jnp.float32)
        feat = self.fc_rgbFeat(x)
        sh = self.fc_rgb(feat).astype(jnp.float32)
        feat = feat.astype(jnp.float32)
        if self.sh_deg == 0:
            rgb = sh
        else:
            rgb = eval_sh(
                self.sh_deg,
                sh.reshape(*sh.shape[:-1], -1, (self.sh_deg + 1) ** 2),
                viewdirs,
            )
        return jnp.concatenate([rgb, feat, alpha], axis=-1)
