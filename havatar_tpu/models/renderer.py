"""The avatar renderer: conditioned double-plane NeRF + skinning + two-pass
(coarse/fine) volume rendering, as ONE jittable function.

Behavioral spec: reference ``Trainer`` (model/nerf_trainer.py:11-201) —
latent lookup + regularization (:94-118), stratified coarse sampling
(:129-139), skinning of points and view dirs (:144-146), plane-feature + MLP
field eval (:149-151), volume rendering with background composite (:157-163),
hierarchical fine pass that merges every-2nd coarse depth with 16 PDF samples
(:165-193), and the two output modes (per-ray tensors for stage 1, full
[B, 128, 128, C] feature image + mask for stage 2/inference).

TPU re-design: the reference serially chunks rays 4096 at a time
(get_minibatches, model/nerf_trainer.py:66-71) to bound GPU memory. Here the
ENTIRE ray set is one batched tensor program — a 128² image is only 16K rays
× 112 samples, well within one chip — and sharding the ray axis across a mesh
replaces chunking entirely (see parallel/). RNG is explicit; perturb/noise
are compile-time flags so inference traces contain no RNG ops at all.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from havatar_tpu.models.nerf_field import DoublePlaneNeRFField
from havatar_tpu.models.skinning import SkinningField, fix_canonical_volume
from havatar_tpu.ops import (
    get_box_warp_param,
    sample_pdf,
    volume_render_radiance_field,
)


class AvatarRenderer(nn.Module):
    """Field + skinning + volume rendering. All sampling hyperparameters are
    call-time Python constants (static under jit)."""

    xyz_bounding: Tuple[Tuple[float, float], ...] = (
        (-1.5, 1.5), (-1.6, 1.4), (-1.6, 1.2))
    latent_code_dim: int = 32
    cond_pose: bool = True
    num_encoding_fn_xyz: int = 8
    plane_feat_dim: int = 64
    plane_res: int = 128
    cond_res: int = 256
    plane_middle_size: int = 16
    enc_mode: str = "split"     # 'split' | 'shared_backbone' | 'two_head'
    feat_dim: int = 64
    render_size: int = 128
    skin_vol_res: int = 64
    compute_dtype: str = "float32"   # "bfloat16" for MXU-speed inference
    # Override for the skinning volume's gather dtype. None follows
    # compute_dtype. Inference wants bf16 (64 B rows fetch ~1.5x faster —
    # ops/grid_sample.py); TRAINING in bf16 mode wants f32: the volume's
    # gradient is a scatter-add, and bf16 scatter accumulation lowers ~2x
    # slower than f32 on TPU (measured: scripts/probe_bwd_pieces.py,
    # 0.083 s vs 0.045 s at the stage-2 operating point). The volume is
    # 64³ — its fetch bandwidth is negligible either way.
    skin_compute_dtype: Optional[str] = None
    use_pallas_mlp: bool = False     # fused field MLP (fwd + bwd kernels)
    # fused gather->corner-reduce->MLP custom_vjp (ops/pallas_mlp_quad.py):
    # the training counterpart of the quad-consuming march kernels.
    # Supersedes use_pallas_mlp. TPU only.
    use_pallas_mlp_quad: bool = False
    # fully-fused field+composite march kernels (ops/pallas_march.py):
    # radiance never round-trips HBM. Inference only (no perturb/noise/rng);
    # supersedes use_pallas_mlp when set.
    use_pallas_march: bool = False
    # quad-consuming march kernels: the bilinear corner reduction of the
    # plane gathers runs IN the kernel (raw [N, 8C] quad rows in, corner
    # einsum + MLP-input round-trips eliminated — docs/PERF.md round 3).
    # Only meaningful with use_pallas_march.
    use_pallas_quad: bool = True

    def setup(self):
        field_latent_dim = self.latent_code_dim + (12 if self.cond_pose else 0)
        self.field = DoublePlaneNeRFField(
            xyz_bounding=self.xyz_bounding,
            num_encoding_fn_xyz=self.num_encoding_fn_xyz,
            latent_code_dim=field_latent_dim,
            plane_feat_dim=self.plane_feat_dim,
            plane_res=self.plane_res,
            cond_res=self.cond_res,
            plane_middle_size=self.plane_middle_size,
            enc_mode=self.enc_mode,
            feat_dim=self.feat_dim,
            compute_dtype=self.compute_dtype,
            use_pallas_mlp=self.use_pallas_mlp,
            use_pallas_mlp_quad=self.use_pallas_mlp_quad,
        )
        # skinning volume bounds: XYZ bounds with Y_lo = 0.3 * Y_hi
        # (spec: model/nerf_trainer.py:29-33)
        xb, yb, zb = [list(b) for b in self.xyz_bounding]
        yb[0] = 0.3 * yb[1]
        scales, trans = get_box_warp_param(xb, yb, zb)
        self.skinning = SkinningField(
            scales=scales, trans=trans, vol_res=self.skin_vol_res,
            compute_dtype=self.skin_compute_dtype or self.compute_dtype)

    # -- helpers -----------------------------------------------------------

    @property
    def gate_aabb(self):
        """The AABB for occupancy gating: ``xyz_bounding`` expanded by one
        plane texel per axis.

        Plane features are zero-padded OUTSIDE the box, but bilinear
        interpolation (align_corners) ramps the edge-texel value to zero
        one texel BEYOND the ±1 coordinate — so feature-driven density can
        exist up to extent/(plane_res−1) past each box face. Gating on the
        raw box cuts that overhang off and introduces a converged,
        schedule-independent render bias (measured: a dense gated march
        plateaued ~45 dB from a dense blind march of the same scene until
        the halo was added — scripts/measure_schedule_accuracy.py). Gating
        on the support box makes the tightened march integrate exactly
        what the blind march does wherever the trained-avatar premise
        (no posenc-only density) holds."""
        return tuple(
            (lo - (hi - lo) / (self.plane_res - 1),
             hi + (hi - lo) / (self.plane_res - 1))
            for lo, hi in self.xyz_bounding)

    def skin_volume(self):
        return self.skinning.volume()

    def _field_eval(self, pts, viewdirs, inv_head_T, planes, skin_vol):
        """Skin [B, R, S, 3] points into canonical space and evaluate the
        field. Returns radiance [B, R, S, C+1]. ``skin_vol`` is the decoded
        canonical weight volume (decoded ONCE per frame — the 3D conv decode
        must not run per ray pass)."""
        B, R, S = pts.shape[:3]
        flat_pts = pts.reshape(B, R * S, 3)
        flat_dirs = jnp.broadcast_to(viewdirs[:, :, None, :], pts.shape)
        flat_dirs = flat_dirs.reshape(B, R * S, 3)
        can_pts, can_dirs = self.skinning(flat_pts, flat_dirs, inv_head_T,
                                          fixed_volume=skin_vol)
        radiance = self.field(can_pts, can_dirs, planes)
        return radiance.reshape(B, R, S, -1)

    # -- main entry ----------------------------------------------------------

    def __call__(
        self,
        ray_batch: jnp.ndarray,        # [B, R, 8]: o, d, near, far
        background_prior: jnp.ndarray,  # [B, R, 3]
        latent_code: jnp.ndarray,       # [B, latent_code_dim]
        inv_head_T: jnp.ndarray,        # [B, 4, 3]
        front_cond: jnp.ndarray,        # [B, cond_res, cond_res, 7]
        left_cond: jnp.ndarray,
        right_cond: jnp.ndarray,
        *,
        num_coarse: int = 64,
        num_fine: int = 16,
        perturb: bool = True,
        radiance_field_noise_std: float = 0.0,
        rng: Optional[jax.Array] = None,
        fixed_volume: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        B = ray_batch.shape[0]
        cond_c = inv_head_T.reshape(B, -1)
        planes = self.field.generate_planes(
            latent_code, cond_c, front_cond, left_cond, right_cond)
        return self.render_rays(
            planes, ray_batch, background_prior, inv_head_T,
            num_coarse=num_coarse, num_fine=num_fine, perturb=perturb,
            radiance_field_noise_std=radiance_field_noise_std, rng=rng,
            fixed_volume=fixed_volume)

    def render_rays(
        self,
        planes: jnp.ndarray,
        ray_batch: jnp.ndarray,
        background_prior: jnp.ndarray,
        inv_head_T: jnp.ndarray,
        *,
        num_coarse: int = 64,
        num_fine: int = 16,
        perturb: bool = True,
        radiance_field_noise_std: float = 0.0,
        rng: Optional[jax.Array] = None,
        fixed_volume: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        B, R = ray_batch.shape[:2]
        # decode the canonical skinning volume ONCE per frame; the 3D-conv
        # decoder must not re-run in the coarse AND fine passes
        skin_vol = (self.skinning.volume() if fixed_volume is None
                    else fixed_volume)
        if (self.use_pallas_march and rng is None
                and radiance_field_noise_std == 0.0 and not perturb
                and not self.is_initializing()):
            return self._render_rays_fused(
                planes, ray_batch, background_prior, inv_head_T,
                num_coarse=num_coarse, num_fine=num_fine, skin_vol=skin_vol)
        ro, rd = ray_batch[..., 0:3], ray_batch[..., 3:6]
        near, far = ray_batch[..., 6:7], ray_batch[..., 7:8]
        viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

        if rng is not None:
            rng_coarse, rng_noise_c, rng_pdf, rng_noise_f = jax.random.split(rng, 4)
        else:
            rng_coarse = rng_noise_c = rng_pdf = rng_noise_f = None

        # ---- coarse depth samples (spec: model/nerf_trainer.py:129-139)
        t_vals = jnp.linspace(0.0, 1.0, num_coarse, dtype=ro.dtype)
        z_vals = near * (1.0 - t_vals) + far * t_vals  # [B, R, S]
        if perturb:
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
            lower = jnp.concatenate([z_vals[..., :1], mids], -1)
            t_rand = jax.random.uniform(rng_coarse, z_vals.shape, z_vals.dtype)
            z_vals = lower + (upper - lower) * t_rand

        pts = ro[..., None, :] + rd[..., None, :] * z_vals[..., :, None]
        radiance = self._field_eval(pts, viewdirs, inv_head_T, planes, skin_vol)

        flat = lambda a: a.reshape((B * R,) + a.shape[2:])
        rgb_c, disp_c, acc_c, weights, depth_c = volume_render_radiance_field(
            flat(radiance), flat(z_vals), flat(rd),
            radiance_field_noise_std=radiance_field_noise_std,
            background_prior=flat(background_prior),
            noise_rng=rng_noise_c,
        )

        out = {
            "rgb_coarse": rgb_c.reshape(B, R, -1),
            "depth_coarse": depth_c.reshape(B, R, 1),
            "acc_coarse": acc_c.reshape(B, R, 1),
            "weights_max": jnp.max(weights, axis=-1).reshape(B, R, 1),
            "rgb_fine": None, "depth_fine": None, "acc_fine": None,
        }

        if num_fine > 0:
            # ---- hierarchical pass (spec: model/nerf_trainer.py:165-193).
            # The reference re-evaluates the field at ALL merged depths
            # (every-2nd coarse + the PDF samples). The field is a
            # deterministic function of the point (sigma noise is applied
            # inside the volume renderer, not the field), so the coarse
            # radiance at the reused depths is bit-identical — reuse it and
            # evaluate only the num_fine NEW samples: 2/3 fewer field evals
            # in this pass, exact to the reference semantics.
            zf = flat(z_vals)
            z_mid = 0.5 * (zf[..., 1:] + zf[..., :-1])
            z_samples = sample_pdf(z_mid, weights[..., 1:-1], num_fine,
                                   det=not perturb, rng=rng_pdf)
            z_samples = jax.lax.stop_gradient(z_samples)

            z_keep = zf[:, ::2]
            rad_keep = flat(radiance)[:, ::2]
            z_cat = jnp.concatenate([z_keep, z_samples], axis=-1)
            S_all = z_cat.shape[-1]
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S_all), 2)
            if perturb:
                perm = jnp.argsort(z_cat, axis=-1)
                # scatter ranks: ranks[k] = s  <=>  perm[s] = k
                ranks = jnp.argsort(perm, axis=-1)
            else:
                # deterministic path: z_keep (strided linspace) and the det
                # inverse-CDF samples are EACH ascending — merge ranks via
                # comparison counts instead of an O(S log S) sort network.
                # Tie rule (< vs <=) reproduces stable argsort of the concat.
                a, b = z_keep, z_samples
                nA = a.shape[-1]
                pos_a = (jnp.arange(nA) +
                         jnp.sum(b[:, None, :] < a[:, :, None], axis=-1))
                pos_b = (jnp.arange(b.shape[-1]) +
                         jnp.sum(a[:, :, None] <= b[:, None, :], axis=1))
                ranks = jnp.concatenate([pos_a, pos_b], axis=-1)

            z_new = z_samples.reshape(B, R, num_fine)
            pts_new = ro[..., None, :] + rd[..., None, :] * z_new[..., :, None]
            rad_new = self._field_eval(pts_new, viewdirs, inv_head_T, planes,
                                       skin_vol)
            rad_cat = jnp.concatenate([rad_keep, flat(rad_new)], axis=1)
            # reorder samples by depth with ONE one-hot contraction shared
            # by depths and radiance (batched take_along_axis gathers lower
            # poorly on TPU; rank one-hots avoid materializing a perm)
            onehot = (ranks[:, :, None] == iota_s).astype(rad_cat.dtype)
            z_all = jnp.einsum("rks,rk->rs", onehot.astype(z_cat.dtype), z_cat)
            radiance_f = jnp.einsum("rks,rkc->rsc", onehot, rad_cat)

            rgb_f, disp_f, acc_f, weights_f, depth_f = volume_render_radiance_field(
                radiance_f, z_all, flat(rd),
                radiance_field_noise_std=radiance_field_noise_std,
                background_prior=flat(background_prior),
                noise_rng=rng_noise_f,
            )
            out["rgb_fine"] = rgb_f.reshape(B, R, -1)
            out["depth_fine"] = depth_f.reshape(B, R, 1)
            out["acc_fine"] = acc_f.reshape(B, R, 1)
            out["weights_max"] = jnp.max(weights_f, axis=-1).reshape(B, R, 1)

        return out

    def _render_rays_fused(
        self,
        planes: jnp.ndarray,
        ray_batch: jnp.ndarray,
        background_prior: jnp.ndarray,
        inv_head_T: jnp.ndarray,
        *,
        num_coarse: int,
        num_fine: int,
        skin_vol: jnp.ndarray,
    ) -> Dict[str, Any]:
        """Deterministic inference march through the fused Pallas kernels
        (ops/pallas_march.py): skinning + plane sampling + posenc build the
        kernel input; the field MLP and alpha compositing run per ray tile
        with radiance VMEM-resident. Semantics identical to the XLA path with
        perturb/noise off (the fine reuse stores rgb/feat in bf16)."""
        from havatar_tpu.ops.pallas_march import (
            fused_march_coarse,
            fused_march_coarse_quad,
            fused_march_fine,
            fused_march_fine_quad,
        )

        B, R = ray_batch.shape[:2]
        ro, rd = ray_batch[..., 0:3], ray_batch[..., 3:6]
        near, far = ray_batch[..., 6:7], ray_batch[..., 7:8]
        quad = self.use_pallas_quad

        t_vals = jnp.linspace(0.0, 1.0, num_coarse, dtype=ro.dtype)
        z_vals = near * (1.0 - t_vals) + far * t_vals       # [B, R, S]

        def march_inputs(pts):
            """[B, R', S', 3] world points -> kernel inputs: either the
            pre-reduced [B*R', S', F] MLP input, or (quads, aux) raw gather
            rows for the quad-consuming kernels."""
            b, r, s = pts.shape[:3]
            flat = pts.reshape(b, r * s, 3)
            can_pts, _ = self.skinning(flat, None, inv_head_T,
                                       fixed_volume=skin_vol)
            if quad:
                quads, aux = self.field.field_inputs_quad(can_pts, planes)
                return (quads.reshape(b * r, s, quads.shape[-1]),
                        aux.reshape(b * r, s, aux.shape[-1]))
            x = self.field.field_inputs(can_pts, planes)
            return x.reshape(b * r, s, x.shape[-1])

        pts = ro[..., None, :] + rd[..., None, :] * z_vals[..., :, None]
        x = march_inputs(pts)

        flat = lambda a: a.reshape((B * R,) + a.shape[2:])
        zf = flat(z_vals)
        rdf = flat(rd)
        rd_norm = jnp.linalg.norm(rdf, axis=-1, keepdims=True)
        d = jnp.diff(zf, axis=-1)
        d = jnp.concatenate([d, d[..., -1:]], -1) * rd_norm

        params = self.field.mlp_params()
        if quad:
            rgbmap, weights, keeps = fused_march_coarse_quad(
                x[0], x[1], d.astype(jnp.float32), params)
        else:
            rgbmap, weights, keeps = fused_march_coarse(
                x, d.astype(jnp.float32), params)

        bgf = flat(background_prior)
        acc_c = jnp.sum(weights, axis=-1, keepdims=True)      # [B*R, 1]
        rgb_c = rgbmap.at[:, :3].add((1.0 - acc_c) * bgf)
        depth_c = jnp.sum(weights * zf, axis=-1, keepdims=True)

        out = {
            "rgb_coarse": rgb_c.reshape(B, R, -1),
            "depth_coarse": depth_c.reshape(B, R, 1),
            "acc_coarse": acc_c.reshape(B, R, 1),
            "weights_max": jnp.max(weights, axis=-1).reshape(B, R, 1),
            "rgb_fine": None, "depth_fine": None, "acc_fine": None,
        }
        if num_fine == 0:
            return out

        # hierarchical pass: det inverse-CDF samples + comparison-count merge
        # ranks (same math as the XLA path); compositing happens in CONCAT
        # order inside the kernel, so only depths/dists are reordered here.
        z_mid = 0.5 * (zf[..., 1:] + zf[..., :-1])
        z_samples = sample_pdf(z_mid, weights[..., 1:-1], num_fine, det=True)
        z_samples = jax.lax.stop_gradient(z_samples)

        a, b = zf[:, ::2], z_samples
        nA = a.shape[-1]
        pos_a = (jnp.arange(nA)
                 + jnp.sum(b[:, None, :] < a[:, :, None], axis=-1))
        pos_b = (jnp.arange(b.shape[-1])
                 + jnp.sum(a[:, :, None] <= b[:, None, :], axis=1))
        ranks = jnp.concatenate([pos_a, pos_b], axis=-1)      # [B*R, Sa]
        z_cat = jnp.concatenate([a, b], axis=-1)
        S_all = z_cat.shape[-1]
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S_all), 2)
        onehot = (ranks[:, :, None] == iota_s).astype(z_cat.dtype)
        z_all = jnp.einsum("rks,rk->rs", onehot, z_cat)
        d_sorted = jnp.diff(z_all, axis=-1)
        d_sorted = jnp.concatenate([d_sorted, d_sorted[..., -1:]], -1) * rd_norm
        d_concat = jnp.einsum("rks,rs->rk", onehot, d_sorted)

        z_new = z_samples.reshape(B, R, num_fine)
        pts_new = ro[..., None, :] + rd[..., None, :] * z_new[..., :, None]
        x_new = march_inputs(pts_new)

        if quad:
            rgbmap_f, w_concat = fused_march_fine_quad(
                x_new[0], x_new[1], keeps, d_concat.astype(jnp.float32),
                ranks, params, num_keep=num_coarse // 2)
        else:
            rgbmap_f, w_concat = fused_march_fine(
                x_new, keeps, d_concat.astype(jnp.float32), ranks, params,
                num_keep=num_coarse // 2)
        acc_f = jnp.sum(w_concat, axis=-1, keepdims=True)
        rgb_f = rgbmap_f.at[:, :3].add((1.0 - acc_f) * bgf)
        depth_f = jnp.sum(w_concat * z_cat, axis=-1, keepdims=True)

        out["rgb_fine"] = rgb_f.reshape(B, R, -1)
        out["depth_fine"] = depth_f.reshape(B, R, 1)
        out["acc_fine"] = acc_f.reshape(B, R, 1)
        out["weights_max"] = jnp.max(w_concat, axis=-1).reshape(B, R, 1)
        return out

    def render_chunked(
        self,
        ray_batch: jnp.ndarray,
        background_prior: jnp.ndarray,
        latent_code: jnp.ndarray,
        inv_head_T: jnp.ndarray,
        front_cond: jnp.ndarray,
        left_cond: jnp.ndarray,
        right_cond: jnp.ndarray,
        *,
        chunk_size: int = 16384,
        num_coarse: int = 64,
        num_fine: int = 16,
        perturb: bool = False,
        radiance_field_noise_std: float = 0.0,
        rng: Optional[jax.Array] = None,
        fixed_volume: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """Memory-bounded full-frame rendering: planes are generated once,
        then the ray axis is processed in device-side chunks via `lax.map`
        (the TPU replacement for the reference's host-side chunk loop,
        train_avatar.py:203-224 — no host round trips, one compiled program).
        Requires R % chunk_size == 0 (pad on the host if needed)."""
        B, R = ray_batch.shape[:2]
        assert R % chunk_size == 0, (R, chunk_size)
        n_chunks = R // chunk_size
        cond_c = inv_head_T.reshape(B, -1)
        planes = self.field.generate_planes(
            latent_code, cond_c, front_cond, left_cond, right_cond)
        skin_vol = (self.skinning.volume() if fixed_volume is None
                    else fixed_volume)

        rays_c = ray_batch.reshape(B, n_chunks, chunk_size, -1).transpose(1, 0, 2, 3)
        bg_c = background_prior.reshape(B, n_chunks, chunk_size, -1).transpose(1, 0, 2, 3)
        idx = jnp.arange(n_chunks)

        def one(args):
            rays, bg, i = args
            crng = jax.random.fold_in(rng, i) if rng is not None else None
            return self.render_rays(
                planes, rays, bg, inv_head_T,
                num_coarse=num_coarse, num_fine=num_fine, perturb=perturb,
                radiance_field_noise_std=radiance_field_noise_std,
                rng=crng, fixed_volume=skin_vol)

        outs = jax.lax.map(one, (rays_c, bg_c, idx))
        merged = {}
        for k, v in outs.items():
            if v is None:
                merged[k] = None
            else:
                merged[k] = v.transpose(1, 0, 2, 3).reshape(B, R, v.shape[-1])
        return merged

    def render_full_image(self, *args, **kwargs):
        """Stage-2/inference mode: rays cover a full render_size² image.

        Returns (render [B, H, W, C], mask [B, H, W, 1]) — the NHWC analogue
        of the reference's [B, C, 128, 128] (model/nerf_trainer.py:111-116).
        """
        out = self(*args, **kwargs)
        rgb = out["rgb_fine"] if out["rgb_fine"] is not None else out["rgb_coarse"]
        acc = out["acc_fine"] if out["acc_fine"] is not None else out["acc_coarse"]
        B = rgb.shape[0]
        s = self.render_size
        render = rgb.reshape(B, s, s, -1)
        mask = acc.reshape(B, s, s, 1)
        return render, mask


def latent_code_loss(latent_codes: jnp.ndarray, latent_code: jnp.ndarray) -> jnp.ndarray:
    """Regularize the selected codes toward the (stop-gradient) mean code
    (spec: model/nerf_trainer.py:102)."""
    mean = jax.lax.stop_gradient(jnp.mean(latent_codes, axis=0, keepdims=True))
    return jnp.mean(jnp.square(latent_code - mean))
