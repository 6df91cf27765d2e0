"""Stage-1 NeRF training (the ``train_avatar.py`` capability, TPU-native).

Behavioral spec (train_avatar.py:31-324): per-frame latent codes, coarse+fine
MSE, BCE mask loss on acc (weight cfg.experiment.mask_weight), optional
64²-patch LPIPS·0.05, latent regularization, skin-weight TV·1e-4, Adam with
exponential lr decay floored at 5e-5, skinning-volume pretrain on fresh runs,
periodic validation renders + PSNR, periodic checkpoints.

TPU design: ONE jitted train_step containing the full forward/backward —
no ray chunking (rays are a single batched axis, shardable over the mesh),
explicit RNG threading, optax Adam with injected schedule, data-parallel by
sharding the frame batch over the ``data`` mesh axis (gradient psum inserted
by the compiler).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from havatar_tpu.models.renderer import AvatarRenderer, latent_code_loss
from havatar_tpu.models.skinning import make_volume_pts
from havatar_tpu.ops import BoxWarp, grid_sample_3d
from havatar_tpu.train import losses as L
from havatar_tpu.train.lpips_jax import lpips_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any              # renderer "params" collection
    buffers: Any             # renderer "buffers" collection (fixed seeds)
    latent_codes: jnp.ndarray
    opt_state: Any


def build_renderer(cfg) -> AvatarRenderer:
    coarse = cfg.models.coarse
    return AvatarRenderer(
        xyz_bounding=tuple(tuple(b) for b in coarse.XYZ_bounding),
        latent_code_dim=cfg.experiment.latent_code_dim,
        cond_pose=cfg.experiment.cond_pose,
        num_encoding_fn_xyz=coarse.get("num_encoding_fn_xyz", 8),
        plane_feat_dim=coarse.get("plane_feat_dim", 64),
        plane_res=coarse.get("plane_res", 128),
        plane_middle_size=coarse.get("plane_middle_size", 16),
        enc_mode=coarse.get("enc_mode", "split"),
        skin_vol_res=coarse.get("skin_vol_res", 64),
        feat_dim=cfg.models.StyleUnet.inp_ch,
        compute_dtype=cfg.models.get("compute_dtype", "float32"),
        # the skinning volume's gather dtype under bf16 compute. The custom
        # grid-sample VJP accumulates its splat backward in f32 regardless
        # of the volume dtype (ops/grid_sample.py — bf16 scatter lowers ~2x
        # slower), so bf16 training can now take the 64 B-row fetch win
        # that was previously inference-only; "float32" remains the default
        # for exact-parity training.
        skin_compute_dtype=cfg.models.get("skin_compute_dtype", "float32"),
        render_size=cfg.models.StyleUnet.inp_size,
        cond_res=cfg.dataset.cond_render_res,
        # fused Pallas field MLP (fwd AND bwd kernels — ops/pallas_mlp.py);
        # TPU-only: the kernels don't run uncompiled off-TPU
        use_pallas_mlp=bool(cfg.models.get("use_pallas_mlp", False)),
        use_pallas_mlp_quad=bool(cfg.models.get("use_pallas_mlp_quad",
                                                False)),
    )


def make_optimizer(cfg) -> optax.GradientTransformation:
    schedule = functools.partial(
        L.stage1_lr, base_lr=cfg.optimizer.lr,
        decay_factor=cfg.scheduler.lr_decay_factor,
        decay_kilosteps=cfg.scheduler.lr_decay,
        floor=cfg.scheduler.get("lr_floor", 5e-5))
    return optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )


def init_state(cfg, rng: jax.Array, num_frames: int,
               example_batch: Dict[str, np.ndarray]) -> Tuple[AvatarRenderer, TrainState]:
    model = build_renderer(cfg)
    b = example_batch
    variables = model.init(
        rng,
        jnp.asarray(b["mv_rays"][..., :8]),
        jnp.asarray(b["mv_rays"][..., 8:11]),
        jnp.zeros((b["mv_rays"].shape[0], cfg.experiment.latent_code_dim)),
        jnp.asarray(b["inv_head_T"]),
        jnp.asarray(b["front_render_cond"]),
        jnp.asarray(b["left_render_cond"]),
        jnp.asarray(b["right_render_cond"]),
        num_coarse=4, num_fine=2, perturb=False)
    params, buffers = variables["params"], variables["buffers"]
    latent_codes = jnp.zeros((num_frames, cfg.experiment.latent_code_dim))
    opt = make_optimizer(cfg)
    opt_state = opt.init((params, latent_codes))
    return model, TrainState(jnp.zeros((), jnp.int32), params, buffers,
                             latent_codes, opt_state)


def make_loss_fn(model: AvatarRenderer, cfg,
                 lpips_params: Optional[Any] = None,
                 mesh=None):
    """The stage-1 loss as a pure fn(trainable, buffers, batch, rng) ->
    (loss, metrics). Public so sharding oracles (``__graft_entry__``) can
    compare raw gradients — post-Adam params are scale-invariant on the
    first step and would hide a wrong cross-device mean.

    ``mesh``: optional Mesh with a ``data`` axis — routes the render
    through ``jax.shard_map`` over the ray axis so the fused Pallas kernels
    survive multi-chip, with the plane generators (and patch-LPIPS) run
    manually replicated. Same design and rationale as stage2.make_steps;
    per-shard perturb/noise keys are folded with the device index."""
    nerf_cfg = cfg.nerf.train
    mask_weight = cfg.experiment.mask_weight
    use_patch = bool(cfg.experiment.get("patch_rgb", False)) and lpips_params is not None
    use_l1 = cfg.experiment.rgb_loss != "mse"
    shard_render = mesh is not None and mesh.size > 1

    if shard_render:
        from jax.sharding import PartitionSpec as P

        def _rep(fn):
            return jax.shard_map(fn, mesh=mesh, in_specs=P(), out_specs=P(),
                                 check_vma=False)
    else:
        def _rep(fn):
            return fn

    def rgb_loss_fn(a, b):
        return (jnp.mean(jnp.abs(a - b)) if use_l1
                else jnp.mean(jnp.square(a - b)))

    def _gen_planes_m(m, latent, inv_T, front, left, right):
        cond_c = inv_T.reshape(latent.shape[0], -1)
        return m.field.generate_planes(latent, cond_c, front, left, right)

    def _render_sharded(nerf_vars, batch, latent, rng):
        from havatar_tpu.models.renderer import AvatarRenderer as AR

        rays = batch["mv_rays"]
        assert rays.shape[1] % mesh.size == 0, (rays.shape, mesh.size)
        planes = _rep(lambda v, lat, it, f, l, r: model.apply(
            v, lat, it, f, l, r, method=_gen_planes_m))(
                nerf_vars, latent, batch["inv_head_T"],
                batch["front_render_cond"], batch["left_render_cond"],
                batch["right_render_cond"])

        def march(nerf_vars, planes, rays8, bg, inv_T, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            return model.apply(
                nerf_vars, planes, rays8, bg, inv_T,
                num_coarse=nerf_cfg.num_coarse, num_fine=nerf_cfg.num_fine,
                perturb=bool(nerf_cfg.perturb),
                radiance_field_noise_std=float(
                    nerf_cfg.radiance_field_noise_std),
                rng=rng, method=AR.render_rays)

        from jax.sharding import PartitionSpec as P
        sh = P(None, "data")
        # every render_rays output is [B, R, ...] — one spec broadcasts
        # over the whole output pytree (None leaves are empty subtrees)
        return jax.shard_map(
            march, mesh=mesh,
            in_specs=(P(), P(), sh, sh, P(), P()),
            out_specs=sh,
            check_vma=False,
        )(nerf_vars, planes, rays[..., :8], rays[..., 8:11],
          batch["inv_head_T"], rng)

    def loss_fn(trainable, buffers, batch, rng):
        params, latent_codes = trainable
        rays = batch["mv_rays"]
        ray_mask = rays[..., -1:]
        latent = latent_codes[batch["dataset_idx"]]

        if shard_render:
            out = _render_sharded({"params": params, "buffers": buffers},
                                  batch, latent, rng)
        else:
            out = model.apply(
                {"params": params, "buffers": buffers},
                rays[..., :8], rays[..., 8:11], latent, batch["inv_head_T"],
                batch["front_render_cond"], batch["left_render_cond"],
                batch["right_render_cond"],
                num_coarse=nerf_cfg.num_coarse, num_fine=nerf_cfg.num_fine,
                perturb=bool(nerf_cfg.perturb),
                radiance_field_noise_std=float(
                    nerf_cfg.radiance_field_noise_std),
                rng=rng)

        target = batch["gt_color"]
        coarse_loss = rgb_loss_fn(out["rgb_coarse"][..., :3], target)
        mask_coarse = L.binary_cross_entropy(out["acc_coarse"], ray_mask)
        loss = coarse_loss + mask_weight * mask_coarse

        metrics = {"coarse_loss": coarse_loss, "mask_coarse_loss": mask_coarse}
        if out["rgb_fine"] is not None:
            fine_loss = rgb_loss_fn(out["rgb_fine"][..., :3], target)
            mask_fine = L.binary_cross_entropy(out["acc_fine"], ray_mask)
            loss = loss + fine_loss + mask_weight * mask_fine
            metrics["fine_loss"] = fine_loss
            metrics["mask_fine_loss"] = mask_fine
            psnr_mse = jnp.mean(jnp.square(out["rgb_fine"][..., :3] - target))
        else:
            psnr_mse = jnp.mean(jnp.square(out["rgb_coarse"][..., :3] - target))

        if use_patch:
            rgb = (out["rgb_fine"] if out["rgb_fine"] is not None
                   else out["rgb_coarse"])[..., :3]
            B, R = rgb.shape[:2]
            ps = int(R ** 0.5)
            patch_loss = _rep(lpips_loss)(
                lpips_params, rgb.reshape(B, ps, ps, 3),
                target.reshape(B, ps, ps, 3))
            loss = loss + 0.05 * patch_loss
            metrics["patch_percep_loss"] = patch_loss

        code_loss = latent_code_loss(latent_codes, latent)
        loss = loss + code_loss

        # skin-weight TV regularization (spec: train_avatar.py:124-129)
        vol = model.apply({"params": params, "buffers": buffers},
                          method=AvatarRenderer.skin_volume)
        sw_loss = L.skin_weight_tv_loss(vol[0, :, :, :, 1])
        loss = loss + 1e-4 * sw_loss

        metrics.update({"loss": loss, "code_loss": code_loss,
                        "sw_grad_loss": sw_loss,
                        "psnr": L.mse2psnr(psnr_mse)})
        return loss, metrics

    return loss_fn


def make_train_step(model: AvatarRenderer, cfg,
                    lpips_params: Optional[Any] = None,
                    mesh=None):
    """Returns a jitted train_step(state, batch, rng) -> (state, metrics).
    ``mesh``: see make_loss_fn — shard_map render route for the fused
    Pallas kernel paths on multi-chip."""
    opt = make_optimizer(cfg)
    loss_fn = make_loss_fn(model, cfg, lpips_params, mesh=mesh)

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.params, state.latent_codes), state.buffers, batch, rng)
        updates, opt_state = opt.update(grads, state.opt_state,
                                        (state.params, state.latent_codes))
        params, latent_codes = optax.apply_updates(
            (state.params, state.latent_codes), updates)
        return TrainState(state.step + 1, params, state.buffers,
                          latent_codes, opt_state), metrics

    return train_step


# ---------------------------------------------------------------------------
# Skinning-volume pretraining (spec: model/Skinning_Field.py:101-125, invoked
# with num_iter=3000, vol_thr=Head_bounding at train_avatar.py:94-95).
# ---------------------------------------------------------------------------

def pretrain_skinning(model: AvatarRenderer, params, buffers, rng: jax.Array,
                      head_bounding, num_iter: int = 3000, lr: float = 1e-3,
                      steps: int = 20):
    """BCE-fit the head-follow weight channel to a box prior. Returns updated
    renderer params."""
    thr = jnp.asarray(head_bounding, dtype=jnp.float32)  # [3, 2]

    xb, yb, zb = [list(b) for b in model.xyz_bounding]
    yb[0] = 0.3 * yb[1]
    from havatar_tpu.ops import get_box_warp_param

    scales, trans = get_box_warp_param(xb, yb, zb)
    warp = BoxWarp(scales, trans)

    opt = optax.adam(lr)
    skin_params = params["skinning"]
    opt_state = opt.init(skin_params)

    def loss_fn(skin_p, step_rng):
        pts = make_volume_pts(steps=steps, rng=step_rng, warp=warp)
        inside = jnp.all((pts > thr[:, 0]) & (pts < thr[:, 1]), axis=-1)
        target = inside.astype(jnp.float32)[:, None]
        merged = dict(params)
        merged["skinning"] = skin_p
        vol = model.apply({"params": merged, "buffers": buffers},
                          method=AvatarRenderer.skin_volume)
        w = grid_sample_3d(vol[..., 1:2], warp(pts)[None], "border")[0]
        w = jnp.clip(w, 0.0, 1.0)
        return L.binary_cross_entropy(w, target, clip=(1e-7, 1 - 1e-7))

    def step_fn(carry, step_rng):
        skin_p, opt_s = carry
        loss, grads = jax.value_and_grad(loss_fn)(skin_p, step_rng)
        updates, opt_s = opt.update(grads, opt_s, skin_p)
        skin_p = optax.apply_updates(skin_p, updates)
        return (skin_p, opt_s), loss

    carry = (skin_params, opt_state)
    rngs = jax.random.split(rng, num_iter)
    carry, loss_hist = jax.jit(
        lambda c, r: jax.lax.scan(step_fn, c, r))(carry, rngs)
    new_params = dict(params)
    new_params["skinning"] = carry[0]
    return new_params, loss_hist
