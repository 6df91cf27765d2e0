"""Stage-2 HD training: joint NeRF (full 128² render) + StyleUNet generator +
wavelet discriminator (the ``train_avatarHD.py`` capability, TPU-native).

Behavioral spec (train_avatarHD.py:181-377):
  D step  — no-grad NeRF full render; G(fake noise, feat image); logistic
            D loss × ramped gan weight (min(1e-3·1.1^(i//500), 0.1)).
  R1 step — every d_reg_every=16 iters, (r1/2)·R1·d_reg_every on real images.
  G step  — NeRF render WITH grads; low-res rgb MSE vs bilinear-downsampled
            GT + mask BCE + latent reg + adversarial + HR L1 + 0.1·LPIPS;
            ONE backward through generator AND NeRF (the feature image is NOT
            detached — gradients cross the NeRF/GAN seam, :245-260).
  EMA     — accumulate(g_ema, g, 0.5^(32/10k)) every iter.
  Optimizers: Adam(nerf, cfg lr), Adam(G, lr·g_ratio, β=(0, .99^ratio)),
            Adam(D, lr·d_ratio) (:117-122). Path-length reg is disabled in
            the reference loop (`if False`, :285) — mirrored here.

TPU design: three jitted steps (d_step, r1_step, g_step) with explicit
stop_gradient seams instead of requires_grad toggling; host decides the R1
cadence (static unrolling of the 16-step pattern is unnecessary).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from havatar_tpu.models.discriminator import WaveletDiscriminator
from havatar_tpu.models.generators import StyleUNetSR
from havatar_tpu.models.renderer import AvatarRenderer, latent_code_loss
from havatar_tpu.train import losses as L
from havatar_tpu.train.ema import ema_update
from havatar_tpu.train.lpips_jax import lpips_loss
from havatar_tpu.train.stage1 import build_renderer


class Stage2State(NamedTuple):
    step: jnp.ndarray
    nerf_params: Any
    nerf_buffers: Any
    latent_codes: jnp.ndarray
    g_params: Any
    d_params: Any
    g_ema_params: Any
    nerf_opt: Any
    g_opt: Any
    d_opt: Any


def build_models(cfg) -> Tuple[AvatarRenderer, StyleUNetSR, WaveletDiscriminator]:
    renderer = build_renderer(cfg)
    gan = cfg.gan
    # separate knob from models.compute_dtype: the NeRF side is where bf16
    # pays (gather/scatter tables); the GAN nets default to f32 (adversarial
    # training is the numerics-sensitive part). Params stay f32 either way.
    gan_dtype = cfg.models.get("gan_compute_dtype", "float32")
    generator = StyleUNetSR(
        inp_size=cfg.models.StyleUnet.inp_size,
        inp_ch=cfg.models.StyleUnet.inp_ch,
        out_ch=3, out_size=cfg.models.StyleUnet.out_size,
        style_dim=gan.latent, n_mlp=gan.n_mlp,
        channel_multiplier=gan.channel_multiplier,
        compute_dtype=gan_dtype)
    discriminator = WaveletDiscriminator(
        size=cfg.models.StyleUnet.out_size, img_channel=3,
        channel_multiplier=gan.channel_multiplier,
        compute_dtype=gan_dtype)
    return renderer, generator, discriminator


def make_optimizers(cfg):
    gan = cfg.gan
    g_ratio = gan.g_reg_every / (gan.g_reg_every + 1)
    d_ratio = gan.d_reg_every / (gan.d_reg_every + 1)
    g_opt = optax.adam(gan.lr * g_ratio, b1=0.0, b2=0.99 ** g_ratio)
    d_opt = optax.adam(gan.lr * d_ratio, b1=0.0, b2=0.99 ** d_ratio)
    nerf_opt = optax.adam(cfg.optimizer.lr)
    return nerf_opt, g_opt, d_opt


def make_steps(cfg, renderer: AvatarRenderer, generator: StyleUNetSR,
               discriminator: WaveletDiscriminator,
               lpips_params: Optional[Any] = None,
               remat_render: bool = True,
               mesh=None):
    """``mesh``: optional jax.sharding.Mesh with a ``data`` axis. When given
    (and >1 device), the per-step NeRF render runs under ``jax.shard_map``
    over the RAY axis — each device marches its ray shard with the full
    single-chip program, fused Pallas kernels included (GSPMD cannot
    partition a Pallas custom call; this is the training counterpart of
    infer/serving.py's shard_map route, round-2 verdict item 1). Gradients
    flow through the shard_map: the transpose of the replicated plane/param
    inputs is a psum of the per-shard cotangents, so the splat backward
    stays shard-local.

    The image networks (plane generators, SR generator, discriminator,
    LPIPS, R1) are also wrapped in shard_map — with fully REPLICATED specs,
    i.e. each device runs the identical full computation. This is a
    correctness guard, not an optimization: left to GSPMD's auto
    partitioner, the presence of the heavy render shard_map tips its cost
    model into spatially partitioning the conv stacks, and XLA:CPU's SPMD
    partitioning of the negative-padding upfirdn convs returns WRONG VALUES
    (observed: D(params, x) differing by >1.0 between the single-device and
    mesh programs on the 8-virtual-device CPU mesh; the replicated wrap
    restores bit-equality). They are ≲10% of the step, so replicating them
    costs little at v5e-8 scale.

    Per-shard stratified-sampling/noise keys are folded with the device
    index — bit-different from (statistically equivalent to) the
    single-device draw; exact-parity comparisons set perturb=False, noise 0
    (tests/test_train_steps.py::test_stage2_quad_shard_map_matches_single_device)."""
    gan = cfg.gan
    nerf_cfg = cfg.nerf.train
    render_size = cfg.models.StyleUnet.inp_size
    gen_size = cfg.models.StyleUnet.out_size
    mask_weight = cfg.experiment.mask_weight
    nerf_opt, g_opt, d_opt = make_optimizers(cfg)
    n_latent = generator.n_latent
    shard_render = mesh is not None and mesh.size > 1

    if shard_render:
        from jax.sharding import PartitionSpec as P

        def _rep(fn):
            """Run fn manually replicated on every device (GSPMD-proof)."""
            return jax.shard_map(fn, mesh=mesh, in_specs=P(), out_specs=P(),
                                 check_vma=False)
    else:
        def _rep(fn):
            return fn

    d_apply = _rep(lambda d_params, img: discriminator.apply(
        {"params": d_params}, img))

    def _apply_render_rays(nerf_vars, planes, rays8, bg, inv_T, rng):
        out = renderer.apply(
            nerf_vars, planes, rays8, bg, inv_T,
            num_coarse=nerf_cfg.num_coarse, num_fine=nerf_cfg.num_fine,
            perturb=bool(nerf_cfg.perturb),
            radiance_field_noise_std=float(nerf_cfg.radiance_field_noise_std),
            rng=rng, method=AvatarRenderer.render_rays)
        rgb = (out["rgb_fine"] if out["rgb_fine"] is not None
               else out["rgb_coarse"])
        acc = (out["acc_fine"] if out["acc_fine"] is not None
               else out["acc_coarse"])
        return rgb, acc

    def _gen_planes_m(m, latent, inv_T, front, left, right):
        cond_c = inv_T.reshape(latent.shape[0], -1)
        return m.field.generate_planes(latent, cond_c, front, left, right)

    def render_full(params, buffers, latent_codes, batch, rng):
        rays = batch["mv_rays"]
        latent = latent_codes[batch["dataset_idx"]]
        nerf_vars = {"params": params, "buffers": buffers}
        code_loss = latent_code_loss(latent_codes, latent)
        if shard_render:
            B, R = rays.shape[:2]
            assert R % mesh.size == 0, (R, mesh.size)
            planes = _rep(lambda v, lat, it, f, l, r: renderer.apply(
                v, lat, it, f, l, r, method=_gen_planes_m))(
                    nerf_vars, latent, batch["inv_head_T"],
                    batch["front_render_cond"], batch["left_render_cond"],
                    batch["right_render_cond"])

            def march_shard(nerf_vars, planes, rays8, bg, inv_T, rng):
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
                return _apply_render_rays(nerf_vars, planes, rays8, bg,
                                          inv_T, rng)

            rgb, acc = jax.shard_map(
                march_shard,
                mesh=mesh,
                in_specs=(P(), P(), P(None, "data"), P(None, "data"),
                          P(), P()),
                out_specs=(P(None, "data"), P(None, "data")),
                check_vma=False,
            )(nerf_vars, planes, rays[..., :8], rays[..., 8:11],
              batch["inv_head_T"], rng)
            s = renderer.render_size
            return (rgb.reshape(B, s, s, -1), acc.reshape(B, s, s, 1),
                    code_loss)
        render, mask = renderer.apply(
            nerf_vars,
            rays[..., :8], rays[..., 8:11], latent, batch["inv_head_T"],
            batch["front_render_cond"], batch["left_render_cond"],
            batch["right_render_cond"],
            num_coarse=nerf_cfg.num_coarse, num_fine=nerf_cfg.num_fine,
            perturb=bool(nerf_cfg.perturb),
            radiance_field_noise_std=float(nerf_cfg.radiance_field_noise_std),
            rng=rng, method=AvatarRenderer.render_full_image)
        return render, mask, code_loss

    def _gen_apply_pure(g_params, z0, z1, inject_index, cond, noise_rng):
        return generator.apply({"params": g_params}, [z0, z1], cond,
                               noise_rng=noise_rng,
                               inject_index=inject_index)

    gen_apply = _rep(_gen_apply_pure)

    def sample_styles(rng, batch):
        kz, kmix, kidx, knoise = jax.random.split(rng, 4)
        z = jax.random.normal(kz, (2, batch, gan.latent))
        mix = jax.random.uniform(kmix) < gan.mixing
        rand_idx = jax.random.randint(kidx, (), 1, n_latent)
        inject_index = jnp.where(mix, rand_idx, n_latent)
        return z[0], z[1], inject_index, knoise

    # ---------------- D step ----------------
    @jax.jit
    def d_step(state: Stage2State, batch, rng):
        rng_nerf, rng_style = jax.random.split(rng)
        render, _, _ = render_full(state.nerf_params, state.nerf_buffers,
                                   state.latent_codes, batch, rng_nerf)
        render = jax.lax.stop_gradient(render)
        z0, z1, inject_index, knoise = sample_styles(rng_style, render.shape[0])
        fake_img = gen_apply(state.g_params, z0, z1, inject_index,
                             render[..., 3:], knoise)
        fake_img = jax.lax.stop_gradient(fake_img)
        gt_hr = batch["gt_hr_img"]
        glw = L.gan_loss_weight(state.step)

        def loss_fn(d_params):
            fake_pred = d_apply(d_params, fake_img)
            real_pred = d_apply(d_params, gt_hr)
            d_loss = L.d_logistic_loss(real_pred, fake_pred)
            return d_loss * glw, (d_loss, jnp.mean(real_pred), jnp.mean(fake_pred))

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt_state = d_opt.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        metrics = {"d": aux[0], "real_score": aux[1], "fake_score": aux[2]}
        return state._replace(d_params=d_params, d_opt=d_opt_state), metrics

    # ---------------- R1 step ----------------
    @jax.jit
    def r1_step(state: Stage2State, batch):
        gt_hr = batch["gt_hr_img"]
        glw = L.gan_loss_weight(state.step)

        def loss_fn(d_params):
            r1 = _rep(lambda p, img: L.d_r1_penalty(
                lambda pp, im: discriminator.apply({"params": pp}, im),
                p, img))(d_params, gt_hr)
            return (gan.r1 / 2.0) * r1 * glw * gan.d_reg_every, r1

        (_, r1), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt_state = d_opt.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state._replace(d_params=d_params, d_opt=d_opt_state), {"r1": r1}

    # ---------------- G step (joint NeRF + G) ----------------
    accum = 0.5 ** (32.0 / (10 * 1000))

    @jax.jit
    def g_step(state: Stage2State, batch, rng):
        rng_nerf, rng_style = jax.random.split(rng)
        gt_hr = batch["gt_hr_img"]
        gt_lr_mask = batch["gt_lr_mask"]
        # low-res target: down- then up-sampled GT (train_avatarHD.py:202-204)
        gt_lr = L.downsample_bilinear(gt_hr, render_size)
        glw = L.gan_loss_weight(state.step)
        z0, z1, inject_index, knoise = sample_styles(rng_style, gt_hr.shape[0])
        # exact reference objective (train_avatarHD.py:202-204,246-247): both
        # the 128² render and the down-sampled GT are bilinearly upsampled
        # back to 512² before the MSE — a reweighted MSE whose magnitude
        # (hence its balance against mask/adv/L1 terms) differs from
        # comparing at 128² directly.
        gt_lr_up = L.downsample_bilinear(gt_lr, gen_size)

        # remat the render (math-identical; recomputed in the backward):
        # the G graph's peak sits within ~100 MB of a 16 GB chip at the
        # reference operating point, and tips over inside a lax.scan
        render_g = lambda nerf_params, latent_codes: render_full(
            nerf_params, state.nerf_buffers, latent_codes, batch, rng_nerf)
        if remat_render:
            render_g = jax.checkpoint(render_g)

        def loss_fn(trainable):
            nerf_params, latent_codes, g_params = trainable
            render, mask, code_loss = render_g(nerf_params, latent_codes)
            lr_img = render[..., :3]
            lr_up = L.downsample_bilinear(lr_img, gen_size)
            rgb_loss = jnp.mean(jnp.square(lr_up - gt_lr_up))
            nerf_loss = rgb_loss + code_loss
            mask_loss = jnp.zeros(())
            if mask_weight > 0:
                mask_loss = L.binary_cross_entropy(mask, gt_lr_mask)
                nerf_loss = nerf_loss + mask_weight * mask_loss

            fake_img = gen_apply(g_params, z0, z1, inject_index,
                                 render[..., 3:], knoise)
            fake_pred = d_apply(state.d_params, fake_img)
            adv = L.g_nonsaturating_loss(fake_pred)
            hr_l1 = jnp.mean(jnp.abs(fake_img - gt_hr))
            total = nerf_loss + adv * glw + hr_l1
            percep = jnp.zeros(())
            if lpips_params is not None:
                percep = _rep(lpips_loss)(lpips_params, fake_img, gt_hr)
                total = total + 0.1 * percep
            aux = {"rgb_loss": rgb_loss, "mask_loss": mask_loss,
                   "code_loss": code_loss, "nerf_loss": nerf_loss,
                   "g": adv, "hr_l1": hr_l1, "percep": percep,
                   "psnr": L.mse2psnr(rgb_loss),
                   "SR_psnr": L.mse2psnr(jnp.mean(jnp.square(fake_img - gt_hr)))}
            return total, aux

        trainable = (state.nerf_params, state.latent_codes, state.g_params)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        nerf_grads = (grads[0], grads[1])
        g_grads = grads[2]
        nerf_updates, nerf_opt_state = nerf_opt.update(
            nerf_grads, state.nerf_opt, (state.nerf_params, state.latent_codes))
        nerf_params, latent_codes = optax.apply_updates(
            (state.nerf_params, state.latent_codes), nerf_updates)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        g_ema = ema_update(state.g_ema_params, g_params, accum)
        new_state = state._replace(
            step=state.step + 1,
            nerf_params=nerf_params, latent_codes=latent_codes,
            g_params=g_params, g_ema_params=g_ema,
            nerf_opt=nerf_opt_state, g_opt=g_opt_state)
        return new_state, aux

    # ---------------- fused fast step (D + G in one program) ----------------
    # The reference renders the NeRF TWICE per iteration — no-grad for the
    # D step (train_avatarHD.py:215) and with grads for the G step (:245).
    # With identical params/batch the two renders differ only by the
    # perturb/sigma-noise RNG. The fast step draws ONE rng, so XLA CSEs the
    # whole forward render (and the fake image fed to D) between the two
    # losses — one full render + one G(render) instead of two of each.
    # Parity mode (the separate d_step/g_step above) remains the default.
    @jax.jit
    def dg_step(state: Stage2State, batch, rng):
        rng_nerf, rng_style = jax.random.split(rng)
        gt_hr = batch["gt_hr_img"]
        gt_lr_mask = batch["gt_lr_mask"]
        gt_lr = L.downsample_bilinear(gt_hr, render_size)
        gt_lr_up = L.downsample_bilinear(gt_lr, gen_size)
        glw = L.gan_loss_weight(state.step)
        z0, z1, inject_index, knoise = sample_styles(rng_style, gt_hr.shape[0])

        # remat the NeRF render: the fused step's single graph otherwise
        # holds G-backward activations AND the D fwd/bwd live together,
        # which exceeds a 16 GB chip at the reference operating point —
        # recomputing the render in the backward bounds the peak
        render_ckpt = lambda nerf_params, latent_codes: render_full(
            nerf_params, state.nerf_buffers, latent_codes, batch, rng_nerf)
        if remat_render:
            render_ckpt = jax.checkpoint(render_ckpt)

        def g_loss_fn(trainable):
            nerf_params, latent_codes, g_params = trainable
            render, mask, code_loss = render_ckpt(nerf_params, latent_codes)
            lr_up = L.downsample_bilinear(render[..., :3], gen_size)
            rgb_loss = jnp.mean(jnp.square(lr_up - gt_lr_up))
            nerf_loss = rgb_loss + code_loss
            mask_loss = jnp.zeros(())
            if mask_weight > 0:
                mask_loss = L.binary_cross_entropy(mask, gt_lr_mask)
                nerf_loss = nerf_loss + mask_weight * mask_loss
            fake_img = gen_apply(g_params, z0, z1, inject_index,
                                 render[..., 3:], knoise)
            fake_pred = d_apply(state.d_params, fake_img)
            adv = L.g_nonsaturating_loss(fake_pred)
            hr_l1 = jnp.mean(jnp.abs(fake_img - gt_hr))
            total = nerf_loss + adv * glw + hr_l1
            percep = jnp.zeros(())
            if lpips_params is not None:
                percep = _rep(lpips_loss)(lpips_params, fake_img, gt_hr)
                total = total + 0.1 * percep
            aux = {"rgb_loss": rgb_loss, "mask_loss": mask_loss,
                   "code_loss": code_loss, "nerf_loss": nerf_loss,
                   "g": adv, "hr_l1": hr_l1, "percep": percep,
                   "psnr": L.mse2psnr(rgb_loss),
                   "SR_psnr": L.mse2psnr(
                       jnp.mean(jnp.square(fake_img - gt_hr))),
                   "fake_img": jax.lax.stop_gradient(fake_img)}
            return total, aux

        trainable = (state.nerf_params, state.latent_codes, state.g_params)
        (_, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(trainable)
        fake_img = aux.pop("fake_img")

        # D loss on the SAME fake image (stop-gradient) — XLA shares the
        # forward render/generator work with the G backward above
        def d_loss_fn(d_params):
            fake_pred = d_apply(d_params, fake_img)
            real_pred = d_apply(d_params, gt_hr)
            d_loss = L.d_logistic_loss(real_pred, fake_pred)
            return d_loss * glw, (d_loss, jnp.mean(real_pred),
                                  jnp.mean(fake_pred))

        (_, d_aux), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt,
                                              state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        nerf_updates, nerf_opt_state = nerf_opt.update(
            (grads[0], grads[1]), state.nerf_opt,
            (state.nerf_params, state.latent_codes))
        nerf_params, latent_codes = optax.apply_updates(
            (state.nerf_params, state.latent_codes), nerf_updates)
        g_updates, g_opt_state = g_opt.update(grads[2], state.g_opt,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        g_ema = ema_update(state.g_ema_params, g_params, accum)
        aux.update({"d": d_aux[0], "real_score": d_aux[1],
                    "fake_score": d_aux[2]})
        new_state = state._replace(
            step=state.step + 1,
            nerf_params=nerf_params, latent_codes=latent_codes,
            g_params=g_params, d_params=d_params, g_ema_params=g_ema,
            nerf_opt=nerf_opt_state, g_opt=g_opt_state, d_opt=d_opt_state)
        return new_state, aux

    return d_step, r1_step, g_step, dg_step


def init_state(cfg, rng: jax.Array, num_frames: int,
               example_batch: Dict[str, np.ndarray]) -> Tuple[Tuple, Stage2State]:
    renderer, generator, discriminator = build_models(cfg)
    r_nerf, r_g, r_d = jax.random.split(rng, 3)
    b = example_batch
    B = b["mv_rays"].shape[0]

    variables = renderer.init(
        r_nerf,
        jnp.asarray(b["mv_rays"][..., :8]), jnp.asarray(b["mv_rays"][..., 8:11]),
        jnp.zeros((B, cfg.experiment.latent_code_dim)),
        jnp.asarray(b["inv_head_T"]),
        jnp.asarray(b["front_render_cond"]), jnp.asarray(b["left_render_cond"]),
        jnp.asarray(b["right_render_cond"]),
        num_coarse=4, num_fine=2, perturb=False)

    z = jnp.zeros((B, cfg.gan.latent))
    cond = jnp.zeros((B, cfg.models.StyleUnet.inp_size,
                      cfg.models.StyleUnet.inp_size, cfg.models.StyleUnet.inp_ch))
    g_vars = generator.init(r_g, z, cond)
    img = jnp.zeros((max(B, 2), cfg.models.StyleUnet.out_size,
                     cfg.models.StyleUnet.out_size, 3))
    d_vars = discriminator.init(r_d, img)

    latent_codes = jnp.zeros((num_frames, cfg.experiment.latent_code_dim))
    nerf_opt, g_opt, d_opt = make_optimizers(cfg)
    state = Stage2State(
        step=jnp.zeros((), jnp.int32),
        nerf_params=variables["params"], nerf_buffers=variables["buffers"],
        latent_codes=latent_codes,
        g_params=g_vars["params"], d_params=d_vars["params"],
        g_ema_params=jax.tree_util.tree_map(lambda x: x, g_vars["params"]),
        nerf_opt=nerf_opt.init((variables["params"], latent_codes)),
        g_opt=g_opt.init(g_vars["params"]),
        d_opt=d_opt.init(d_vars["params"]))
    return (renderer, generator, discriminator), state
