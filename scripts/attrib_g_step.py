"""Where does the stage-2 G step's 0.77 s/iter go?

Decomposes the joint NeRF+GAN G step (train/stage2.py g_step; reference
train_avatarHD.py:244-280) at the reference operating point (batch 2, 128²
render with 64+16 samples, 512² GAN) into:

  fwd_only      loss value only (render + G + D forward)
  g_only        grads w/ render DETACHED (G/D backward only)
  full          shipped g_step (remat render; NeRF+G backward)
  full_no_remat g_step without jax.checkpoint (if it fits at scan n=3)
  mse_only      nerf-only loss (rgb+mask), grads wrt nerf trainable

full - g_only ≈ NeRF backward (remat re-forward + field/gather backward +
plane-generator backward). g_only - fwd_only ≈ GAN backward. These bound the
payoff of a fused field-MLP custom_vjp (docs/PERF.md round-3 item 3) vs the
gather/scatter backward.

Device-resident timing per measurement rules (bench_train.py / PERF.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_train import scan_time, synth_batch  # noqa: E402


def main():
    import argparse

    from havatar_tpu.cli.common import resolve_config
    from havatar_tpu.models.renderer import AvatarRenderer, latent_code_loss
    from havatar_tpu.train import losses as L
    from havatar_tpu.train import stage2

    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", action="store_true",
                    help="use_pallas_mlp (fused field-MLP fwd+bwd kernels)")
    ap.add_argument("--bf16", action="store_true",
                    help="models.compute_dtype=bfloat16")
    ap.add_argument("--no-remat", action="store_true",
                    help="drop the outer render remat in every variant "
                         "(the --fused-mlp production operating point)")
    ap.add_argument("--detach-probes", action="store_true",
                    help="also measure full grads with planes / skin volume "
                         "stop_gradient'd (scatter-backward attribution)")
    flags = ap.parse_args()

    res = {}
    dev = jax.devices()[0]
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = dev

    cfg = resolve_config("singleview_512_HD_base.yml")
    if flags.fused:
        cfg.models.use_pallas_mlp = True
    if flags.bf16:
        cfg.models.compute_dtype = "bfloat16"
    base_remat = not flags.no_remat
    rng = jax.random.PRNGKey(2)
    batch = synth_batch(rng, B=2, R=128 * 128, full=True)
    example = {k: np.asarray(v) for k, v in batch.items()}
    with jax.default_device(cpu):
        models, st = stage2.init_state(cfg, rng, num_frames=4,
                                       example_batch=example)
    st = jax.device_put(st, dev)
    batch = jax.device_put(batch, dev)
    renderer, generator, discriminator = models

    nerf_cfg = cfg.nerf.train
    render_size = cfg.models.StyleUnet.inp_size
    gen_size = cfg.models.StyleUnet.out_size
    mask_weight = cfg.experiment.mask_weight
    n_latent = generator.n_latent

    def _rfi_detach(m, rays8, bg, latent, inv_T, front, left, right, rng,
                    detach_planes, detach_vol):
        """render_full_image with optional stop_gradient seams: planes
        (removes the quad-row scatter-add + plane-generator backward) and
        the skinning volume (removes the packed-row scatter-add + volume-
        decoder backward; the coordinate backward stays live)."""
        B = rays8.shape[0]
        cond_c = inv_T.reshape(B, -1)
        planes = m.field.generate_planes(latent, cond_c, front, left, right)
        if detach_planes:
            planes = jax.lax.stop_gradient(planes)
        vol = m.skinning.volume()
        if detach_vol:
            vol = jax.lax.stop_gradient(vol)
        out = m.render_rays(
            planes, rays8, bg, inv_T,
            num_coarse=nerf_cfg.num_coarse, num_fine=nerf_cfg.num_fine,
            perturb=bool(nerf_cfg.perturb),
            radiance_field_noise_std=float(nerf_cfg.radiance_field_noise_std),
            rng=rng, fixed_volume=vol)
        rgb = (out["rgb_fine"] if out["rgb_fine"] is not None
               else out["rgb_coarse"])
        acc = (out["acc_fine"] if out["acc_fine"] is not None
               else out["acc_coarse"])
        s = m.render_size
        return rgb.reshape(B, s, s, -1), acc.reshape(B, s, s, 1)

    def render_full(nerf_params, buffers, latent_codes, batch, rng,
                    detach_planes=False, detach_vol=False):
        rays = batch["mv_rays"]
        latent = latent_codes[batch["dataset_idx"]]
        render, mask = renderer.apply(
            {"params": nerf_params, "buffers": buffers},
            rays[..., :8], rays[..., 8:11], latent, batch["inv_head_T"],
            batch["front_render_cond"], batch["left_render_cond"],
            batch["right_render_cond"], rng,
            detach_planes, detach_vol, method=_rfi_detach)
        return render, mask, latent_code_loss(latent_codes, latent)

    def make_loss(state, batch, rng, detach_render, remat=True,
                  detach_planes=False, detach_vol=False):
        gt_hr = batch["gt_hr_img"]
        gt_lr_mask = batch["gt_lr_mask"]
        gt_lr_up = L.downsample_bilinear(
            L.downsample_bilinear(gt_hr, render_size), gen_size)
        glw = L.gan_loss_weight(state.step)
        rng_nerf, rng_style = jax.random.split(rng)
        kz, kmix, kidx, knoise = jax.random.split(rng_style, 4)
        z = jax.random.normal(kz, (2, gt_hr.shape[0], cfg.gan.latent))
        inject_index = jnp.where(jax.random.uniform(kmix) < cfg.gan.mixing,
                                 jax.random.randint(kidx, (), 1, n_latent),
                                 n_latent)

        rf = lambda p, lc: render_full(p, state.nerf_buffers, lc, batch,
                                       rng_nerf, detach_planes=detach_planes,
                                       detach_vol=detach_vol)
        if remat:
            rf = jax.checkpoint(rf)

        def loss_fn(trainable):
            nerf_params, latent_codes, g_params = trainable
            render, mask, code_loss = rf(nerf_params, latent_codes)
            if detach_render:
                render = jax.lax.stop_gradient(render)
                mask = jax.lax.stop_gradient(mask)
            lr_up = L.downsample_bilinear(render[..., :3], gen_size)
            nerf_loss = (jnp.mean(jnp.square(lr_up - gt_lr_up)) + code_loss
                         + mask_weight * L.binary_cross_entropy(mask,
                                                                gt_lr_mask))
            fake_img = generator.apply({"params": g_params}, [z[0], z[1]],
                                       render[..., 3:], noise_rng=knoise,
                                       inject_index=inject_index)
            fake_pred = discriminator.apply({"params": state.d_params},
                                            fake_img)
            adv = L.g_nonsaturating_loss(fake_pred)
            hr_l1 = jnp.mean(jnp.abs(fake_img - gt_hr))
            return nerf_loss + adv * glw + hr_l1

        return loss_fn

    trainable = (st.nerf_params, st.latent_codes, st.g_params)

    def timed(name, step_fn, n=3):
        nonlocal st
        st, res[name] = scan_time(step_fn, st, n=n)
        print(json.dumps({name: res[name]}), flush=True)

    def mk_step(detach, grad, remat=True, detach_planes=False,
                detach_vol=False):
        def step(state, i):
            loss_fn = make_loss(state, batch, jax.random.fold_in(rng, i),
                                detach_render=detach, remat=remat,
                                detach_planes=detach_planes,
                                detach_vol=detach_vol)
            tr = (state.nerf_params, state.latent_codes, state.g_params)
            if grad:
                val, grads = jax.value_and_grad(loss_fn)(tr)
                # consume grads so nothing is DCE'd; no optimizer (attribution)
                g_norm = sum(jnp.sum(jnp.abs(g))
                             for g in jax.tree_util.tree_leaves(grads))
                return state, {"v": val + 0.0 * g_norm}
            return state, {"v": loss_fn(tr)}
        return step

    timed("fwd_only_s", mk_step(detach=False, grad=False, remat=base_remat))
    timed("g_only_s", mk_step(detach=True, grad=True, remat=base_remat))
    timed("full_s", mk_step(detach=False, grad=True, remat=base_remat))
    if flags.detach_probes:
        # stop_gradient seams inside the live graph: full - no_planes ==
        # plane scatter + plane-gen bwd; full - no_vol == skin-volume
        # scatter + volume-decoder bwd
        timed("full_no_planes_s",
              mk_step(detach=False, grad=True, remat=base_remat,
                      detach_planes=True))
        timed("full_no_vol_s",
              mk_step(detach=False, grad=True, remat=base_remat,
                      detach_vol=True))
    if base_remat:
        try:
            timed("full_no_remat_s",
                  mk_step(detach=False, grad=True, remat=False))
        except Exception as e:  # OOM expected in scanned contexts
            res["full_no_remat_s"] = f"failed: {type(e).__name__}"
            print(res["full_no_remat_s"], flush=True)

    # nerf-only objective (no GAN in the graph at all)
    def mse_step(state, i):
        rng_i = jax.random.fold_in(rng, 1000 + i)
        gt_lr_mask = batch["gt_lr_mask"]
        gt_lr_up = L.downsample_bilinear(
            L.downsample_bilinear(batch["gt_hr_img"], render_size), gen_size)

        def loss_fn(tr):
            nerf_params, latent_codes = tr
            rf = lambda p, lc: render_full(p, state.nerf_buffers, lc, batch,
                                           rng_i)
            if base_remat:
                rf = jax.checkpoint(rf)
            render, mask, code_loss = rf(nerf_params, latent_codes)
            lr_up = L.downsample_bilinear(render[..., :3], gen_size)
            return (jnp.mean(jnp.square(lr_up - gt_lr_up)) + code_loss
                    + mask_weight * L.binary_cross_entropy(mask, gt_lr_mask))

        val, grads = jax.value_and_grad(loss_fn)(
            (state.nerf_params, state.latent_codes))
        g_norm = sum(jnp.sum(jnp.abs(g))
                     for g in jax.tree_util.tree_leaves(grads))
        return state, {"v": val + 0.0 * g_norm}

    timed("mse_only_s", mse_step)

    res["nerf_bwd_s"] = round(res["full_s"] - res["g_only_s"], 4)
    res["gan_bwd_s"] = round(res["g_only_s"] - res["fwd_only_s"], 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
