"""Stage-2 HD (NeRF + StyleUNet GAN) training CLI (capability parity with the
reference's ``train_avatarHD.py``; SURVEY.md §2.4, call stack §3.2).

Usage:
  python -m havatar_tpu.cli.train_avatarHD --datadir DATA --logdir LOGS \
      --ckpt STAGE1_CKPT [--continue-training] [--config ...]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from havatar_tpu.checkpoints import CheckpointManager, convert
from havatar_tpu.cli.common import resolve_config, seed_everything, to_device_batch
from havatar_tpu.data import AvatarDataset, Loader, device_prefetch, infinite
from havatar_tpu.train import stage2
from havatar_tpu.utils.logging_util import MetricsWriter, timestamp
from havatar_tpu.utils.preemption import install as install_preemption, should_stop
from havatar_tpu.utils.profiling import StepTimer


def prepare_batch(batch, gen_size: int, render_size: int):
    """Reshape the loader's flat arrays into the stage-2 image tensors
    (spec analogue: train_avatarHD.py:188-198)."""
    B = batch["mv_rays"].shape[0]
    out = dict(batch)
    out["gt_hr_img"] = batch["gt_color"].reshape(B, gen_size, gen_size, 3)
    out["gt_lr_mask"] = batch["mv_rays"][..., -1:].reshape(
        B, render_size, render_size, 1)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", type=str, required=True)
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--config", type=str, default="singleview_512_HD_base.yml")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--lpips-weights", type=str, default="lpips_vgg.npz",
                   help="converted LPIPS-VGG weights (.npz); perceptual loss "
                        "terms activate when the file exists")
    p.add_argument("--continue-training", action="store_true")
    p.add_argument("--max-iters", type=int, default=0)
    p.add_argument("--fast-step", action="store_true",
                   help="fused D+G step: shares the per-iteration NeRF "
                        "render between the D and G losses (~one render "
                        "instead of two). Deviates from the reference's "
                        "alternating update in two documented ways: one "
                        "shared rng draw for both renders, and G plays "
                        "against the pre-update D")
    p.add_argument("--fused-mlp", action="store_true",
                   help="run the field MLP as the fused Pallas kernel pair "
                        "(fwd + custom_vjp bwd, ops/pallas_mlp.py) and drop "
                        "the outer render remat: the kernel's in-VMEM "
                        "recompute keeps residuals small enough that the "
                        "un-rematted graph fits a 16 GB chip, skipping the "
                        "remat re-forward (0.79 -> 0.59 s/iter measured at "
                        "the reference operating point, docs/PERF.md). "
                        "Math-identical (grad-checked vs XLA autodiff)")
    p.add_argument("--fused-quad", action="store_true",
                   help="fuse gather -> corner reduce -> field MLP under "
                        "one custom_vjp (ops/pallas_mlp_quad.py): the "
                        "training counterpart of the inference march "
                        "kernels' quad-consuming input contract — removes "
                        "the corner-einsum and MLP-input HBM round-trips "
                        "from the G step in both directions. Implies the "
                        "no-remat graph like --fused-mlp; math-identical "
                        "(oracle-tested, tests/test_pallas_mlp_quad.py)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 NeRF compute (matmul inputs + gather/"
                        "scatter tables; f32 accumulation, geometry, and "
                        "GAN nets). Opt-in speed mode: training numerics "
                        "differ from the f32 reference. With --fused-mlp "
                        "this is the fastest measured step (0.54 s/iter vs "
                        "0.97 baseline, docs/PERF.md)")
    p.add_argument("--sorted-scatter", action="store_true",
                   help="sort the backward splats (plane/volume gradient "
                        "scatter-adds) by destination row before scattering "
                        "(ops/grid_sample.py SORTED_SCATTER). A/B'd by "
                        "scripts/probe_scatter.py; measured numbers in "
                        "docs/PERF.md")
    p.add_argument("--turbo", action="store_true",
                   help="every measured training speed lever at once: "
                        "--fast-step --fused-quad --bf16 (fastest measured "
                        "combination, docs/PERF.md). Numerics differ from "
                        "the f32 reference only via bf16 compute; the quad "
                        "custom_vjp itself is math-identical")
    args = p.parse_args()
    if args.turbo:
        args.fast_step = args.fused_quad = args.bf16 = True

    install_preemption()
    cfg = resolve_config(args.config)
    if args.fused_mlp:
        cfg.models.use_pallas_mlp = True
    if args.fused_quad:
        cfg.models.use_pallas_mlp_quad = True
    if args.bf16:
        cfg.models.compute_dtype = "bfloat16"
    if args.sorted_scatter:
        from havatar_tpu.ops import grid_sample as _gs
        _gs.SORTED_SCATTER = True
    rng = seed_everything(cfg.experiment.randomseed)
    render_size = cfg.models.StyleUnet.inp_size
    gen_size = cfg.models.StyleUnet.out_size

    os.makedirs(args.logdir, exist_ok=True)
    writer = MetricsWriter(args.logdir)
    with open(os.path.join(args.logdir, "config.yml"), "w") as f:
        f.write(cfg.dump())

    split = os.path.join(args.datadir, "sv_v31_all.json")
    train_ds = AvatarDataset(split, "train", cfg,
                             down_sample=cfg.dataset.down_sample,
                             full_image=True)
    loader = Loader(train_ds, batch_size=cfg.gan.batch,
                    seed=cfg.experiment.randomseed)

    rng, init_rng = jax.random.split(rng)
    example = prepare_batch(
        next(iter(Loader(train_ds, batch_size=cfg.gan.batch, shuffle=False,
                         num_workers=1))), gen_size, render_size)
    models, state = stage2.init_state(cfg, init_rng, len(train_ds), example)
    renderer, generator, discriminator = models

    # warm start / resume (spec: train_avatarHD.py:137-159)
    if args.ckpt and os.path.exists(args.ckpt):
        if args.ckpt.endswith((".pt", ".ckpt")):
            # torch checkpoint from the reference (or our converter target)
            if args.continue_training:
                conv = convert.convert_stage2_checkpoint(args.ckpt)
                state = state._replace(
                    nerf_params=conv["variables"]["params"],
                    nerf_buffers=conv["variables"]["buffers"],
                    latent_codes=jnp.asarray(conv["latent_codes"]),
                    g_params=conv["g"]["params"],
                    d_params=conv["d"]["params"],
                    g_ema_params=conv["g_ema"]["params"])
            else:
                conv = convert.convert_stage1_checkpoint(args.ckpt)
                state = state._replace(
                    nerf_params=conv["variables"]["params"],
                    nerf_buffers=conv["variables"]["buffers"])
                if conv["latent_codes"] is not None:
                    state = state._replace(
                        latent_codes=jnp.asarray(conv["latent_codes"]))
                pre = "pretrained_models/img_translation.ckpt"
                if os.path.exists(pre):
                    gconv = convert.convert_stage2_checkpoint(pre)
                    state = state._replace(g_params=gconv["g"]["params"],
                                           d_params=gconv["d"]["params"],
                                           g_ema_params=gconv["g_ema"]["params"])
        elif args.continue_training:
            # stage-2 orbax dir: full training state
            restored = CheckpointManager(args.ckpt).restore(
                template=state._asdict())
            if restored is not None:
                state = stage2.Stage2State(**restored)
        else:
            # stage-1 orbax dir: warm-start the NeRF side only (the
            # reference's default --ckpt semantics, train_avatarHD.py:
            # 137-159). Raw restore — the stage-1 TrainState tree
            # (params/buffers/latent_codes/opt_state) is not Stage2State.
            raw = CheckpointManager(args.ckpt).restore()
            if raw is not None:
                if "params" not in raw:
                    raise SystemExit(
                        f"{args.ckpt} holds a stage-2 checkpoint "
                        f"(keys {sorted(raw)[:4]}…); pass "
                        f"--continue-training to resume stage-2 from it")
                state = state._replace(
                    nerf_params=raw["params"],
                    nerf_buffers=raw["buffers"],
                    latent_codes=jnp.asarray(raw["latent_codes"]))

    from havatar_tpu.train.lpips_jax import load_lpips_file

    lpips_params = load_lpips_file(args.lpips_weights)
    if lpips_params is None:
        # the reference ALWAYS applies 0.1·LPIPS in the G step
        # (train_avatarHD.py:262-266) — training without it diverges from
        # reference behavior, so be loud about it
        print("=" * 70 + "\nWARNING: no LPIPS weights at "
              f"'{args.lpips_weights}' — the 0.1*LPIPS perceptual term of "
              "the G step (reference train_avatarHD.py:262-266) is DISABLED."
              "\nConvert them once with: python scripts/convert_lpips.py\n"
              + "=" * 70, flush=True)
    # multi-chip + fused kernels: the render must go through shard_map
    # (GSPMD cannot partition a Pallas custom call — train/stage2.py)
    train_mesh = None
    if jax.device_count() > 1 and (args.fused_mlp or args.fused_quad):
        from havatar_tpu.parallel import make_mesh

        train_mesh = make_mesh(("data",))
    d_step, r1_step, g_step, dg_step = stage2.make_steps(
        cfg, renderer, generator, discriminator, lpips_params=lpips_params,
        remat_render=not (args.fused_mlp or args.fused_quad),
        mesh=train_mesh)

    ckpt_mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"),
                                 save_interval_steps=cfg.experiment.save_every)

    sample_dir = os.path.join(args.logdir, "sample")
    os.makedirs(sample_dir, exist_ok=True)

    def save_sample_grid(step, batch):
        """g_ema sample next to the low-res render and GT
        (spec: train_avatarHD.py:332-345)."""
        import cv2

        rng_s = jax.random.PRNGKey(cfg.experiment.randomseed + step)
        render, _, _ = stage2_render_full(state, batch, rng_s)
        style = jnp.zeros((render.shape[0], cfg.gan.latent))
        sample = generator.apply({"params": state.g_ema_params}, [style],
                                 render[..., 3:])
        lr_up = jnp.repeat(jnp.repeat(
            render[..., :3], gen_size // render_size, 1),
            gen_size // render_size, 2)
        grid = jnp.concatenate([sample, lr_up, batch["gt_hr_img"]], axis=2)
        grid = np.asarray(jnp.clip(grid, 0, 1) * 255).astype(np.uint8)
        grid = grid.reshape(-1, grid.shape[2], 3)
        cv2.imwrite(os.path.join(sample_dir, f"{step:06d}.png"),
                    cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))

    def stage2_render_full(st, batch, rng_s):
        from havatar_tpu.models.renderer import AvatarRenderer as AR

        rays = batch["mv_rays"]
        latent = st.latent_codes[batch["dataset_idx"]]
        render, mask = renderer.apply(
            {"params": st.nerf_params, "buffers": st.nerf_buffers},
            rays[..., :8], rays[..., 8:11], latent, batch["inv_head_T"],
            batch["front_render_cond"], batch["left_render_cond"],
            batch["right_render_cond"],
            num_coarse=cfg.nerf.validation.num_coarse,
            num_fine=cfg.nerf.validation.num_fine, perturb=False,
            method=AR.render_full_image)
        return render, mask, None

    max_iters = args.max_iters or cfg.gan.iter
    timer = StepTimer()
    keep = {"mv_rays", "gt_color", "gt_hr_img", "gt_lr_mask", "inv_head_T",
            "dataset_idx", "front_render_cond", "left_render_cond",
            "right_render_cond"}

    # multi-chip: shard the GAN batch over a data mesh (frame axis when
    # gan.batch % n_chips == 0 — set gan.batch accordingly for full DP —
    # else the NeRF ray axis); replicated params, compiler-inserted psums
    shardings = None
    if jax.device_count() > 1:
        from havatar_tpu.parallel import auto_batch_shardings, make_mesh, replicated

        mesh = train_mesh if train_mesh is not None else make_mesh(("data",))
        shardings = auto_batch_shardings(
            mesh, {k: v for k, v in example.items() if k in keep})
        state = jax.device_put(state, replicated(mesh))
        print(f"data mesh: {mesh.devices.size} devices; sharded keys: "
              f"{[k for k, s in shardings.items() if not s.is_fully_replicated]}")

    data_iter = device_prefetch(
        (prepare_batch(b, gen_size, render_size) for b in infinite(loader)),
        size=2, keys=keep, sharding=shardings)
    start = int(state.step)
    for i in range(start, max_iters):
        batch = next(data_iter)
        rng, rd, rg = jax.random.split(rng, 3)
        timer.start()
        if args.fast_step:
            if i % cfg.gan.d_reg_every == 0:
                state, r1_metrics = r1_step(state, batch)
            state, g_metrics = dg_step(state, batch, rg)
            d_metrics = {k: g_metrics[k] for k in
                         ("d", "real_score", "fake_score")}
            if i % cfg.gan.d_reg_every == 0:
                d_metrics.update(r1_metrics)
        else:
            state, d_metrics = d_step(state, batch, rd)
            if i % cfg.gan.d_reg_every == 0:
                state, r1_metrics = r1_step(state, batch)
                d_metrics.update(r1_metrics)
            state, g_metrics = g_step(state, batch, rg)
        if i % cfg.experiment.print_every == 0:
            timer.stop(g_metrics["psnr"])
            print(f"[HD] iter {i} PSNR {float(g_metrics['psnr']):.3f} "
                  f"d {float(d_metrics['d']):.4f} g {float(g_metrics['g']):.4f} "
                  f"s/iter {timer.mean:.3f}", flush=True)
            for k, v in {**d_metrics, **g_metrics}.items():
                writer.scalar(f"train/{k}", float(v), i)
        if i > start and i % cfg.experiment.validate_every == 0:
            save_sample_grid(i, batch)
        ckpt_mgr.save(i, state._asdict())
        if should_stop():
            ckpt_mgr.save(i, state._asdict(), force=True)
            print(f"preempted at iter {i}; checkpoint saved", flush=True)
            break

    ckpt_mgr.wait()
    print("Done!")


if __name__ == "__main__":
    main()
