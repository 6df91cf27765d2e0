"""Stage-1 NeRF avatar training CLI (capability parity with the reference's
``train_avatar.py``; see SURVEY.md §2.4 and the call stack in §3.1).

Usage:
  python -m havatar_tpu.cli.train_avatar --datadir DATA --logdir LOGS \
      [--config singleview_512_base.yml] [--ckpt RESUME_DIR]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from havatar_tpu.checkpoints import CheckpointManager
from havatar_tpu.cli.common import resolve_config, seed_everything, to_device_batch
from havatar_tpu.data import AvatarDataset, Loader, device_prefetch, infinite
from havatar_tpu.train import stage1
from havatar_tpu.train.losses import mse2psnr
from havatar_tpu.utils.logging_util import MetricsWriter, create_code_snapshot, timestamp
from havatar_tpu.utils.preemption import install as install_preemption, should_stop
from havatar_tpu.utils.profiling import StepTimer


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", type=str, required=True)
    p.add_argument("--datadir", type=str, required=True)
    p.add_argument("--config", type=str, default="singleview_512_base.yml")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--lpips-weights", type=str, default="lpips_vgg.npz",
                   help="converted LPIPS-VGG weights (.npz); perceptual loss "
                        "terms activate when the file exists")
    p.add_argument("--max-iters", type=int, default=0,
                   help="override cfg.experiment.train_iters (for smoke runs)")
    p.add_argument("--pretrain-iters", type=int, default=3000,
                   help="skinning-volume pretrain iterations (0 to skip)")
    p.add_argument("--batch-size", type=int, default=2,
                   help="frames per step (reference: 2, train_avatar.py:62); "
                        "set a multiple of the chip count for full data "
                        "parallelism — otherwise the RAY axis is sharded")
    args = p.parse_args()

    install_preemption()
    cfg = resolve_config(args.config)
    rng = seed_everything(cfg.experiment.randomseed)

    os.makedirs(args.logdir, exist_ok=True)
    writer = MetricsWriter(args.logdir)
    with open(os.path.join(args.logdir, f"config_{timestamp()}.yml"), "w") as f:
        f.write(cfg.dump())
    create_code_snapshot(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.path.join(args.logdir, f"code_bk_{timestamp()}.tar.gz"))

    split = os.path.join(args.datadir, "sv_v31_all.json")
    train_ds = AvatarDataset(split, "train", cfg,
                             down_sample=cfg.dataset.down_sample)
    train_loader = Loader(train_ds, batch_size=args.batch_size,
                          seed=cfg.experiment.randomseed)

    rng, init_rng = jax.random.split(rng)
    example = next(iter(Loader(train_ds, batch_size=args.batch_size,
                               shuffle=False, num_workers=1)))
    model, state = stage1.init_state(cfg, init_rng, len(train_ds), example)

    ckpt_mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"),
                                 save_interval_steps=cfg.experiment.save_every)
    start_step = 0
    if args.ckpt:
        restored = CheckpointManager(args.ckpt).restore(template=state._asdict())
        if restored is not None:
            state = stage1.TrainState(**restored)
            start_step = int(state.step)
            print(f"resumed from step {start_step}")
    elif args.pretrain_iters > 0:
        # skinning-volume pretrain on fresh runs (spec: train_avatar.py:93-98)
        rng, pre_rng = jax.random.split(rng)
        new_params, hist = stage1.pretrain_skinning(
            model, state.params, state.buffers, pre_rng,
            cfg.models.coarse.Head_bounding, num_iter=args.pretrain_iters)
        state = state._replace(params=new_params)
        print(f"skinning pretrain done, final BCE {float(hist[-1]):.4f}")

    from havatar_tpu.train.lpips_jax import load_lpips_file

    lpips_params = load_lpips_file(args.lpips_weights)
    if cfg.experiment.get("patch_rgb", False) and lpips_params is None:
        print("note: patch_rgb is on but no LPIPS weights found at "
              f"{args.lpips_weights}; the patch perceptual term is disabled")
    # multi-chip + fused kernels: the render must go through shard_map
    # (GSPMD cannot partition a Pallas custom call — train/stage1.py)
    train_mesh = None
    if jax.device_count() > 1 and (cfg.models.get("use_pallas_mlp", False)
                                   or cfg.models.get("use_pallas_mlp_quad",
                                                     False)):
        from havatar_tpu.parallel import make_mesh

        train_mesh = make_mesh(("data",))
    train_step = stage1.make_train_step(model, cfg, lpips_params=lpips_params,
                                        mesh=train_mesh)

    # validation set: full images at native resolution
    # (spec: train_avatar.py:63-66,182-300)
    val_ds = AvatarDataset(split, "val", cfg, down_sample=1.0)
    val_loader = Loader(val_ds, batch_size=1, shuffle=True, num_workers=1,
                        seed=cfg.experiment.randomseed + 1)
    val_iter = infinite(val_loader)
    val_cfg = cfg.nerf.validation

    def run_validation(step: int) -> None:
        vb = to_device_batch(next(val_iter))
        rays = vb["mv_rays"]
        R = rays.shape[1]
        chunk = min(R, 16384)
        while R % chunk:
            chunk //= 2
        out = model.apply(
            {"params": state.params, "buffers": state.buffers},
            rays[..., :8], rays[..., 8:11],
            state.latent_codes[vb["dataset_idx"]], vb["inv_head_T"],
            vb["front_render_cond"], vb["left_render_cond"],
            vb["right_render_cond"],
            chunk_size=chunk, num_coarse=val_cfg.num_coarse,
            num_fine=val_cfg.num_fine, perturb=False,
            method=stage1.AvatarRenderer.render_chunked)
        H = W = int(R ** 0.5)
        rgb = out["rgb_fine"] if out["rgb_fine"] is not None else out["rgb_coarse"]
        rgb = np.asarray(rgb[0, :, :3]).reshape(H, W, 3)
        target = np.asarray(vb["gt_color"][0]).reshape(H, W, 3)
        acc = np.asarray((out["acc_fine"] if out["acc_fine"] is not None
                          else out["acc_coarse"])[0]).reshape(H, W)
        psnr = float(mse2psnr(np.mean((rgb - target) ** 2)))
        writer.scalar("validation/psnr", psnr, step)
        if lpips_params is not None:
            # validation LPIPS (spec: train_avatar.py:237,263)
            from havatar_tpu.train.lpips_jax import lpips_loss

            val_lpips = float(lpips_loss(
                lpips_params, jnp.asarray(rgb)[None], jnp.asarray(target)[None]))
            writer.scalar("validation/lpips", val_lpips, step)
        writer.image("validation/rgb_fine", np.clip(rgb, 0, 1), step)
        writer.image("validation/img_target", np.clip(target, 0, 1), step)
        writer.image("validation/acc_fine", np.clip(acc, 0, 1)[..., None], step)
        err = np.linalg.norm(rgb - target, axis=-1, keepdims=True)
        writer.image("validation/err_img", np.clip(err, 0, 1), step)
        # coarse + weights artifacts (spec: train_avatar.py:259-294 logs the
        # coarse image, coarse acc and the per-ray max blend weight too)
        rgb_c = np.asarray(out["rgb_coarse"][0, :, :3]).reshape(H, W, 3)
        writer.image("validation/rgb_coarse", np.clip(rgb_c, 0, 1), step)
        acc_c = np.asarray(out["acc_coarse"][0]).reshape(H, W)
        writer.image("validation/acc_coarse",
                     np.clip(acc_c, 0, 1)[..., None], step)
        wmax = np.asarray(out["weights_max"][0]).reshape(H, W)
        writer.image("validation/weights_max",
                     np.clip(wmax, 0, 1)[..., None], step)
        err_c = np.linalg.norm(rgb_c - target, axis=-1, keepdims=True)
        writer.image("validation/err_img_coarse", np.clip(err_c, 0, 1), step)
        print(f"[VAL] iter {step} PSNR {psnr:.4f}", flush=True)

    max_iters = args.max_iters or cfg.experiment.train_iters
    timer = StepTimer()
    keep = {"mv_rays", "gt_color", "inv_head_T", "dataset_idx",
            "front_render_cond", "left_render_cond", "right_render_cond"}

    # multi-chip: shard the batch over a data mesh (frame axis when it
    # divides the chip count, else the ray axis — the TPU-native replacement
    # for the reference's vestigial DataParallel, dist_util.py:6-133);
    # params/opt-state replicated, gradient psums inserted by the compiler
    shardings = None
    if jax.device_count() > 1:
        from havatar_tpu.parallel import auto_batch_shardings, make_mesh, replicated

        mesh = train_mesh if train_mesh is not None else make_mesh(("data",))
        shardings = auto_batch_shardings(
            mesh, {k: v for k, v in example.items() if k in keep})
        state = jax.device_put(state, replicated(mesh))
        print(f"data mesh: {mesh.devices.size} devices; sharded keys: "
              f"{[k for k, s in shardings.items() if not s.is_fully_replicated]}")

    data_iter = device_prefetch(infinite(train_loader), size=2, keys=keep,
                                sharding=shardings)
    for i in range(start_step, max_iters):
        batch = next(data_iter)
        rng, step_rng = jax.random.split(rng)
        timer.start()
        state, metrics = train_step(state, batch, step_rng)
        if i % cfg.experiment.print_every == 0:
            timer.stop(metrics["loss"])
            msg = (f"[TRAIN] Iter: {i} Loss: {float(metrics['loss']):.6f} "
                   f"PSNR: {float(metrics['psnr']):.4f} "
                   f"s/iter: {timer.mean:.3f}")
            print(msg, flush=True)
            for k, v in metrics.items():
                writer.scalar(f"train/{k}", float(v), i)
        if i > start_step and i % cfg.experiment.validate_every == 0:
            run_validation(i)
        if i > start_step and i % cfg.experiment.save_every == 0:
            # skinning weight-volume debug dump (spec: train_avatar.py:311)
            from havatar_tpu.utils.obj_io import visualize_skin_volume

            visualize_skin_volume(
                model, state.params, state.buffers,
                os.path.join(args.logdir, f"vis_motionWeightVol{i:05d}.obj"))
        ckpt_mgr.save(i, state._asdict())
        if should_stop():
            # preemption: force a final checkpoint and exit cleanly
            ckpt_mgr.save(i, state._asdict(), force=True)
            print(f"preempted at iter {i}; checkpoint saved", flush=True)
            break

    ckpt_mgr.wait()
    print("Done!")


if __name__ == "__main__":
    main()
