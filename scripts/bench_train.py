"""Training-step throughput on the TPU at reference operating points.

Stage 1: batch 2 frames x 1024 rays, 64+16 samples (singleview_512_base).
Stage 2: batch 2 full 128² frames -> 512² GAN (singleview_512_HD_base),
timing the D step + G step (the per-iteration work; R1 runs every 16).
Synthetic batches, device-resident; steps are timed inside a lax.map-free
loop with block_until_ready per step group.
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


def synth_batch(rng, B, R, cond_res=256, gen_size=512, render_size=128,
                full=False):
    k = jax.random.split(rng, 8)
    rays = jnp.concatenate([
        jax.random.normal(k[0], (B, R, 3)) * 0.1,
        jax.random.normal(k[1], (B, R, 3)) * 0.05 + jnp.asarray([0., 0., -1.]),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0),
        jax.random.uniform(k[2], (B, R, 3)),
        (jax.random.uniform(k[3], (B, R, 1)) > 0.5).astype(jnp.float32),
    ], axis=-1)
    batch = {
        "mv_rays": rays,
        "gt_color": jax.random.uniform(k[4], (B, R, 3)),
        "dataset_idx": jnp.arange(B),
        "inv_head_T": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3)),
        "front_render_cond": jax.random.uniform(k[5], (B, cond_res, cond_res, 7)),
        "left_render_cond": jax.random.uniform(k[6], (B, cond_res, cond_res, 7)),
        "right_render_cond": jax.random.uniform(k[7], (B, cond_res, cond_res, 7)),
    }
    if full:
        batch["gt_hr_img"] = jax.random.uniform(k[4], (B, gen_size, gen_size, 3))
        batch["gt_lr_mask"] = (jax.random.uniform(
            k[3], (B, render_size, render_size, 1)) > 0.5).astype(jnp.float32)
    return batch


def main():
    from havatar_tpu.cli.common import resolve_config
    from havatar_tpu.train import stage1, stage2

    res = {}
    dev = jax.devices()[0]
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = dev

    # ---- stage 1
    cfg = resolve_config("singleview_512_base.yml")
    rng = jax.random.PRNGKey(0)
    batch = synth_batch(rng, B=2, R=1024)
    example = {k: np.asarray(v) for k, v in batch.items()}
    with jax.default_device(cpu):
        model, state = stage1.init_state(cfg, rng, num_frames=4,
                                         example_batch=example)
    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    step = stage1.make_train_step(model, cfg)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(m["loss"])   # honest sync: block_until_ready returns early
    t0 = time.perf_counter()
    N = 5
    for i in range(N):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
    np.asarray(m["loss"])
    res["stage1_s_per_iter"] = round((time.perf_counter() - t0) / N, 4)

    # ---- stage 2
    cfg2 = resolve_config("singleview_512_HD_base.yml")
    rng2 = jax.random.PRNGKey(2)
    batch2 = synth_batch(rng2, B=2, R=128 * 128, full=True)
    example2 = {k: np.asarray(v) for k, v in batch2.items()}
    with jax.default_device(cpu):
        models, st2 = stage2.init_state(cfg2, rng2, num_frames=4,
                                        example_batch=example2)
    st2 = jax.device_put(st2, dev)
    batch2 = jax.device_put(batch2, dev)
    renderer, generator, discriminator = models
    d_step, r1_step, g_step, dg_step = stage2.make_steps(cfg2, renderer, generator,
                                                discriminator)
    # warm up all three compiled steps
    st2, dm = d_step(st2, batch2, jax.random.PRNGKey(3))
    st2, rm = r1_step(st2, batch2)
    st2, gm = g_step(st2, batch2, jax.random.PRNGKey(4))
    np.asarray(gm["psnr"])

    # per-phase breakdown (VERDICT r1 item 4)
    N = 3

    def timed(fn, key):
        nonlocal st2
        t0 = time.perf_counter()
        for i in range(N):
            st2, m = fn(i)
        np.asarray(list(m.values())[0])
        res[key] = round((time.perf_counter() - t0) / N, 4)

    timed(lambda i: d_step(st2, batch2, jax.random.fold_in(rng2, i)),
          "stage2_d_s")
    timed(lambda i: r1_step(st2, batch2), "stage2_r1_s")
    timed(lambda i: g_step(st2, batch2, jax.random.fold_in(rng2, 100 + i)),
          "stage2_g_s")
    # amortized per-iteration cost at the reference cadence (R1 every 16)
    res["stage2_s_per_iter"] = round(
        res["stage2_d_s"] + res["stage2_g_s"] + res["stage2_r1_s"] / 16, 4)

    # fused fast step (one render shared between D and G losses)
    st2, fm = dg_step(st2, batch2, jax.random.PRNGKey(9))
    np.asarray(fm["psnr"])
    timed(lambda i: dg_step(st2, batch2, jax.random.fold_in(rng2, 200 + i)),
          "stage2_fused_dg_s")
    res["stage2_fast_s_per_iter"] = round(
        res["stage2_fused_dg_s"] + res["stage2_r1_s"] / 16, 4)

    # bf16 compute-path variant (models.compute_dtype knob)
    cfg2b = cfg2.clone()
    cfg2b.models.compute_dtype = "bfloat16"
    with jax.default_device(cpu):
        models_b, st2b = stage2.init_state(cfg2b, rng2, num_frames=4,
                                           example_batch=example2)
    st2b = jax.device_put(st2b, dev)
    d_b, r1_b, g_b, dg_b = stage2.make_steps(cfg2b, *models_b)
    st2b, _ = d_b(st2b, batch2, jax.random.PRNGKey(5))
    st2b, gmb = g_b(st2b, batch2, jax.random.PRNGKey(6))
    np.asarray(gmb["psnr"])
    t0 = time.perf_counter()
    for i in range(N):
        st2b, _ = d_b(st2b, batch2, jax.random.fold_in(rng2, 50 + i))
        st2b, gmb = g_b(st2b, batch2, jax.random.fold_in(rng2, 60 + i))
    np.asarray(gmb["psnr"])
    res["stage2_dg_bf16_s"] = round((time.perf_counter() - t0) / N, 4)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
