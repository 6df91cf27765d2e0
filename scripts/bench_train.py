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



def scan_time(step_fn, state, n=4):
    """Device-resident timing: ONE dispatch runs step_fn n times via
    lax.scan (per-dispatch tunnel overhead here is ~0.5-1 s, so host-loop
    timing of individual steps measures the tunnel, not the chip)."""
    def body(st, i):
        st, m = step_fn(st, i)
        return st, list(m.values())[0]

    # donate the carry: without it the scan holds input + output state
    # copies and the G-step peak no longer fits the 16 GB chip
    f = jax.jit(lambda st: jax.lax.scan(
        body, st, jnp.arange(n, dtype=jnp.int32)), donate_argnums=0)
    st2, vals = f(state)
    np.asarray(vals)                      # compile + warm (honest sync)
    t0 = time.perf_counter()
    st2, vals = f(st2)
    np.asarray(vals)
    return st2, round((time.perf_counter() - t0) / n, 4)


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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    choices=["", "stage1", "stage2", "stage2_bf16",
                             "stage2_pallas_mlp", "stage2_pallas_mlp_noremat",
                             "stage2_pallas_mlp_bf16_noremat",
                             "stage2_all_bf16_noremat",
                             "stage2_skin_bf16_noremat",
                             "stage2_quad_noremat",
                             "stage2_quad_allfast_noremat",
                             "stage2_quad_gan_bf16_noremat",
                             "stage2_noremat"])
    ap.add_argument("--sorted-scatter", action="store_true",
                    help="sorted-scatter strategy in the grid-sample VJP")
    flags = ap.parse_args()
    if flags.sorted_scatter:
        from havatar_tpu.ops import grid_sample as _gs
        _gs.SORTED_SCATTER = True

    from havatar_tpu.cli.common import resolve_config
    from havatar_tpu.train import stage1, stage2

    res = {}
    dev = jax.devices()[0]
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = dev

    # ---- stage 1
    if flags.only in ("", "stage1"):
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
        state, res["stage1_s_per_iter"] = scan_time(
            lambda st, i: step(st, batch, jax.random.fold_in(rng, i)),
            state, n=5)
        print(json.dumps({"stage1_s_per_iter": res["stage1_s_per_iter"]}),
              flush=True)

    # ---- stage 2
    if flags.only == "stage1":
        print(json.dumps(res))
        return
    cfg2 = resolve_config("singleview_512_HD_base.yml")
    rng2 = jax.random.PRNGKey(2)
    batch2 = synth_batch(rng2, B=2, R=128 * 128, full=True)
    example2 = {k: np.asarray(v) for k, v in batch2.items()}
    if flags.only == "stage2_bf16":
        # bf16 variant in its own process: two full stage-2 model sets do
        # not fit a 16 GB chip simultaneously
        _stage2_bf16(cfg2, rng2, batch2, example2, cpu, dev, res)
        print(json.dumps(res))
        return
    if flags.only == "stage2_pallas_mlp":
        # fused field-MLP kernels (fwd + custom_vjp bwd, ops/pallas_mlp.py)
        # in the stage-2 fast step — round-3 training-throughput lever
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_pallas_mlp_s",
                        set_cfg=lambda c: setattr(c.models, "use_pallas_mlp",
                                                  True))
        print(json.dumps(res))
        return
    if flags.only == "stage2_pallas_mlp_noremat":
        # fused-MLP custom_vjp WITHOUT the outer jax.checkpoint: the bwd
        # kernel recomputes activations in VMEM, so the no-remat graph
        # fits — and skips the remat re-forward of the whole render
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_pallas_mlp_noremat_s",
                        set_cfg=lambda c: setattr(c.models, "use_pallas_mlp",
                                                  True),
                        remat_render=False)
        print(json.dumps(res))
        return
    if flags.only == "stage2_pallas_mlp_bf16_noremat":
        # the production fast step PLUS bf16 compute: now that the remat
        # bound is gone (fused-MLP bwd keeps residuals small), the step is
        # gather/scatter-bandwidth bound — bf16 halves those bytes
        def _set(c):
            c.models.use_pallas_mlp = True
            c.models.compute_dtype = "bfloat16"
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_pallas_mlp_bf16_noremat_s",
                        set_cfg=_set, remat_render=False)
        print(json.dumps(res))
        return
    if flags.only == "stage2_quad_noremat":
        # quad-consuming fused MLP custom_vjp (ops/pallas_mlp_quad.py):
        # gather -> corner reduce -> dense chain in one kernel each way
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_quad_noremat_s",
                        set_cfg=lambda c: setattr(
                            c.models, "use_pallas_mlp_quad", True),
                        remat_render=False)
        print(json.dumps(res))
        return
    if flags.only == "stage2_quad_allfast_noremat":
        # every training lever at once: quad custom_vjp + bf16 compute +
        # bf16 skin gathers
        def _set_fast(c):
            c.models.use_pallas_mlp_quad = True
            c.models.compute_dtype = "bfloat16"
            c.models.skin_compute_dtype = "bfloat16"
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_quad_allfast_noremat_s",
                        set_cfg=_set_fast, remat_render=False)
        print(json.dumps(res))
        return
    if flags.only == "stage2_skin_bf16_noremat":
        # bf16 skin-volume GATHER in training (64 B rows fetch ~1.5x
        # faster): unlocked by the custom grid-sample VJP, whose splat
        # backward accumulates f32 regardless of the volume dtype
        def _set_skin(c):
            c.models.use_pallas_mlp = True
            c.models.compute_dtype = "bfloat16"
            c.models.skin_compute_dtype = "bfloat16"
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_skin_bf16_noremat_s",
                        set_cfg=_set_skin, remat_render=False)
        print(json.dumps(res))
        return
    if flags.only == "stage2_all_bf16_noremat":
        # ...plus bf16 GAN nets (gan_compute_dtype knob): measures whether
        # the remaining f32 SR/D forward+backward is worth casting
        def _set_all(c):
            c.models.use_pallas_mlp = True
            c.models.compute_dtype = "bfloat16"
            c.models.gan_compute_dtype = "bfloat16"
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_all_bf16_noremat_s",
                        set_cfg=_set_all, remat_render=False)
        print(json.dumps(res))
        return
    if flags.only == "stage2_quad_gan_bf16_noremat":
        # the full stack: quad custom_vjp + bf16 field compute + bf16 skin
        # gathers + bf16 GAN nets — is the remaining f32 SR/D work worth
        # casting once the NeRF side is saturated?
        def _set_full(c):
            c.models.use_pallas_mlp_quad = True
            c.models.compute_dtype = "bfloat16"
            c.models.skin_compute_dtype = "bfloat16"
            c.models.gan_compute_dtype = "bfloat16"
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_quad_gan_bf16_noremat_s",
                        set_cfg=_set_full, remat_render=False)
        print(json.dumps(res))
        return
    if flags.only == "stage2_noremat":
        # XLA field without the outer remat (fits standalone; tips over in
        # scanned/pipelined contexts per docs/PERF.md — measured for the
        # remat-cost attribution)
        _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res,
                        key="stage2_dg_noremat_s",
                        set_cfg=lambda c: None, remat_render=False)
        print(json.dumps(res))
        return
    with jax.default_device(cpu):
        models, st2 = stage2.init_state(cfg2, rng2, num_frames=4,
                                        example_batch=example2)
    st2 = jax.device_put(st2, dev)
    batch2 = jax.device_put(batch2, dev)
    renderer, generator, discriminator = models
    d_step, r1_step, g_step, dg_step = stage2.make_steps(cfg2, renderer, generator,
                                                discriminator)

    def timed(fn, key, n=3):
        nonlocal st2
        st2, res[key] = scan_time(fn, st2, n=n)
        print(json.dumps({key: res[key]}), flush=True)

    timed(lambda st, i: d_step(st, batch2, jax.random.fold_in(rng2, i)),
          "stage2_d_s")
    timed(lambda st, i: r1_step(st, batch2), "stage2_r1_s")
    timed(lambda st, i: g_step(st, batch2, jax.random.fold_in(rng2, 100 + i)),
          "stage2_g_s")
    # amortized per-iteration cost at the reference cadence (R1 every 16)
    res["stage2_s_per_iter"] = round(
        res["stage2_d_s"] + res["stage2_g_s"] + res["stage2_r1_s"] / 16, 4)

    print(json.dumps({"stage2_s_per_iter": res["stage2_s_per_iter"]}),
          flush=True)
    # fused fast step (one render shared between D and G losses)
    timed(lambda st, i: dg_step(st, batch2, jax.random.fold_in(rng2, 200 + i)),
          "stage2_fused_dg_s")
    res["stage2_fast_s_per_iter"] = round(
        res["stage2_fused_dg_s"] + res["stage2_r1_s"] / 16, 4)

    print(json.dumps(res))


def _stage2_variant(cfg2, rng2, batch2, example2, cpu, dev, res, key,
                    set_cfg, N=3, remat_render=True):
    """Time the fused dg fast step under a config mutation, in its own
    process (two full stage-2 model sets do not fit a 16 GB chip)."""
    from havatar_tpu.train import stage2

    cfg2b = cfg2.clone()
    set_cfg(cfg2b)
    with jax.default_device(cpu):
        models_b, st2b = stage2.init_state(cfg2b, rng2, num_frames=4,
                                           example_batch=example2)
    st2b = jax.device_put(st2b, dev)
    batch2 = jax.device_put(batch2, dev)
    d_b, r1_b, g_b, dg_b = stage2.make_steps(cfg2b, *models_b,
                                             remat_render=remat_render)
    st2b, res[key] = scan_time(
        lambda st, i: dg_b(st, batch2, jax.random.fold_in(rng2, 60 + i)),
        st2b, n=N)


def _stage2_bf16(cfg2, rng2, batch2, example2, cpu, dev, res, N=3):
    """bf16 compute-path variant (models.compute_dtype knob)."""
    from havatar_tpu.train import stage2

    cfg2b = cfg2.clone()
    cfg2b.models.compute_dtype = "bfloat16"
    with jax.default_device(cpu):
        models_b, st2b = stage2.init_state(cfg2b, rng2, num_frames=4,
                                           example_batch=example2)
    st2b = jax.device_put(st2b, dev)
    batch2 = jax.device_put(batch2, dev)
    d_b, r1_b, g_b, dg_b = stage2.make_steps(cfg2b, *models_b)

    def both(st, i):
        st, _ = d_b(st, batch2, jax.random.fold_in(rng2, 50 + i))
        return g_b(st, batch2, jax.random.fold_in(rng2, 60 + i))

    st2b, res["stage2_dg_bf16_s"] = scan_time(both, st2b, n=N)


if __name__ == "__main__":
    main()
