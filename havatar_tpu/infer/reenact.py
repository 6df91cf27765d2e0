"""Reenactment inference: render a driving split to PNG frames.

Behavioral spec: avatarHD_reenactment.py:103-172 — load checkpoint (renderer
weights minus latent codes, then the saved latent_codes tensor; g_ema weights
into the SR generator), fix the canonical skinning volume, style = mean of
1000 mapped z's, then per frame: full 128² NeRF feature render → StyleUNet →
512² RGB → PNG named ``rgb/{fidx}_{vidx:02d}.png``.

TPU design: the whole frame pipeline (plane gens → ray march → SR) is ONE
jitted function; the frame loop keeps everything device-resident and only the
final uint8 image crosses back to the host. Rays for a fixed camera are
computed once and cached per view. Dispatch is PIPELINED: a host thread
prefetches+stages conditions while frame i+1 is dispatched before frame i's
uint8 readback blocks — so host IO and the device↔host hops overlap device
compute. On a multi-chip mesh the frame fn shards the ray axis over the
``data`` axis (infer/serving.py).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from havatar_tpu.models.generators import StyleUNetSR
from havatar_tpu.models.renderer import AvatarRenderer
from havatar_tpu.models.skinning import fix_canonical_volume
from havatar_tpu.train.stage1 import build_renderer


def mean_style(generator: StyleUNetSR, g_params, rng: jax.Array,
               n: int = 1000) -> jnp.ndarray:
    """Mean of n mapped latents (spec: avatarHD_reenactment.py:148 takes the
    mean of 1000 raw z's and maps at call time; we keep raw-z mean for exact
    parity and map inside the generator)."""
    z = jax.random.normal(rng, (n, 1, generator.style_dim))
    return jnp.mean(z, axis=0)


def make_reenact_fn(cfg, renderer: AvatarRenderer, generator: StyleUNetSR,
                    to_uint8: bool = True, gated: bool = False,
                    num_coarse: Optional[int] = None):
    """Build the jitted per-frame pipeline: inputs -> uint8 HxWx3.

    ``to_uint8=False`` returns the raw float frame (0-1 scale) instead —
    for metric evaluation (PSNR/LPIPS against a reference frame) where the
    quantization would floor the measurement.

    ``gated=True`` turns on occupancy-gated sampling (ops/rays.py:
    tighten_ray_near_far over ``renderer.gate_aabb`` — the avatar's
    head-pose-transformed world AABB plus the one-texel feature-padding
    halo), usually paired with a reduced ``num_coarse`` — the samples
    concentrate in the ~half-length occupied chord. Measured operating
    points (docs/PERF.md round 5): 16 coarse = the bench default
    (34.3 fps, 47.6 dB agreement with the reference's blind 64+16 frame,
    ground-truth accuracy within 1 dB of the reference schedule's own),
    32 = the quality knee (25.7 fps, 50.0 dB agreement, MORE accurate
    than the reference's schedule vs a dense ground truth).
    Opt-in because it is NOT bit-identical to the reference's blind
    march: rays keep their stratified spacing only within the tightened
    interval, so individual frames can differ by a few uint8 LSB where the
    blind march's extra empty-space samples shifted the fine-pass PDF. The
    default (False) is the parity-tested path
    (tests/test_torch_checkpoint_files.py)."""
    nerf_cfg = cfg.nerf.validation
    n_coarse = int(num_coarse) if num_coarse is not None else (
        int(nerf_cfg.num_coarse))

    def frame_fn(nerf_vars, g_params, fixed_volume, style, rays, bg,
                 latent, inv_head_T, front, left, right):
        if gated:
            from havatar_tpu.ops import tighten_ray_near_far

            rays = tighten_ray_near_far(rays, renderer.gate_aabb,
                                        inv_head_T)
        render, _ = renderer.apply(
            nerf_vars, rays, bg, latent, inv_head_T, front, left, right,
            num_coarse=n_coarse, num_fine=nerf_cfg.num_fine,
            perturb=False, radiance_field_noise_std=0.0,
            fixed_volume=fixed_volume,
            method=AvatarRenderer.render_full_image)
        style_b = jnp.broadcast_to(style, (render.shape[0], style.shape[-1]))
        img = generator.apply({"params": g_params}, [style_b], render[..., 3:])
        if to_uint8:
            img = jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint8)
        return img

    return jax.jit(frame_fn)


def run_reenactment(cfg, split_file: str, savedir: str, variables,
                    latent_codes, g_ema_params, seed: int = 42,
                    max_frames: Optional[int] = None,
                    pipeline_depth: int = 3,
                    precision: str = "auto",
                    gated: bool = False,
                    num_coarse: Optional[int] = None) -> Dict[str, Any]:
    """Offline reenactment driver. Returns timing stats.

    The loop is pipelined: conditions are staged to device by a prefetch
    thread, ``pipeline_depth`` frames are in flight before the first
    blocking uint8 readback, and per-view rays are cached (the camera is
    usually fixed across a driving sequence). On >1 device the ray axis is
    sharded over a ``data`` mesh (infer/serving.py).
    """
    import cv2

    from havatar_tpu.data import AvatarDataset, Loader, device_prefetch
    from havatar_tpu.parallel import make_mesh

    renderer = build_renderer(cfg)
    # "fast" (default on TPU): bf16 compute + the fused Pallas march
    # kernels (ops/pallas_march.py). "exact": the f32 XLA path, bit-matched
    # to the parity tests. The fused path requires the deterministic
    # inference march (perturb/noise off — always true here).
    if precision == "auto":
        precision = "fast" if jax.default_backend() not in ("cpu",) else "exact"
    if precision == "fast":
        # skin_compute_dtype=None: inference WANTS the bf16 skin volume
        # (64 B gather rows; build_renderer pins it f32 for training where
        # the bf16 scatter backward is the slow case)
        renderer = renderer.clone(compute_dtype="bfloat16",
                                  skin_compute_dtype=None,
                                  use_pallas_march=True)
    gan = cfg.gan
    generator = StyleUNetSR(
        inp_size=cfg.models.StyleUnet.inp_size,
        inp_ch=cfg.models.StyleUnet.inp_ch, out_ch=3,
        out_size=cfg.models.StyleUnet.out_size,
        style_dim=gan.latent, n_mlp=gan.n_mlp,
        channel_multiplier=gan.channel_multiplier,
        compute_dtype=renderer.compute_dtype)

    os.makedirs(os.path.join(savedir, "rgb"), exist_ok=True)
    rng = jax.random.PRNGKey(seed)
    style = mean_style(generator, g_ema_params, rng)

    # fix the canonical skinning volume once
    # (spec: avatarHD_reenactment.py:144)
    vol = renderer.apply(variables, method=AvatarRenderer.skin_volume)
    fixed_volume = fix_canonical_volume(vol)

    mesh = None
    if jax.device_count() > 1:
        from havatar_tpu.infer.serving import make_sharded_frame_fn

        mesh = make_mesh(("data",))
        nerf_cfg = cfg.nerf.validation
        n_coarse = int(num_coarse) if num_coarse is not None else (
            int(nerf_cfg.num_coarse))
        sharded_fn = make_sharded_frame_fn(
            mesh, renderer, generator, num_coarse=n_coarse,
            num_fine=nerf_cfg.num_fine, to_uint8=True, gated=gated)

        def frame_fn(nerf_vars, g_params, fixed_volume, style, rays, bg,
                     latent, inv_head_T, front, left, right):
            style_b = jnp.broadcast_to(style, (rays.shape[0], style.shape[-1]))
            return sharded_fn(nerf_vars, g_params, fixed_volume, rays, bg,
                              latent, inv_head_T, front, left, right, style_b)
    else:
        frame_fn = make_reenact_fn(cfg, renderer, generator, gated=gated,
                                   num_coarse=num_coarse)

    ds = AvatarDataset(split_file, mode="test", cfg=cfg,
                       down_sample=cfg.dataset.down_sample, full_image=True)
    loader = Loader(ds, batch_size=1, shuffle=False, num_workers=2)
    # mv_rays stays host-side so the ray cache can hash it (cameras may move
    # per frame in freeview drives — vidx alone is not a safe key)
    keep = {"inv_head_T", "front_render_cond",
            "left_render_cond", "right_render_cond"}
    batches = device_prefetch(iter(loader), size=pipeline_depth, keys=keep)

    latent = jnp.asarray(latent_codes[0:1])
    ray_cache: Dict[Any, Any] = {}
    pending: list = []
    n = 0
    t0 = time.perf_counter()

    def drain(limit: int) -> None:
        while len(pending) > limit:
            img_dev, name = pending.pop(0)
            img = np.asarray(img_dev[0])
            cv2.imwrite(os.path.join(savedir, "rgb", name),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    for batch in batches:
        if max_frames is not None and n >= max_frames:
            break
        host_rays = np.asarray(batch["mv_rays"])
        key = (int(batch["vidx"][0]), hash(host_rays.tobytes()))
        cached = ray_cache.get(key)
        if cached is None:
            rays = jnp.asarray(host_rays[..., :8])
            bg = jnp.asarray(host_rays[..., 8:11])
            if mesh is not None:
                from havatar_tpu.parallel import ray_sharding

                rays = jax.device_put(rays, ray_sharding(mesh))
                bg = jax.device_put(bg, ray_sharding(mesh))
            if len(ray_cache) > 64:   # freeview: every frame is a new camera
                ray_cache.clear()
            ray_cache[key] = (rays, bg)
        else:
            rays, bg = cached
        img = frame_fn(variables, g_ema_params, fixed_volume, style,
                       rays, bg, latent, batch["inv_head_T"],
                       batch["front_render_cond"],
                       batch["left_render_cond"],
                       batch["right_render_cond"])
        name = f"{batch['fidx'][0]}_{batch['vidx'][0]:02d}.png"
        pending.append((img, name))
        drain(pipeline_depth)
        n += 1

    drain(0)
    t_total = time.perf_counter() - t0

    return {"frames": n, "seconds": t_total,
            "fps": n / t_total if t_total > 0 else 0.0}
