"""Multi-chip serving: the reenactment frame pipeline sharded over a mesh.

The per-frame compute splits naturally (SURVEY.md §2.6):
  * plane generation + SR are per-frame image networks — tiny (≈7 ms
    combined) — replicated (or frame-batched) across chips;
  * the ray march (≈85% of frame time) is embarrassingly parallel over rays —
    the RAY axis shards across the ``data`` mesh axis, each chip marches its
    ray shard against replicated planes, and the only collective is the final
    all-gather of the 128² feature image over ICI (≈4 MB).

This is the TPU-native replacement for the reference's serial 4096-ray
chunking (model/nerf_trainer.py:66-71; per-frame hot loop
avatarHD_reenactment.py:165-167), scaled across a v5e-8: 8x the march
throughput per frame.

Why ``shard_map`` and not plain GSPMD: the fused march kernels
(ops/pallas_march.py) are Pallas custom calls, which GSPMD cannot partition —
under ``jit`` + sharding constraints alone they silently force the whole ray
axis onto one device (or fall back to the unfused XLA march). ``shard_map``
is the per-device-code escape hatch: each device runs the SAME single-chip
program — Pallas kernels included — on its ray shard, so the kernels that set
the single-chip number survive on the mesh. Validated output-identical to the
single-device path on virtual CPU meshes by tests/test_serving_mesh.py and
the driver's dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from havatar_tpu.models.renderer import AvatarRenderer


def _generate_planes(m: AvatarRenderer, latent, inv_T, front, left, right):
    cond_c = inv_T.reshape(latent.shape[0], -1)
    return m.field.generate_planes(latent, cond_c, front, left, right)


def _march(m: AvatarRenderer, planes, rays, bg, inv_T, skin_vol,
           num_coarse, num_fine, gated=False):
    if gated:
        from havatar_tpu.ops import tighten_ray_near_far

        rays = tighten_ray_near_far(rays, m.gate_aabb, inv_T)
    out = m.render_rays(
        planes, rays, bg, inv_T,
        num_coarse=num_coarse, num_fine=num_fine, perturb=False,
        fixed_volume=skin_vol)
    rgb = out["rgb_fine"] if out["rgb_fine"] is not None else out["rgb_coarse"]
    acc = out["acc_fine"] if out["acc_fine"] is not None else out["acc_coarse"]
    return rgb, acc


def make_sharded_frame_fn(mesh: Mesh, renderer: AvatarRenderer, sr=None,
                          num_coarse: int = 64, num_fine: int = 16,
                          to_uint8: bool = False, gated: bool = False):
    """Build a jitted frame function whose ray axis is sharded over
    ``mesh['data']`` with ``shard_map`` (Pallas kernels run per shard).

    Returns fn(nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T,
               front, left, right, style) -> 512² RGB (or the feature render
    when ``sr`` is None). Inputs: ``rays``/``bg`` should be placed with
    ray_sharding(mesh); everything else replicated. Structure per frame:

      1. plane generation — replicated (per-frame image nets, ≈3 ms);
      2. ``shard_map`` over the ray axis: each device runs the full
         single-chip march (fused Pallas field+composite kernels when the
         renderer has ``use_pallas_march``) on R/n_devices rays — zero
         collectives inside;
      3. all-gather of the [B, 128, 128, 64+3] feature image (the only
         collective, inserted by the sharding constraint) → replicated SR.
    """
    rep = NamedSharding(mesh, P())
    ndev = mesh.size

    def frame_fn(nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T,
                 front, left, right, style):
        B, R = rays.shape[:2]
        assert R % ndev == 0, (R, ndev)
        planes = renderer.apply(nerf_vars, latent, inv_T, front, left, right,
                                method=_generate_planes)

        def march_shard(nerf_vars, planes, skin_vol, rays, bg, inv_T):
            # gated: per-ray near/far tightening is elementwise over the ray
            # shard (inv_T/bounds replicated) — no collective needed
            return renderer.apply(
                nerf_vars, planes, rays, bg, inv_T, skin_vol,
                num_coarse, num_fine, gated, method=_march)

        rgb, acc = jax.shard_map(
            march_shard,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(None, "data"), P(None, "data"), P()),
            out_specs=(P(None, "data"), P(None, "data")),
            check_vma=False,
        )(nerf_vars, planes, skin_vol, rays, bg, inv_T)

        s = renderer.render_size
        render = rgb.reshape(B, s, s, -1)
        if sr is None:
            return render
        render = jax.lax.with_sharding_constraint(render, rep)
        img = sr.apply({"params": sr_params}, [style], render[..., 3:])
        if to_uint8:
            img = jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint8)
        return img

    return jax.jit(frame_fn)


def make_frame_parallel_fn(mesh: Mesh, renderer: AvatarRenderer, sr=None,
                           num_coarse: int = 64, num_fine: int = 16,
                           to_uint8: bool = False, gated: bool = False):
    """Throughput-mode counterpart of ``make_sharded_frame_fn``: shard the
    FRAME (batch) axis over ``mesh['data']`` instead of the ray axis.

    Each device runs the COMPLETE per-frame pipeline — plane generation,
    fused Pallas march, SR — on its ``B / n_devices`` frames, with ZERO
    collectives (every stage of the reference pipeline,
    avatarHD_reenactment.py:152-171, is per-frame independent). Latency per
    frame equals single-chip latency, but aggregate throughput is exactly
    ``n_devices ×`` single-chip fps — no all-gather, no replicated SR work.

    Use this for offline / batch reenactment (the reference's dominant use:
    re-rendering a whole driving sequence); use ``make_sharded_frame_fn``
    (ray sharding) when single-frame latency matters (live driving).

    Returns fn(nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T,
               front, left, right, style) with every per-frame input batched
    on axis 0 (B divisible by mesh size) — place with
    ``place_batch_inputs``. Weights/skin_vol are replicated.
    """
    ndev = mesh.size

    def frame_fn(nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T,
                 front, left, right, style):
        assert rays.shape[0] % ndev == 0, (rays.shape[0], ndev)

        def run_frames(nerf_vars, sr_params, skin_vol, rays, bg, latent,
                       inv_T, front, left, right, style):
            planes = renderer.apply(nerf_vars, latent, inv_T, front, left,
                                    right, method=_generate_planes)
            rgb, acc = renderer.apply(nerf_vars, planes, rays, bg, inv_T,
                                      skin_vol, num_coarse, num_fine, gated,
                                      method=_march)
            s = renderer.render_size
            render = rgb.reshape(rgb.shape[0], s, s, -1)
            if sr is None:
                return render
            img = sr.apply({"params": sr_params}, [style], render[..., 3:])
            if to_uint8:
                img = jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint8)
            return img

        batched = P("data")
        return jax.shard_map(
            run_frames,
            mesh=mesh,
            in_specs=(P(), P(), P(), batched, batched, batched, batched,
                      batched, batched, batched, batched),
            out_specs=batched,
            check_vma=False,
        )(nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T,
          front, left, right, style)

    return jax.jit(frame_fn)


def place_batch_inputs(mesh: Mesh, batched, replicated):
    """Device-put helper for the frame-parallel path: ``batched`` inputs
    shard on axis 0 over ``mesh['data']``; ``replicated`` go everywhere."""
    b_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    b = tuple(jax.device_put(x, b_sh) for x in batched)
    r = tuple(jax.device_put(x, rep) for x in replicated)
    return b + r


def place_frame_inputs(mesh: Mesh, rays, bg, *replicated):
    """Device-put helper: rays/bg ray-sharded, the rest replicated."""
    ray_sh = NamedSharding(mesh, P(None, "data"))
    rep = NamedSharding(mesh, P())
    rays = jax.device_put(rays, ray_sh)
    bg = jax.device_put(bg, ray_sh)
    rest = tuple(jax.device_put(x, rep) for x in replicated)
    return (rays, bg) + rest
