"""Multi-chip serving path on the 8-device virtual CPU mesh: the ray-sharded
(shard_map) frame function must produce identical output to single-device
rendering — including with the fused Pallas march kernels (interpret mode on
CPU), since shard_map is exactly the mechanism that keeps those kernels alive
on a mesh (GSPMD cannot partition a Pallas custom call)."""

import numpy as np

import jax
import jax.numpy as jnp

from havatar_tpu.infer.serving import (
    make_frame_parallel_fn, make_sharded_frame_fn, place_batch_inputs,
    place_frame_inputs)
from havatar_tpu.models import AvatarRenderer, StyleUNetSR
from havatar_tpu.models.renderer import AvatarRenderer as AR
from havatar_tpu.parallel import make_mesh


import pytest


@pytest.mark.slow
def test_ray_sharded_frame_matches_single_device():
    assert jax.device_count() >= 8
    mesh = make_mesh(("data",))

    renderer = AvatarRenderer(latent_code_dim=8, plane_feat_dim=16,
                              plane_res=16, cond_res=32, plane_middle_size=4,
                              feat_dim=16, render_size=8, skin_vol_res=8)
    sr = StyleUNetSR(inp_size=8, inp_ch=16, out_ch=3, out_size=32,
                     style_dim=16, n_mlp=2, middle_size=4,
                     channel_multiplier=1)

    B, R = 1, 64
    rays = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0),
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), -1.0),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    bg = jnp.ones((B, R, 3))
    latent = jnp.zeros((B, 8))
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    conds = [jnp.full((B, 32, 32, 7), 0.4)] * 3
    style = jnp.zeros((B, 16))

    rng = jax.random.PRNGKey(0)
    nerf_vars = renderer.init(rng, rays, bg, latent, inv_T, *conds,
                              num_coarse=4, num_fine=2, perturb=False)
    sr_vars = sr.init(rng, style, jnp.zeros((B, 8, 8, 16)))
    skin_vol = renderer.apply(nerf_vars, method=AR.skin_volume)

    # single device
    render, _ = renderer.apply(nerf_vars, rays, bg, latent, inv_T, *conds,
                               num_coarse=4, num_fine=2, perturb=False,
                               fixed_volume=skin_vol,
                               method=AR.render_full_image)
    want = sr.apply({"params": sr_vars["params"]}, [style], render[..., 3:])

    # sharded over 8 devices
    fn = make_sharded_frame_fn(mesh, renderer, sr, num_coarse=4, num_fine=2)
    rays_s, bg_s, *rest = place_frame_inputs(
        mesh, rays, bg, nerf_vars, sr_vars["params"], skin_vol, latent,
        inv_T, *conds, style)
    nerf_v, sr_p, vol, lat, iT, f, l, r, st = rest
    got = fn(nerf_v, sr_p, vol, rays_s, bg_s, lat, iT, f, l, r, st)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_shard_map_keeps_pallas_march():
    """The production multi-chip route: the fused Pallas march inside
    shard_map (interpret mode on CPU) must match (a) the single-device fused
    path exactly and (b) the XLA math within kernel tolerance."""
    assert jax.device_count() >= 8
    mesh = make_mesh(("data",))

    kw = dict(latent_code_dim=8, plane_feat_dim=16, plane_res=16, cond_res=32,
              plane_middle_size=4, feat_dim=16, render_size=8, skin_vol_res=8)
    renderer_f = AvatarRenderer(use_pallas_march=True, **kw)
    renderer_x = AvatarRenderer(**kw)

    B, R = 1, 64
    rays = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0),
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), -1.0),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    bg = jnp.ones((B, R, 3))
    latent = jnp.zeros((B, 8))
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    conds = [jnp.full((B, 32, 32, 7), 0.4)] * 3

    rng = jax.random.PRNGKey(0)
    nerf_vars = renderer_x.init(rng, rays, bg, latent, inv_T, *conds,
                                num_coarse=4, num_fine=2, perturb=False)
    skin_vol = renderer_x.apply(nerf_vars, method=AR.skin_volume)

    # single-device references: fused (interpret) and XLA
    want_fused, _ = renderer_f.apply(nerf_vars, rays, bg, latent, inv_T,
                                     *conds, num_coarse=4, num_fine=2,
                                     perturb=False, fixed_volume=skin_vol,
                                     method=AR.render_full_image)
    want_xla, _ = renderer_x.apply(nerf_vars, rays, bg, latent, inv_T,
                                   *conds, num_coarse=4, num_fine=2,
                                   perturb=False, fixed_volume=skin_vol,
                                   method=AR.render_full_image)

    fn = make_sharded_frame_fn(mesh, renderer_f, sr=None,
                               num_coarse=4, num_fine=2)
    rays_s, bg_s, *rest = place_frame_inputs(
        mesh, rays, bg, nerf_vars, skin_vol, latent, inv_T, *conds)
    nerf_v, vol, lat, iT, f, l, r = rest
    got = fn(nerf_v, None, vol, rays_s, bg_s, lat, iT, f, l, r, None)

    # shard_map(fused) == single-device fused: same kernels on ray shards
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_fused),
                               atol=1e-6, rtol=1e-6)
    # and the fused math stays within kernel tolerance of the XLA march
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_xla),
                               atol=3e-2, rtol=3e-2)


def test_frame_parallel_matches_single_device():
    """Throughput mode: 8 frames sharded one-per-device, each device running
    the FULL pipeline (planes -> fused Pallas march -> SR) with zero
    collectives, must equal the single-device batch."""
    assert jax.device_count() >= 8
    mesh = make_mesh(("data",))

    renderer = AvatarRenderer(use_pallas_march=True, latent_code_dim=8,
                              plane_feat_dim=16, plane_res=16, cond_res=32,
                              plane_middle_size=4, feat_dim=16, render_size=8,
                              skin_vol_res=8)
    sr = StyleUNetSR(inp_size=8, inp_ch=16, out_ch=3, out_size=32,
                     style_dim=16, n_mlp=2, middle_size=4,
                     channel_multiplier=1)

    B, R = 8, 64
    rng = jax.random.PRNGKey(1)
    k = iter(jax.random.split(rng, 10))
    rays = jnp.concatenate([
        jax.random.normal(next(k), (B, R, 2)) * 0.1,
        jnp.full((B, R, 1), 3.0),
        jax.random.normal(next(k), (B, R, 2)) * 0.05,
        jnp.full((B, R, 1), -1.0),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    bg = jnp.ones((B, R, 3))
    latent = jax.random.normal(next(k), (B, 8)) * 0.1
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    conds = [jax.random.uniform(next(k), (B, 32, 32, 7))] * 3
    style = jax.random.normal(next(k), (B, 16)) * 0.1

    nerf_vars = renderer.init(jax.random.PRNGKey(0), rays, bg, latent, inv_T,
                              *conds, num_coarse=4, num_fine=2, perturb=False)
    sr_vars = sr.init(jax.random.PRNGKey(0), style, jnp.zeros((B, 8, 8, 16)))
    skin_vol = renderer.apply(nerf_vars, method=AR.skin_volume)

    render, _ = renderer.apply(nerf_vars, rays, bg, latent, inv_T, *conds,
                               num_coarse=4, num_fine=2, perturb=False,
                               fixed_volume=skin_vol,
                               method=AR.render_full_image)
    want = sr.apply({"params": sr_vars["params"]}, [style], render[..., 3:])

    fn = make_frame_parallel_fn(mesh, renderer, sr, num_coarse=4, num_fine=2)
    rays_s, bg_s, lat, iT, f, l, r, st, nerf_v, sr_p, vol = place_batch_inputs(
        mesh, (rays, bg, latent, inv_T, *conds, style),
        (nerf_vars, sr_vars["params"], skin_vol))
    got = fn(nerf_v, sr_p, vol, rays_s, bg_s, lat, iT, f, l, r, st)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
