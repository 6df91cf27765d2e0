"""Occupancy-gated sampling: ray/AABB interval math + renderer semantics.

The gated inference mode (ops/rays.py: tighten_ray_near_far) rewrites each
ray's near/far to its intersection with the avatar's world AABB so a caller
can spend fewer samples at the same spatial density. These tests pin:
  * the slab intersection against a brute-force dense-sampling oracle,
  * the parallel-axis (d == 0) edge cases,
  * head_world_aabb's containment guarantee under head transforms,
  * the renderer contract for collapsed (miss) intervals: exact background.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from havatar_tpu.ops import (
    head_world_aabb,
    ray_aabb_near_far,
    tighten_ray_near_far,
)


def _brute_force_interval(o, d, bmin, bmax, near, far, n=20001):
    """Oracle: densely sample t in [near, far], find the in-box interval."""
    t = np.linspace(near, far, n)
    pts = o[None] + t[:, None] * d[None]
    inside = np.all((pts >= bmin) & (pts <= bmax), axis=-1)
    if not inside.any():
        return None
    idx = np.where(inside)[0]
    return t[idx[0]], t[idx[-1]]


def test_ray_aabb_vs_brute_force():
    rng = np.random.RandomState(0)
    o = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    d = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bmin = np.array([-1.0, -0.8, -1.2], np.float32)
    bmax = np.array([1.0, 1.1, 0.7], np.float32)
    near = np.full((64, 1), 0.1, np.float32)
    far = np.full((64, 1), 8.0, np.float32)

    t0, t1 = ray_aabb_near_far(jnp.asarray(o), jnp.asarray(d),
                               jnp.asarray(bmin), jnp.asarray(bmax),
                               jnp.asarray(near), jnp.asarray(far))
    t0, t1 = np.asarray(t0)[:, 0], np.asarray(t1)[:, 0]
    for i in range(64):
        got = _brute_force_interval(o[i], d[i], bmin, bmax, 0.1, 8.0)
        if got is None:
            # miss => collapsed interval at near
            assert t0[i] == t1[i] == pytest.approx(0.1), (i, t0[i], t1[i])
        else:
            # dense-sampling oracle quantizes at (far-near)/n
            tol = 8.0 / 20000 * 2
            assert abs(t0[i] - got[0]) < tol, (i, t0[i], got)
            assert abs(t1[i] - got[1]) < tol, (i, t1[i], got)
        assert t1[i] >= t0[i] >= 0.1 - 1e-6 and t1[i] <= 8.0 + 1e-6


def test_ray_aabb_parallel_axis():
    bmin = jnp.asarray([-1.0, -1.0, -1.0])
    bmax = jnp.asarray([1.0, 1.0, 1.0])
    near = jnp.asarray([[0.0]])
    far = jnp.asarray([[10.0]])
    # parallel to x/y, inside both slabs: interval is the z chord
    o = jnp.asarray([[0.5, -0.5, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t0, t1 = ray_aabb_near_far(o, d, bmin, bmax, near, far)
    np.testing.assert_allclose(np.asarray(t0), [[4.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1), [[6.0]], atol=1e-6)
    # parallel and OUTSIDE the x slab: miss
    o = jnp.asarray([[1.5, 0.0, -5.0]])
    t0, t1 = ray_aabb_near_far(o, d, bmin, bmax, near, far)
    assert float(t0[0, 0]) == float(t1[0, 0]) == 0.0
    # origin exactly ON a slab face with d == 0 along it (the inf*0 NaN lane)
    o = jnp.asarray([[1.0, 0.0, -5.0]])
    t0, t1 = ray_aabb_near_far(o, d, bmin, bmax, near, far)
    assert np.isfinite(float(t0[0, 0])) and np.isfinite(float(t1[0, 0]))
    np.testing.assert_allclose(np.asarray(t1 - t0), [[2.0]], atol=1e-6)


def test_head_world_aabb_containment():
    bounds = ((-1.5, 1.5), (-1.6, 1.4), (-1.6, 1.2))
    # identity transform: AABB == the box itself
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0)[None]
    bmin, bmax = head_world_aabb(bounds, eye)
    np.testing.assert_allclose(np.asarray(bmin)[0], [-1.5, -1.6, -1.6],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(bmax)[0], [1.5, 1.4, 1.2], atol=1e-6)

    # rotated+translated head: every canonical corner's world preimage must
    # be inside the AABB (containment of box ∪ head_T·box)
    rng = np.random.RandomState(1)
    aa = rng.uniform(-0.4, 0.4, 3)
    angle = np.linalg.norm(aa)
    k = aa / angle
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
    t = rng.uniform(-0.3, 0.3, 3)
    inv_T = jnp.asarray(np.concatenate([R, t[None]], 0), jnp.float32)[None]
    bmin, bmax = head_world_aabb(bounds, inv_T)
    bmin, bmax = np.asarray(bmin)[0], np.asarray(bmax)[0]
    b = np.asarray(bounds)
    corners = np.stack(np.meshgrid(b[0], b[1], b[2], indexing="ij"),
                       -1).reshape(8, 3)
    # canonical corners themselves (identity branch of the skinning blend)
    assert (corners >= bmin - 1e-5).all() and (corners <= bmax + 1e-5).all()
    # world points whose head-transform image is a canonical corner
    world = corners @ np.linalg.inv(R) - t
    assert (world >= bmin - 1e-4).all() and (world <= bmax + 1e-4).all()


def test_tighten_preserves_layout_and_miss_renders_background():
    """Collapsed (miss) intervals must composite the EXACT background: all
    sample dists are 0 -> alpha 0 -> weights 0."""
    from havatar_tpu.models import AvatarRenderer
    from havatar_tpu.models.renderer import AvatarRenderer as AR

    renderer = AvatarRenderer(latent_code_dim=8, plane_feat_dim=16,
                              plane_res=16, cond_res=32, plane_middle_size=4,
                              feat_dim=16, render_size=4, skin_vol_res=8)
    B, R = 1, 16
    # rays pointing AWAY from the box (+z from z=3): all miss
    rays = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0),
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 1.0),
        jnp.full((B, R, 1), 0.5), jnp.full((B, R, 1), 4.0)], -1)
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    gated = tighten_ray_near_far(rays, renderer.xyz_bounding, inv_T)
    assert gated.shape == rays.shape
    np.testing.assert_array_equal(np.asarray(gated[..., :6]),
                                  np.asarray(rays[..., :6]))
    # all rays miss: near' == far' == near
    np.testing.assert_allclose(np.asarray(gated[..., 6]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gated[..., 7]), 0.5, atol=1e-6)

    bg = jax.random.uniform(jax.random.PRNGKey(3), (B, R, 3))
    lat = jnp.zeros((B, 8))
    conds = [jnp.full((B, 32, 32, 7), 0.4)] * 3
    nv = renderer.init(jax.random.PRNGKey(0), rays, bg, lat, inv_T, *conds,
                       num_coarse=4, num_fine=2, perturb=False)
    out = renderer.apply(nv, gated, bg, lat, inv_T, *conds,
                         num_coarse=4, num_fine=2, perturb=False)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"][..., :3]),
                               np.asarray(bg), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["acc_fine"]), 0.0, atol=1e-6)


@pytest.mark.parametrize("nc,nf,floor", [(32, 16, 48.0), (16, 16, 43.0)])
def test_gated_render_matches_blind_on_real_density(nc, nf, floor):
    """Render-level fidelity of gating on ACTUALLY-TIGHTENED intervals over
    nonzero density: blind 64+16 over a slack [near, far] vs the gated
    schedule under test over the per-ray box chord, compared as PSNR on
    the composited rgb. Covers BOTH bench operating points: gated 32+16
    (quality knee, 50.0 dB cross-impl agreement) and gated 16+16 (the
    throughput default, 47.6 dB) — docs/PERF.md round 5.

    Random init renders an almost-empty scene (any two schedules trivially
    agree), so the field weights get CONSTRUCTED surgery making the density
    box-contained BY the feature zero-padding (the structure mask-BCE
    training produces, train_avatar.py:131-136):
      * the ZY generator's conv_out act_bias is set to +1, so ZY plane
        features are ~1 across the plane and exactly 0 outside the box in
        (z, y) — the axes these near-axial rays actually traverse (XY-plane
        features cannot gate z: they don't depend on it, which is why a
        scale-everything surgery leaks density past the box and fails);
      * hidden unit 0 is rewired to carry mean(ZY feats) through both
        relu layers, and fc_alpha reads ONLY it: sigma = 2*h1[0] - 0.5 —
        ~+1.5 in-box, -0.5 outside. rgb keeps the random init paths.
    This is the WORST case for a sampling-schedule change (a hard density
    step at the box faces: quadrature disagreement is maximal at edges),
    measured 44.2 dB (docs/PERF.md round 5). The cross-implementation dB
    numbers for the exact BENCH configuration live in
    test_torch_checkpoint_files.py::test_stage2_checkpoint_file_gated_fidelity;
    this one is torch-free and pins the renderer-level contract."""
    import jax.numpy as jnp

    from havatar_tpu.models import AvatarRenderer

    renderer = AvatarRenderer(latent_code_dim=8, plane_feat_dim=16,
                              plane_res=16, cond_res=32, plane_middle_size=4,
                              feat_dim=16, render_size=16, skin_vol_res=8)
    B, R = 1, 256
    rng = jax.random.PRNGKey(7)
    # diverging portrait rays from z=3 with SLACK near/far [0.5, 6.0]:
    # the box chord is ~[1.8, 4.6], so tightening is a real ~2x cut and
    # blind-64 spacing (5.5/64=0.086) ~= gated-32 spacing (2.8/32=0.088)
    d = jax.random.normal(rng, (B, R, 3)) * 0.05 + jnp.asarray([0., 0., -1.])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0), d,
        jnp.full((B, R, 1), 0.5), jnp.full((B, R, 1), 6.0)], -1)
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    bg = jax.random.uniform(jax.random.PRNGKey(3), (B, R, 3))
    lat = jnp.zeros((B, 8))
    conds = [jax.random.uniform(jax.random.PRNGKey(11 + i), (B, 32, 32, 7))
             for i in range(3)]
    nv = renderer.init(jax.random.PRNGKey(0), rays, bg, lat, inv_T, *conds,
                       num_coarse=4, num_fine=2, perturb=False)
    # constructed density surgery (see docstring). Layer0 input layout is
    # [plane feats (2C, channel-interleaved c*P+p with p=1 the ZY plane —
    # models/nerf_field.py field_inputs), posenc(48)].
    p = jax.tree_util.tree_map(lambda x: x, nv)  # shallow-copyable pytree
    f = p["params"]["field"]
    C = renderer.plane_feat_dim
    yz = f["YZ_gen"]
    yz["conv_out"] = {**yz["conv_out"],
                      "act_bias": yz["conv_out"]["act_bias"] * 0.0 + 1.0}
    k0 = f["layer0"]["kernel"]
    col0 = jnp.zeros((k0.shape[0],)).at[1:2 * C:2].set(1.0 / C)
    f["layer0"]["kernel"] = k0.at[:, 0].set(col0)
    f["layer0"]["bias"] = f["layer0"]["bias"].at[0].set(0.0)
    f["layer1"]["kernel"] = (f["layer1"]["kernel"]
                             .at[:, 0].set(0.0).at[0, 0].set(1.0))
    f["layer1"]["bias"] = f["layer1"]["bias"].at[0].set(0.0)
    f["fc_alpha"]["kernel"] = (f["fc_alpha"]["kernel"] * 0.0).at[0, 0].set(2.0)
    f["fc_alpha"]["bias"] = f["fc_alpha"]["bias"] * 0.0 - 0.5

    # production gating uses gate_aabb — the box expanded by one plane
    # texel so the bilinear zero-padding overhang (where edge density
    # ramps to 0 one texel past the face) stays inside the interval
    gated = tighten_ray_near_far(rays, renderer.gate_aabb, inv_T)
    span_blind = np.asarray(rays[..., 7] - rays[..., 6])
    span_gated = np.asarray(gated[..., 7] - gated[..., 6])
    # the intervals must be REALLY tightened (this is what the round-4
    # version of this test failed to arrange)
    assert span_gated.mean() < 0.65 * span_blind.mean()
    assert (span_gated > 0).all()   # all rays hit

    blind_out = renderer.apply(p, rays, bg, lat, inv_T, *conds,
                               num_coarse=64, num_fine=16, perturb=False)
    gated_out = renderer.apply(p, gated, bg, lat, inv_T, *conds,
                               num_coarse=nc, num_fine=nf, perturb=False)
    rgb_b = np.asarray(blind_out["rgb_fine"][..., :3])
    rgb_g = np.asarray(gated_out["rgb_fine"][..., :3])
    acc = np.asarray(blind_out["acc_fine"])
    # the scene is real: opaque rays, foreground differs from background
    assert acc.mean() > 0.5, f"scene too empty (acc {acc.mean():.4f})"
    assert np.abs(rgb_b - np.asarray(bg)).mean() > 0.05

    mse = float(np.mean((np.clip(rgb_g, 0, 1) - np.clip(rgb_b, 0, 1)) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-20))
    # measured 51.9 dB (32+16) / 46.9 dB (16+16) on this scenario with
    # gate_aabb halo gating (44.2 / 42.2 before the halo — docs/PERF.md
    # round 5); the floors leave ~4 dB for platform noise.
    # A gating-math regression (wrong AABB, wrong interval, broken per-ray
    # near/far) lands tens of dB below this (the pre-fix no-op test scored
    # 8.4 dB on a leaking scene).
    print(f"gated {nc}+{nf} vs blind 64+16: {psnr:.2f} dB")
    assert psnr >= floor, f"gated-vs-blind render PSNR {psnr:.2f} dB"

    # and when the box already spans the chord, tightening is a no-op
    inside = jnp.concatenate([rays[..., :6], jnp.full((B, R, 1), 2.0),
                              jnp.full((B, R, 1), 4.0)], -1)
    noop = tighten_ray_near_far(inside, renderer.xyz_bounding, inv_T)
    np.testing.assert_allclose(np.asarray(noop), np.asarray(inside),
                               atol=1e-6)
