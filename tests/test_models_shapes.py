"""Shape/smoke tests for the model stack on tiny configs (fast on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from havatar_tpu.models import (
    AvatarRenderer,
    DoublePlaneNeRFField,
    PlaneGenerator,
    SkinningField,
    StyleUNetSR,
    VolumeDecoder,
    WaveletDiscriminator,
    fix_canonical_volume,
)


def test_plane_generator_tiny():
    gen = PlaneGenerator(out_ch=8, out_size=32, style_dim=12, mlp_dim=8,
                         n_mlp=2, middle_size=8, inp_size=64, inp_ch=7)
    rng = jax.random.PRNGKey(0)
    z = jnp.ones((2, 12))
    cond = jnp.ones((2, 64, 64, 7))
    params = gen.init(rng, z, cond)
    out = gen.apply(params, z, cond)
    assert out.shape == (2, 32, 32, 8)


def test_styleunet_sr_tiny():
    sr = StyleUNetSR(inp_size=32, inp_ch=8, out_ch=3, out_size=128,
                     style_dim=16, n_mlp=2, middle_size=8)
    rng = jax.random.PRNGKey(0)
    z = jnp.ones((2, 16))
    cond = jnp.ones((2, 32, 32, 8))
    params = sr.init(rng, z, cond)
    out = sr.apply(params, z, cond)
    assert out.shape == (2, 128, 128, 3)


def test_discriminator_tiny():
    d = WaveletDiscriminator(size=64, img_channel=3)
    rng = jax.random.PRNGKey(0)
    img = jnp.ones((4, 64, 64, 3))
    params = d.init(rng, img)
    out = d.apply(params, img)
    assert out.shape == (4, 1)


def test_volume_decoder_and_fix():
    vd = VolumeDecoder(num_in=64, final_res=8)
    params = vd.init(jax.random.PRNGKey(0))
    vol = vd.apply(params)
    assert vol.shape == (1, 8, 8, 8, 2)
    np.testing.assert_allclose(
        np.asarray(vol[..., 0] + vol[..., 1]), 1.0, atol=1e-6)
    fixed = fix_canonical_volume(vol)
    assert np.all(np.asarray(fixed[:, :, 0, :, 1]) == 1.0)
    np.testing.assert_allclose(
        np.asarray(fixed[..., 0]), np.asarray(1 - fixed[..., 1]), atol=1e-7)


def test_skinning_identity_transform():
    """With inv_head_T == identity both candidates coincide, so the output
    must equal the input regardless of the learned weights."""
    sk = SkinningField(scales=(0.5, 0.5, 0.5), trans=(0.0, 0.0, 0.0), vol_res=8)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (2, 17, 3))
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0)
    inv_T = jnp.broadcast_to(eye, (2, 4, 3))
    params = sk.init(rng, pts, dirs, inv_T)
    out_pts, out_dirs = sk.apply(params, pts, dirs, inv_T)
    np.testing.assert_allclose(np.asarray(out_pts), np.asarray(pts), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_dirs), np.asarray(dirs), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_renderer():
    model = AvatarRenderer(
        latent_code_dim=8, plane_feat_dim=16, plane_res=32, cond_res=32,
        render_size=4, skin_vol_res=8)
    B, R = 2, 16
    rays = jnp.concatenate([
        jnp.zeros((B, R, 3)),                      # origins
        jnp.tile(jnp.asarray([0., 0., 1.]), (B, R, 1)),  # dirs
        jnp.full((B, R, 1), 0.5), jnp.full((B, R, 1), 2.0),
    ], axis=-1)
    bg = jnp.ones((B, R, 3))
    latent = jnp.zeros((B, 8))
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    conds = [jnp.ones((B, 32, 32, 7))] * 3
    params = model.init(
        jax.random.PRNGKey(0), rays, bg, latent, inv_T, *conds,
        num_coarse=8, num_fine=4, perturb=False)
    return model, params, (rays, bg, latent, inv_T, *conds)


def test_renderer_outputs(tiny_renderer):
    model, params, args = tiny_renderer
    out = model.apply(params, *args, num_coarse=8, num_fine=4, perturb=False)
    B, R = 2, 16
    assert out["rgb_coarse"].shape == (B, R, 67)   # 3 rgb + 64 feat
    assert out["rgb_fine"].shape == (B, R, 67)
    assert out["acc_fine"].shape == (B, R, 1)
    assert np.all(np.isfinite(np.asarray(out["rgb_fine"])))


def test_renderer_full_image_and_jit(tiny_renderer):
    model, params, args = tiny_renderer
    f = jax.jit(lambda p, *a: model.apply(
        p, *a, num_coarse=8, num_fine=4, perturb=False,
        method=AvatarRenderer.render_full_image))
    render, mask = f(params, *args)
    assert render.shape == (2, 4, 4, 67)
    assert mask.shape == (2, 4, 4, 1)


def test_renderer_stochastic_path(tiny_renderer):
    model, params, args = tiny_renderer
    out = model.apply(params, *args, num_coarse=8, num_fine=4, perturb=True,
                      radiance_field_noise_std=0.1,
                      rng=jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(out["rgb_fine"])))


def test_renderer_grads_flow(tiny_renderer):
    model, params, args = tiny_renderer

    def loss_fn(p):
        out = model.apply(p, *args, num_coarse=4, num_fine=2, perturb=False)
        return jnp.mean(jnp.square(out["rgb_fine"][..., :3]))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads["params"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
