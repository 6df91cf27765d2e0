"""Parity for the reference's non-default model variants: the two_head /
shared_backbone plane-generator topologies (model/nerf_model.py:28-42), the
pose-conditional discriminator head (c_dim>0, model/styleUnet.py:514-533,
556-559), and the SH-shaded radiance head (sh_deg>0, model/nerf_model.py:113).

Same protocol as test_parity_torch.py: run the reference torch modules with
random weights, convert, assert the JAX modules reproduce the outputs.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import torch_oracle

torch_oracle.install()

from havatar_tpu.checkpoints import convert as C  # noqa: E402
from havatar_tpu.models import (  # noqa: E402
    TwoHeadPlaneGenerator,
    WaveletDiscriminator,
)
from havatar_tpu.models.nerf_field import DoublePlaneNeRFField  # noqa: E402

torch.manual_seed(0)


def nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def tol(got, want, atol=2e-3, rtol=1e-3):
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=rtol)


def test_two_head_generator_parity():
    from model.styleUnet import StyleGAN_zxc_twoHead

    # the reference hardcodes device='cuda:0' in its zero_noise construction
    # (model/styleUnet.py:1020) — CPU-retarget it for the oracle run
    class CpuTwoHead(StyleGAN_zxc_twoHead):
        def make_noise(self, device, zero_noise=False):
            return super().make_noise("cpu", zero_noise=zero_noise)

    ref = CpuTwoHead(out_ch=6, out_size=32, style_dim=12, middle_size=8,
                     split_size=16, zero_latent=False, zero_noise=True,
                     no_skip=True, n_mlp=4, inp_size=64,
                     inp_ch=[7, 13]).eval()
    z = torch.randn(2, 12)
    front = torch.rand(2, 7, 64, 64)
    side = torch.rand(2, 13, 64, 64)
    with torch.no_grad():
        want0, want1 = ref([z], [front, side])
    want0 = want0.numpy().transpose(0, 2, 3, 1)
    want1 = want1.numpy().transpose(0, 2, 3, 1)

    mine = TwoHeadPlaneGenerator(out_ch=6, out_size=32, style_dim=12,
                                 mlp_dim=32, n_mlp=4, middle_size=8,
                                 split_size=16, inp_size=64, inp_ch=(7, 13))
    params = {"params": C.convert_two_head_generator(
        ref.state_dict(), out_size=32, middle_size=8, split_size=16,
        inp_size=64, n_mlp=4)}
    got0, got1 = mine.apply(params, jnp.asarray(z.numpy()), nhwc(front),
                            nhwc(side))
    tol(got0, want0)
    tol(got1, want1)


def test_discriminator_cdim_parity():
    from model.styleUnet import Discriminator

    ref = Discriminator(size=64, img_channel=3, channel_multiplier=2,
                        c_dim=9).eval()
    img = torch.rand(4, 3, 64, 64)
    pose = torch.randn(4, 9)
    with torch.no_grad():
        want = ref(img, flat_pose=pose).numpy()

    mine = WaveletDiscriminator(size=64, img_channel=3,
                                channel_multiplier=2, c_dim=9)
    params = {"params": C.convert_discriminator(ref.state_dict(), size=64,
                                                c_dim=9)}
    got = mine.apply(params, nhwc(img), jnp.asarray(pose.numpy()))
    tol(got, want, atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("sh_deg", [1, 2])
def test_sh_radiance_head_parity(sh_deg):
    """sh_deg>0: fc_rgb emits SH coefficients, shaded by view direction
    (model/nerf_model.py:100-117 with eval_sh, utils/sh_util.py)."""
    from model.nerf_model import (
        ConditionalTriplaneNeRFModel_multiRender_split_view as RefField,
    )

    bounds = [[-1.5, 1.5], [-1.6, 1.4], [-1.6, 1.2]]
    torch.manual_seed(2)
    ref = RefField(XYZ_bounding=bounds, num_encoding_fn_xyz=8,
                   latent_code_dim=32, triPlane_feat_dim=8, rgb_feat_dim=3,
                   triplane_res=32, sh_deg=sh_deg, cond_latent=True).eval()

    B, N, Cp = 1, 17, 8
    pts = torch.rand(B, N, 3) * 1.6 - 0.8
    dirs = torch.randn(B, N, 3)
    dirs = dirs / dirs.norm(dim=-1, keepdim=True)
    planes = torch.randn(2, B, Cp, 32, 32)

    with torch.no_grad():
        ref.triPlane_embeddings = planes
        pts_feat = ref.sample_pts_triplane_feat(pts)          # [BN, 2C]
        inp = torch.cat([pts, dirs], -1).reshape(B * N, 6)
        want = ref.forward(inp, pts_feat).reshape(B, N, -1).numpy()

    mine = DoublePlaneNeRFField(
        xyz_bounding=tuple(tuple(b) for b in bounds),
        latent_code_dim=32, plane_feat_dim=Cp, plane_res=32,
        sh_deg=sh_deg)
    sd = ref.state_dict()
    params = {
        "layer0": C._kernel(C._linear(sd, "layers_xyz.0")),
        "layer1": C._kernel(C._linear(sd, "layers_xyz.1")),
        "fc_alpha": C._kernel(C._linear(sd, "fc_alpha")),
        "fc_rgbFeat": C._kernel(C._linear(sd, "fc_rgbFeat")),
        "fc_rgb": C._kernel(C._linear(sd, "fc_rgb")),
    }
    planes_j = jnp.asarray(planes.numpy().transpose(0, 1, 3, 4, 2))
    got = mine.apply({"params": params}, jnp.asarray(pts.numpy()),
                     jnp.asarray(dirs.numpy()), planes_j)
    # reference output layout: [shaded rgb (3), feat (64), alpha (1)]
    tol(got, want, atol=3e-3, rtol=3e-3)


def test_enc_mode_variants_run_end_to_end():
    """shared_backbone / two_head fields produce well-formed planes and
    radiance through generate_planes (the reference's own shared_backbone
    construction is non-functional — see generators.py docstring — so this
    pins the intended semantics rather than torch outputs)."""
    import jax

    B, Cp = 1, 8
    rng = jax.random.PRNGKey(0)
    latents = jnp.zeros((B, 32))
    cond_c = jnp.zeros((B, 12))
    # two_head: plane_res must EXCEED the hardcoded split_size=32 so the
    # per-plane heads have at least one encoder-injected stage (at
    # plane_res=32 the heads are empty and TwoHeadPlaneGenerator asserts)
    for mode, plane_res, cond_res in (("shared_backbone", 32, 64),
                                      ("two_head", 64, 128)):
        conds = [jnp.full((B, cond_res, cond_res, 7), 0.5)] * 3
        field = DoublePlaneNeRFField(
            latent_code_dim=44, plane_feat_dim=Cp, plane_res=plane_res,
            cond_res=cond_res, plane_middle_size=16, enc_mode=mode)
        variables = field.init(rng, latents, cond_c, *conds,
                               method=field.generate_planes)
        planes = field.apply(variables, latents, cond_c, *conds,
                             method=field.generate_planes)
        assert planes.shape == (2, B, plane_res, plane_res, Cp), (
            mode, planes.shape)
        assert bool(jnp.all(jnp.isfinite(planes))), mode
        # the two planes must differ (distinct heads / channel halves)
        assert float(jnp.max(jnp.abs(planes[0] - planes[1]))) > 1e-4, mode
        if mode == "two_head":
            # cond injection must reach the planes: different condition
            # images -> different planes (the degenerate-head failure mode
            # ADVICE r4 flagged produced pose-independent planes)
            conds2 = [c + 0.25 for c in conds]
            planes2 = field.apply(variables, latents, cond_c, *conds2,
                                  method=field.generate_planes)
            assert float(jnp.max(jnp.abs(planes - planes2))) > 1e-4


def test_converter_variant_auto_dispatch():
    """convert_nerf_field / convert_discriminator detect the reference
    variant from state-dict keys (ADVICE r4: the top-level converters were
    split/c_dim=0-only — a two_head checkpoint would KeyError and a
    pose-conditional discriminator's mapping.* weights were dropped)."""
    from model.styleUnet import Discriminator, StyleGAN_zxc, StyleGAN_zxc_twoHead

    class CpuTwoHead(StyleGAN_zxc_twoHead):
        def make_noise(self, device, zero_noise=False):
            return super().make_noise("cpu", zero_noise=zero_noise)

    def mlp_keys(feat_dim):
        sd = {}
        dims = [("layers_xyz.0", 2 * feat_dim + 48, 128),
                ("layers_xyz.1", 128, 128), ("fc_alpha", 128, 1),
                ("fc_rgbFeat", 128, 64), ("fc_rgb", 64, 3)]
        for name, i, o in dims:
            sd[f"{name}.weight"] = torch.randn(o, i)
            sd[f"{name}.bias"] = torch.randn(o)
        return sd

    # two_head: single XY_gen with convs_head keys -> TwoHead converter
    th = CpuTwoHead(out_ch=6, out_size=64, style_dim=12, middle_size=8,
                    split_size=16, zero_latent=False, zero_noise=True,
                    no_skip=True, n_mlp=4, inp_size=64, inp_ch=[7, 13]).eval()
    sd = {f"XY_gen.{k}": v for k, v in th.state_dict().items()}
    sd.update(mlp_keys(6))
    assert C.detect_nerf_enc_mode(sd, prefix="") == "two_head"
    params = C.convert_nerf_field(sd, prefix="")
    assert "YZ_gen" not in params
    assert "head0_conv0" in params["XY_gen"], sorted(params["XY_gen"])[:8]
    want = C.convert_two_head_generator(th.state_dict(), out_size=64,
                                        middle_size=8, split_size=16,
                                        inp_size=64, n_mlp=4)
    assert set(params["XY_gen"]) == set(want)
    # geometry recovery must be value-exact, not just key-compatible
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params["XY_gen"], want)

    # shared_backbone: single double-width StyleGAN_zxc, no head keys
    # no_skip=True: the intended sb configuration (the reference's own
    # sb construction omits it and is non-functional — generators.py)
    sb = StyleGAN_zxc(out_ch=12, out_size=32, style_dim=12, middle_size=16,
                      zero_latent=False, zero_noise=True, no_skip=True,
                      n_mlp=4, inp_size=64, inp_ch=20).eval()
    sd = {f"XY_gen.{k}": v for k, v in sb.state_dict().items()}
    sd.update(mlp_keys(6))
    assert C.detect_nerf_enc_mode(sd, prefix="") == "shared_backbone"
    params = C.convert_nerf_field(sd, prefix="")
    assert "YZ_gen" not in params and "conv_in" in params["XY_gen"]

    # discriminator: c_dim auto-detection keeps the projection head
    d9 = Discriminator(size=64, img_channel=3, channel_multiplier=2,
                       c_dim=9).eval()
    out = C.convert_discriminator(d9.state_dict(), size=64)
    assert "mapping0" in out and "mapping3" in out
    d0 = Discriminator(size=64, img_channel=3, channel_multiplier=2,
                       c_dim=0).eval()
    out = C.convert_discriminator(d0.state_dict(), size=64)
    assert "mapping0" not in out


def test_two_head_checkpoint_through_field():
    """A two_head reference checkpoint drives OUR field end-to-end: the
    auto-dispatched converter output slots into DoublePlaneNeRFField(
    enc_mode='two_head') at the field's hardcoded split (32) and
    reproduces the torch generator's planes through generate_planes —
    the path cli/reenact.py takes after detecting enc_mode from a torch
    file (the reference's own trainer hardcodes 'split', so two_head
    checkpoints come from direct model construction)."""
    from model.styleUnet import StyleGAN_zxc_twoHead

    from havatar_tpu.models.nerf_field import DoublePlaneNeRFField

    class CpuTwoHead(StyleGAN_zxc_twoHead):
        def make_noise(self, device, zero_noise=False):
            return super().make_noise("cpu", zero_noise=zero_noise)

    Cp, L = 8, 32
    # middle_size=8 — the reference's two_head construction value
    # (model/nerf_model.py:36), which the field hardcodes to match
    ref = CpuTwoHead(out_ch=Cp, out_size=64, style_dim=L + 12,
                     middle_size=8, split_size=32, zero_latent=False,
                     zero_noise=True, no_skip=True, n_mlp=4, inp_size=128,
                     inp_ch=[7, 13]).eval()
    sd = {f"XY_gen.{k}": v for k, v in ref.state_dict().items()}
    dims = [("layers_xyz.0", 2 * Cp + 48, 128), ("layers_xyz.1", 128, 128),
            ("fc_alpha", 128, 1), ("fc_rgbFeat", 128, 64), ("fc_rgb", 64, 3)]
    for name, i, o in dims:
        sd[f"{name}.weight"] = torch.randn(o, i)
        sd[f"{name}.bias"] = torch.randn(o)
    assert C.detect_nerf_enc_mode(sd, prefix="") == "two_head"
    params = C.convert_nerf_field(sd, prefix="")

    field = DoublePlaneNeRFField(
        latent_code_dim=L + 12, plane_feat_dim=Cp, plane_res=64,
        cond_res=128, plane_middle_size=16, enc_mode="two_head")
    B = 2
    torch.manual_seed(5)
    latents = torch.randn(B, L)
    cond_c = torch.randn(B, 12)
    front = torch.rand(B, 7, 128, 128)
    left = torch.rand(B, 7, 128, 128)
    right = torch.rand(B, 7, 128, 128)

    planes = field.apply(
        {"params": params}, jnp.asarray(latents.numpy()),
        jnp.asarray(cond_c.numpy()), nhwc(front), nhwc(left), nhwc(right),
        method=DoublePlaneNeRFField.generate_planes)

    # the torch oracle fed exactly what generate_planes assembles:
    # z = [latents, cond_c]; side = [flip(left) minus mask ch, right]
    z = torch.cat([latents, cond_c], -1)
    side = torch.cat([torch.flip(left, dims=[3])[:, :-1], right], 1)
    with torch.no_grad():
        want_xy, want_zy = ref([z], [front, side])
    tol(np.asarray(planes[0]), want_xy.numpy().transpose(0, 2, 3, 1))
    tol(np.asarray(planes[1]), want_zy.numpy().transpose(0, 2, 3, 1))
