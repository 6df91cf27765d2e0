"""Golden-value parity tests: run the reference PyTorch modules (CPU) with
random weights, convert the weights with checkpoints/convert.py, and assert
the JAX modules reproduce the outputs.

This is tier (b) of the test strategy (SURVEY.md §4): the reference has no
tests of its own, so executable parity against its modules IS the spec.
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
    PlaneGenerator,
    StyleUNetSR,
    VolumeDecoder,
    WaveletDiscriminator,
)

torch.manual_seed(0)


def nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def tol(got, want, atol=2e-3, rtol=1e-3):
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=rtol)


def test_plane_generator_parity():
    from model.styleUnet import StyleGAN_zxc

    ref = StyleGAN_zxc(out_ch=6, out_size=32, style_dim=12, middle_size=8,
                       zero_latent=False, zero_noise=True, no_skip=True,
                       n_mlp=4, inp_size=64, inp_ch=7).eval()
    z = torch.randn(2, 12)
    cond = torch.rand(2, 7, 64, 64)
    with torch.no_grad():
        want, _ = ref([z], cond)
    want = want.numpy().transpose(0, 2, 3, 1)

    mine = PlaneGenerator(out_ch=6, out_size=32, style_dim=12, mlp_dim=32,
                          n_mlp=4, middle_size=8, inp_size=64, inp_ch=7)
    params = {"params": C.convert_plane_generator(
        ref.state_dict(), out_size=32, middle_size=8, inp_size=64, n_mlp=4)}
    got = mine.apply(params, jnp.asarray(z.numpy()), nhwc(cond))
    tol(got, want)


def test_styleunet_sr_parity():
    from model.styleUnet import SWGAN_unet

    ref = SWGAN_unet(inp_size=32, inp_ch=8, out_ch=3, out_size=128,
                     style_dim=16, n_mlp=4, middle_size=8, c_dim=0).eval()
    z = torch.randn(2, 16)
    cond = torch.rand(2, 8, 32, 32)
    zero_noise = [torch.zeros(1, 1, 2 ** ((i + 8) // 2), 2 ** ((i + 8) // 2))
                  for i in range(ref.num_layers)]
    with torch.no_grad():
        want = ref([z], cond, noise=zero_noise)
    want = want.numpy().transpose(0, 2, 3, 1)

    mine = StyleUNetSR(inp_size=32, inp_ch=8, out_ch=3, out_size=128,
                       style_dim=16, n_mlp=4, middle_size=8)
    params = {"params": C.convert_styleunet(
        ref.state_dict(), out_size=128, inp_size=32, middle_size=8, n_mlp=4)}
    got = mine.apply(params, jnp.asarray(z.numpy()), nhwc(cond))
    tol(got, want)


def test_discriminator_parity():
    from model.styleUnet import Discriminator

    ref = Discriminator(size=64, img_channel=3, channel_multiplier=2,
                        c_dim=0).eval()
    img = torch.rand(4, 3, 64, 64)
    with torch.no_grad():
        want = ref(img).numpy()

    mine = WaveletDiscriminator(size=64, img_channel=3, channel_multiplier=2)
    params = {"params": C.convert_discriminator(ref.state_dict(), size=64)}
    got = mine.apply(params, nhwc(img))
    tol(got, want, atol=5e-3, rtol=5e-3)


def test_volume_decoder_parity():
    from model.network.voxel_encoder import VolumeDecoder as RefVD

    ref = RefVD(num_in=64, num_out=1, final_res=8, up_mode="upsample").eval()
    with torch.no_grad():
        want = ref().numpy().transpose(0, 2, 3, 4, 1)  # NCDHW -> NDHWC

    mine = VolumeDecoder(num_in=64, final_res=8)
    variables = C.convert_volume_decoder(ref.state_dict(), "", final_res=8)
    got = mine.apply({"params": variables["params"],
                      "buffers": variables["buffers"]})
    tol(got, want, atol=1e-4, rtol=1e-4)


def test_full_renderer_parity():
    """End-to-end: reference Trainer (full default architecture) vs
    AvatarRenderer on a handful of rays, deterministic sampling."""
    from utils.cfgnode import CfgNode as RefCfg
    from model.nerf_trainer import Trainer as RefTrainer

    cfg = RefCfg({
        "experiment": {"latent_code_dim": 32, "model_mode": "DoublePlane",
                       "cond_pose": True, "cond_expr": False},
        "models": {
            "StyleUnet": {"inp_size": 8, "out_size": 32},
            "coarse": {"XYZ_bounding": [[-1.5, 1.5], [-1.6, 1.4], [-1.6, 1.2]]},
        },
        "nerf": {"validation": {"chunksize": 65536, "perturb": False,
                                 "num_coarse": 8, "num_fine": 4,
                                 "radiance_field_noise_std": 0.0}},
    })
    torch.manual_seed(1)
    ref = RefTrainer(cfg, latent_codes_size=3).eval()

    B, R = 1, 8
    ro = torch.tensor([[0.0, 0.0, 3.0]]).expand(R, 3)
    rd = torch.randn(R, 3) * 0.05 + torch.tensor([0.0, 0.0, -1.0])
    rd = rd / rd.norm(dim=-1, keepdim=True)
    near = torch.full((R, 1), 1.4)
    far = torch.full((R, 1), 4.0)
    ray_batch = torch.cat([ro, rd, near, far], -1).unsqueeze(0)
    bg = torch.rand(B, R, 3)
    front = torch.rand(B, 7, 256, 256)
    left = torch.rand(B, 7, 256, 256)
    right = torch.rand(B, 7, 256, 256)
    rot = torch.eye(3) + 0.05 * torch.randn(3, 3)
    trans = 0.1 * torch.randn(1, 3)
    inv_head_T = torch.cat([torch.linalg.inv(rot), -trans], 0).unsqueeze(0)

    with torch.no_grad():
        rgb_c, _, acc_c, wmax, rgb_f, _, acc_f, lat_loss = ref(
            mode="validation", fidx=[0], render_full_img=False,
            ray_batch=ray_batch, background_prior=bg,
            front_render_cond=front, left_render_cond=left,
            right_render_cond=right, inv_head_T=inv_head_T)

    from havatar_tpu.models import AvatarRenderer

    mine = AvatarRenderer()
    conv = C.convert_renderer(ref.state_dict())
    variables = conv["variables"]
    out = mine.apply(
        variables,
        jnp.asarray(ray_batch.numpy()), jnp.asarray(bg.numpy()),
        jnp.asarray(conv["latent_codes"][0:1]),
        jnp.asarray(inv_head_T.numpy()),
        nhwc(front), nhwc(left), nhwc(right),
        num_coarse=8, num_fine=4, perturb=False,
        radiance_field_noise_std=0.0)

    tol(out["rgb_coarse"], rgb_c.view(B, R, -1).numpy(), atol=3e-3, rtol=3e-3)
    tol(out["rgb_fine"], rgb_f.view(B, R, -1).numpy(), atol=3e-3, rtol=3e-3)
    tol(out["acc_fine"], acc_f.view(B, R, 1).numpy(), atol=3e-3, rtol=3e-3)
