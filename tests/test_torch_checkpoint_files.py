"""Integration: real torch-saved checkpoint FILES (the reference's stage-1 /
stage-2 layouts, built from the reference's own modules) load through
checkpoints.convert and the reenactment CLI loader."""

import os

import numpy as np
import pytest
import torch

from tests import torch_oracle

torch_oracle.install()

from havatar_tpu.checkpoints import convert as C  # noqa: E402


@pytest.fixture(scope="module")
def reference_modules():
    from utils.cfgnode import CfgNode as RefCfg
    from model.nerf_trainer import Trainer as RefTrainer
    from model.styleUnet import Discriminator, SWGAN_unet

    cfg = RefCfg({
        "experiment": {"latent_code_dim": 32, "model_mode": "DoublePlane",
                       "cond_pose": True, "cond_expr": False},
        "models": {
            "StyleUnet": {"inp_size": 128, "out_size": 512},
            "coarse": {"XYZ_bounding": [[-1.5, 1.5], [-1.6, 1.4], [-1.6, 1.2]]},
        },
        "nerf": {"validation": {"chunksize": 65536, "perturb": False,
                                 "num_coarse": 8, "num_fine": 4,
                                 "radiance_field_noise_std": 0.0}},
    })
    torch.manual_seed(0)
    trainer = RefTrainer(cfg, latent_codes_size=3)
    g = SWGAN_unet(inp_size=128, inp_ch=64, out_ch=3, out_size=512,
                   style_dim=64, n_mlp=4, middle_size=8, c_dim=0)
    d = Discriminator(512, 3, channel_multiplier=2, c_dim=0)
    return trainer, g, d


def test_stage1_checkpoint_file(tmp_path, reference_modules):
    trainer, _, _ = reference_modules
    path = str(tmp_path / "checkpoint00100.ckpt")
    torch.save({"iter": 100, "trainer_state_dict": trainer.state_dict(),
                "optimizer_state_dict": {}, "loss": 0.1, "psnr": 30.0}, path)

    out = C.convert_stage1_checkpoint(path)
    assert out["iter"] == 100
    p = out["variables"]["params"]
    assert out["latent_codes"].shape == (3, 32)
    assert p["field"]["layer0"]["kernel"].shape == (176, 128)
    assert p["field"]["XY_gen"]["conv_in"]["conv"]["weight"].shape == (3, 3, 7, 256)
    assert p["skinning"]["canonical_volume"]["final_weight"].shape == (3, 3, 3, 16, 1)
    b = out["variables"]["buffers"]
    assert b["skinning"]["canonical_volume"]["init_lc"].shape == (1, 1, 1, 1, 1024)


def test_stage2_checkpoint_file_and_inference_loader(tmp_path,
                                                     reference_modules):
    trainer, g, d = reference_modules
    path = str(tmp_path / "latest.pt")
    torch.save({
        "iter": 7,
        "nerf_optimizer": {}, "g_optim": {}, "d_optim": {},
        "nerf_render": trainer.state_dict(),
        "g": g.state_dict(), "d": d.state_dict(), "g_ema": g.state_dict(),
        "latent_codes": trainer.latent_codes.data,
    }, path)

    out = C.convert_stage2_checkpoint(path)
    assert out["iter"] == 7
    assert out["g"]["params"]["conv_in"]["conv"]["weight"].shape == (3, 3, 64, 512)
    assert out["g_ema"]["params"]["to_rgb4"]["conv"]["weight"].shape == (1, 1, 128, 12)
    assert out["d"]["params"]["final_linear0"]["weight"].shape == (512 * 16, 512)

    # the reenactment CLI loader accepts the torch file directly
    from havatar_tpu.cli.reenact import load_inference_weights

    variables, latent_codes, g_ema = load_inference_weights(path)
    assert latent_codes.shape == (3, 32)
    assert "field" in variables["params"]
    assert "style" in g_ema


@pytest.mark.slow
@pytest.mark.parametrize("num_coarse,num_fine", [
    (8, 4),     # fast integration geometry (~1 min)
    (64, 16),   # PRODUCTION sampling depth (singleview_512_base.yml:116-118):
                # 128² rays x 80 samples — the strongest asset-free
                # approximation of the 0.1 dB parity budget (accumulated f32
                # association error across the full sample count)
])
def test_stage2_checkpoint_file_pixel_parity(tmp_path, reference_modules,
                                             num_coarse, num_fine):
    """The full file->inference chain produces the reference's pixels:
    torch latest.pt -> load_inference_weights -> make_reenact_fn vs the
    reference Trainer->SWGAN_unet chain (avatarHD_reenactment.py:151-170),
    asserted on the final uint8 frame."""
    import jax.numpy as jnp

    from havatar_tpu.cli.reenact import load_inference_weights
    from havatar_tpu.infer.reenact import make_reenact_fn
    from havatar_tpu.models.renderer import AvatarRenderer
    from havatar_tpu.models.skinning import fix_canonical_volume
    from havatar_tpu.train.stage1 import build_renderer
    from havatar_tpu.models.generators import StyleUNetSR
    from havatar_tpu.utils.cfgnode import CfgNode

    trainer, g, d = reference_modules
    path = str(tmp_path / "latest.pt")
    torch.save({
        "iter": 7, "nerf_optimizer": {}, "g_optim": {}, "d_optim": {},
        "nerf_render": trainer.state_dict(),
        "g": g.state_dict(), "d": d.state_dict(), "g_ema": g.state_dict(),
        "latent_codes": trainer.latent_codes.data,
    }, path)

    # ---- reference inference chain (spec: avatarHD_reenactment.py:144-170)
    R = 128 * 128
    torch.manual_seed(3)
    ro = torch.tensor([[0.0, 0.0, 3.0]]).expand(R, 3)
    rd = torch.randn(R, 3) * 0.03 + torch.tensor([0.0, 0.0, -1.0])
    rd = rd / rd.norm(dim=-1, keepdim=True)
    rays = torch.cat([ro, rd, torch.full((R, 1), 1.4),
                      torch.full((R, 1), 4.0)], -1).unsqueeze(0)
    bg = torch.rand(1, R, 3)
    front, left, right = (torch.rand(1, 7, 256, 256) for _ in range(3))
    rot = torch.eye(3) + 0.05 * torch.randn(3, 3)
    trans = 0.1 * torch.randn(1, 3)
    inv_head_T = torch.cat([torch.linalg.inv(rot), -trans], 0).unsqueeze(0)
    style = torch.randn(1, 64)
    zero_noise = [torch.zeros(1, 1, 2 ** ((i + 8) // 2), 2 ** ((i + 8) // 2))
                  for i in range(g.num_layers)]

    # the reference trainer reads sampling depth from its cfg at call time
    trainer.cfg.nerf.validation.num_coarse = num_coarse
    trainer.cfg.nerf.validation.num_fine = num_fine
    trainer.headpose_skin_net.fix_canonical_W()
    trainer.eval(), g.eval()
    with torch.no_grad():
        render, _, _ = trainer(
            mode="validation", fidx=[0], render_full_img=True,
            ray_batch=rays, background_prior=bg,
            front_render_cond=front, left_render_cond=left,
            right_render_cond=right, inv_head_T=inv_head_T)
        gen_img = g(styles=[style], condition_img=render[:, 3:],
                    noise=zero_noise)
    want_f = gen_img.permute(0, 2, 3, 1).numpy()[0]
    want = np.clip(want_f * 255, 0, 255).astype(np.uint8)

    # ---- our chain, from the torch FILE
    cfg = CfgNode({
        "experiment": {"latent_code_dim": 32, "cond_pose": True},
        "models": {"StyleUnet": {"inp_size": 128, "inp_ch": 64,
                                 "out_size": 512},
                   "coarse": {"Head_bounding": [[-1.2, 1.2], [-1.6, 1.0], [-1.6, 1.2]],
                              "XYZ_bounding": [[-1.5, 1.5], [-1.6, 1.4], [-1.6, 1.2]]}},
        "dataset": {"cond_render_res": 256},
        "gan": {"latent": 64, "n_mlp": 4, "channel_multiplier": 2},
        "nerf": {"validation": {"num_coarse": num_coarse,
                                "num_fine": num_fine,
                                "perturb": False,
                                "radiance_field_noise_std": 0.0}},
    })
    variables, latent_codes, g_ema = load_inference_weights(path)
    renderer = build_renderer(cfg)
    generator = StyleUNetSR(inp_size=128, inp_ch=64, out_ch=3, out_size=512,
                            style_dim=64, n_mlp=4, middle_size=8)
    vol = renderer.apply(variables, method=AvatarRenderer.skin_volume)
    fixed_volume = fix_canonical_volume(vol)
    # float frame (to_uint8=False) so the PSNR below measures the pipelines'
    # true numerical agreement, not the quantizer; the uint8 frame is then
    # derived with exactly the production cast (infer/reenact.py:58)
    frame_fn = make_reenact_fn(cfg, renderer, generator, to_uint8=False)
    got_f = frame_fn(variables, g_ema, fixed_volume,
                     jnp.asarray(style.numpy()),
                     jnp.asarray(rays.numpy()), jnp.asarray(bg.numpy()),
                     jnp.asarray(latent_codes[0:1]),
                     jnp.asarray(inv_head_T.numpy()),
                     jnp.asarray(front.numpy().transpose(0, 2, 3, 1)),
                     jnp.asarray(left.numpy().transpose(0, 2, 3, 1)),
                     jnp.asarray(right.numpy().transpose(0, 2, 3, 1)))
    got_f = np.asarray(got_f[0])
    got = np.clip(got_f * 255.0, 0.0, 255.0).astype(np.uint8)

    # the north-star metric (BASELINE.json: 0.1 dB reenactment-PSNR budget):
    # the two implementations' frames must agree far above any plausible
    # scene PSNR, so swapping frameworks moves a ~30 dB reconstruction
    # metric by well under 0.1 dB. Measured on the display-clipped frames
    # (what PSNR is defined over; avatarHD_reenactment.py:165-167).
    mse = float(np.mean(
        (np.clip(got_f, 0, 1) - np.clip(want_f, 0, 1)) ** 2))
    psnr_db = 10.0 * np.log10(1.0 / max(mse, 1e-20))
    assert psnr_db >= 55.0, f"cross-implementation PSNR {psnr_db:.2f} dB"

    # a few LSB of uint8 tolerance (f32 accumulation-order differences)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 4, f"max LSB diff {diff.max()}"
    assert (diff > 1).mean() < 0.01
