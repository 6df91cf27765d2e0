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
