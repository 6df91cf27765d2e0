"""Cross-reenactment end to end: a drive_*.json split (written by
make_animation_transform, no mask/file paths) renders through the full
reenactment pipeline to PNG frames."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from havatar_tpu.preprocess.pipeline import (
    make_animation_transform,
    save_frame_assets,
)
from havatar_tpu.utils.cfgnode import CfgNode


def test_drive_split_reenactment(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    img_res, cond_res = 16, 32

    # avatar base frame + drive tracking dirs with condition renders
    avatar_base = tmp_path / "avatar" / "10"
    avatar_base.mkdir(parents=True)
    np.save(str(avatar_base / "coeffs.npy"), rng.randn(491))
    rot = np.eye(4, dtype=np.float32)
    ext = rot.copy()
    ext[3, 2] = 3.0
    np.savez(str(avatar_base / "metaFace_extr.npz"), head_T=rot, extr=ext,
             transformation=ext, self_rotation=np.eye(3))

    drive_save = tmp_path / "drive_tracking"
    for fid in ("0", "1"):
        save_frame_assets(str(drive_save), fid, rng.randn(491), rot, ext, ext)
        inst = drive_save / fid / "driveA"
        inst.mkdir(parents=True)
        for v in ("front", "left", "right"):
            img = (rng.rand(cond_res, cond_res, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(inst / f"ortho_{v}_render_256_baseGama.png"), img)
            cv2.imwrite(str(inst / f"ortho_{v}_normal_256_baseGama.png"), img)

    K = np.asarray([[float(img_res), 0, img_res / 2],
                    [0, float(img_res), img_res / 2], [0, 0, 1]])
    calib = {"img_res": img_res, "intrinsics": {}}
    split = make_animation_transform(
        str(tmp_path), str(drive_save), calib, "0", K,
        avatar_baseframe_path=str(avatar_base), drive_dir_name="driveA")

    cfg = CfgNode({
        "experiment": {"randomseed": 0, "latent_code_dim": 8,
                       "patch_rgb": False, "cond_pose": True,
                       "cond_expr": False},
        "dataset": {"near": -1.6, "far": 1.0, "length": 1.0,
                    "num_random_rays": 16, "down_sample": 1.0,
                    "cond_render_res": cond_res},
        "models": {"StyleUnet": {"inp_size": img_res, "inp_ch": 16,
                                 "out_ch": 16, "out_size": 64},
                   "coarse": {"XYZ_bounding": [[-1.5, 1.5], [-1.6, 1.4],
                                               [-1.6, 1.2]],
                              "num_encoding_fn_xyz": 2,
                              "plane_feat_dim": 16, "plane_res": 16,
                              "plane_middle_size": 4, "skin_vol_res": 8}},
        "gan": {"latent": 16, "n_mlp": 2, "channel_multiplier": 1},
        "nerf": {"validation": {"chunksize": 4096, "perturb": False,
                                "num_coarse": 4, "num_fine": 2,
                                "radiance_field_noise_std": 0.0}},
    })

    # random-init weights (structure test, not quality)
    from havatar_tpu.infer.reenact import run_reenactment
    from havatar_tpu.models import StyleUNetSR
    from havatar_tpu.train.stage1 import build_renderer

    renderer = build_renderer(cfg)
    B, R = 1, img_res * img_res
    rays = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0),
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), -1.0),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    variables = renderer.init(
        jax.random.PRNGKey(0), rays, jnp.ones((B, R, 3)),
        jnp.zeros((B, 8)),
        jnp.broadcast_to(jnp.concatenate(
            [jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3)),
        *([jnp.zeros((B, cond_res, cond_res, 7))] * 3),
        num_coarse=4, num_fine=2, perturb=False)
    # must match the generator run_reenactment builds from cfg.gan
    sr = StyleUNetSR(inp_size=img_res, inp_ch=16, out_ch=3, out_size=64,
                     style_dim=16, n_mlp=2, channel_multiplier=1)
    sr_vars = sr.init(jax.random.PRNGKey(1), jnp.zeros((B, 16)),
                      jnp.zeros((B, img_res, img_res, 16)))

    cfg.nerf.validation.num_coarse = 4
    stats = run_reenactment(cfg, split, str(tmp_path / "out"), variables,
                            np.zeros((1, 8), np.float32),
                            sr_vars["params"], max_frames=2)
    assert stats["frames"] == 2
    outs = sorted(os.listdir(tmp_path / "out" / "rgb"))
    assert outs == ["0_00.png", "1_00.png"]
    img = cv2.imread(str(tmp_path / "out" / "rgb" / outs[0]))
    assert img.shape == (64, 64, 3)
