"""Generate tests/golden/render_production.npz — a PRODUCTION-GEOMETRY
golden for the NeRF render: 128² portrait rays at the reference's 64+16
sampling depth (singleview_512_base.yml:116-118), with the reference frame
computed ONCE from the reference's own modules (random weights, fixed
seeds) so the regression test needs no torch.

The asset stores the generator OUTPUTS (the [2, B, 128, 128, 64] feature
planes the reference trainer computed) rather than the ~515 MB of
generator weights: the plane generators are oracle-tested at module level
(tests/test_parity_torch.py), while everything geometry-sensitive —
box warp, skinning volume lookup, stratified + hierarchical sampling,
field MLP, compositing — runs downstream of the planes and is exactly
what this golden pins at the production operating point. Stored weights:
the field MLP + the canonical-volume decoder (~1 M params).

Run (requires torch + /root/reference on sys.path via tests.torch_oracle):
    python tests/make_production_golden.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import torch_oracle  # noqa: E402

torch_oracle.install()

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                   "render_production.npz")


def main() -> None:
    from utils.cfgnode import CfgNode as RefCfg
    from model.nerf_trainer import Trainer as RefTrainer

    from havatar_tpu.checkpoints import convert as C

    cfg = RefCfg({
        "experiment": {"latent_code_dim": 32, "model_mode": "DoublePlane",
                       "cond_pose": True, "cond_expr": False},
        "models": {
            "StyleUnet": {"inp_size": 128, "out_size": 512},
            "coarse": {"XYZ_bounding": [[-1.5, 1.5], [-1.6, 1.4],
                                        [-1.6, 1.2]]},
        },
        "nerf": {"validation": {"chunksize": 65536, "perturb": False,
                                "num_coarse": 64, "num_fine": 16,
                                "radiance_field_noise_std": 0.0}},
    })
    torch.manual_seed(0)
    trainer = RefTrainer(cfg, latent_codes_size=3)
    # densify: raw random init renders an (almost) empty scene (mean acc
    # ~1.5e-4) where the golden would pin little beyond background
    # compositing; the plane-feature-driven surgery produces a dense
    # avatar-shaped volume (acc ~0.95) so box warp, skinning, sampling,
    # the field MLP and compositing all materially shape the pixels
    from tests.test_torch_checkpoint_files import _densify_trainer

    trainer = _densify_trainer(trainer)

    # deterministic portrait inputs (the parity harness geometry)
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

    trainer.headpose_skin_net.fix_canonical_W()
    trainer.eval()
    with torch.no_grad():
        render, _, _ = trainer(
            mode="validation", fidx=[0], render_full_img=True,
            ray_batch=rays, background_prior=bg,
            front_render_cond=front, left_render_cond=left,
            right_render_cond=right, inv_head_T=inv_head_T)
        planes = trainer.model_coarse.triPlane_embeddings  # [2, B, C, H, W]

    sd = trainer.state_dict()
    field = {k: C._kernel(C._linear(sd, f"model_coarse.{p}"))
             for k, p in [("layer0", "layers_xyz.0"),
                          ("layer1", "layers_xyz.1"),
                          ("fc_alpha", "fc_alpha"),
                          ("fc_rgbFeat", "fc_rgbFeat"),
                          ("fc_rgb", "fc_rgb")]}
    vd = C.convert_volume_decoder(sd, "headpose_skin_net.canonical_Wvolume")

    flat = {}
    for name, lin in field.items():
        for k, v in lin.items():
            flat[f"field.{name}.{k}"] = v
    for k, v in vd["params"].items():
        flat[f"skin.params.{k}"] = v
    for k, v in vd["buffers"].items():
        flat[f"skin.buffers.{k}"] = v

    np.savez_compressed(
        OUT,
        rays=rays.numpy(),
        bg=bg.numpy(),
        inv_head_T=inv_head_T.numpy(),
        planes=planes.numpy().transpose(0, 1, 3, 4, 2),   # -> [2, B, H, W, C]
        render=render.numpy().transpose(0, 2, 3, 1),       # -> [B, H, W, 67]
        num_coarse=np.int32(64),
        num_fine=np.int32(16),
        **flat,
    )
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
