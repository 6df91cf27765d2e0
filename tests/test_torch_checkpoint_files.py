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

    variables, latent_codes, g_ema, enc_mode = load_inference_weights(path)
    assert enc_mode == "split"
    assert latent_codes.shape == (3, 32)
    assert "field" in variables["params"]
    assert "style" in g_ema


def _save_stage2_file(tmp_path, reference_modules) -> str:
    trainer, g, d = reference_modules
    path = str(tmp_path / "latest.pt")
    torch.save({
        "iter": 7, "nerf_optimizer": {}, "g_optim": {}, "d_optim": {},
        "nerf_render": trainer.state_dict(),
        "g": g.state_dict(), "d": d.state_dict(), "g_ema": g.state_dict(),
        "latent_codes": trainer.latent_codes.data,
    }, path)
    return path


def _make_parity_inputs():
    """Deterministic reenactment inputs shared by the reference and our
    chains (portrait camera at z=3 looking down -z, dataset near/far)."""
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
    return dict(rays=rays, bg=bg, front=front, left=left, right=right,
                inv_head_T=inv_head_T, style=style)


def _reference_float_frame(reference_modules, inp, num_coarse, num_fine):
    """The reference inference chain's float frame
    (spec: avatarHD_reenactment.py:144-170)."""
    trainer, g, _ = reference_modules
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
            ray_batch=inp["rays"], background_prior=inp["bg"],
            front_render_cond=inp["front"], left_render_cond=inp["left"],
            right_render_cond=inp["right"], inv_head_T=inp["inv_head_T"])
        gen_img = g(styles=[inp["style"]], condition_img=render[:, 3:],
                    noise=zero_noise)
    return gen_img.permute(0, 2, 3, 1).numpy()[0]


def _our_float_frame(path, inp, num_coarse, num_fine, gated=False):
    """Our chain's float frame, loaded from the torch FILE."""
    import jax.numpy as jnp

    from havatar_tpu.cli.reenact import load_inference_weights
    from havatar_tpu.infer.reenact import make_reenact_fn
    from havatar_tpu.models.renderer import AvatarRenderer
    from havatar_tpu.models.skinning import fix_canonical_volume
    from havatar_tpu.train.stage1 import build_renderer
    from havatar_tpu.models.generators import StyleUNetSR
    from havatar_tpu.utils.cfgnode import CfgNode

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
    variables, latent_codes, g_ema, _ = load_inference_weights(path)
    renderer = build_renderer(cfg)
    generator = StyleUNetSR(inp_size=128, inp_ch=64, out_ch=3, out_size=512,
                            style_dim=64, n_mlp=4, middle_size=8)
    vol = renderer.apply(variables, method=AvatarRenderer.skin_volume)
    fixed_volume = fix_canonical_volume(vol)
    # float frame (to_uint8=False) so PSNR measures the pipelines' true
    # numerical agreement, not the quantizer; uint8 frames are then derived
    # with exactly the production cast (infer/reenact.py:84)
    frame_fn = make_reenact_fn(cfg, renderer, generator, to_uint8=False,
                               gated=gated)
    got_f = frame_fn(variables, g_ema, fixed_volume,
                     jnp.asarray(inp["style"].numpy()),
                     jnp.asarray(inp["rays"].numpy()),
                     jnp.asarray(inp["bg"].numpy()),
                     jnp.asarray(latent_codes[0:1]),
                     jnp.asarray(inp["inv_head_T"].numpy()),
                     jnp.asarray(inp["front"].numpy().transpose(0, 2, 3, 1)),
                     jnp.asarray(inp["left"].numpy().transpose(0, 2, 3, 1)),
                     jnp.asarray(inp["right"].numpy().transpose(0, 2, 3, 1)))
    return np.asarray(got_f[0])


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-20))


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
    path = _save_stage2_file(tmp_path, reference_modules)
    inp = _make_parity_inputs()
    want_f = _reference_float_frame(reference_modules, inp,
                                    num_coarse, num_fine)
    want = np.clip(want_f * 255, 0, 255).astype(np.uint8)
    got_f = _our_float_frame(path, inp, num_coarse, num_fine)
    got = np.clip(got_f * 255.0, 0.0, 255.0).astype(np.uint8)

    # the north-star metric (BASELINE.json: 0.1 dB reenactment-PSNR budget):
    # the two implementations' frames must agree far above any plausible
    # scene PSNR, so swapping frameworks moves a ~30 dB reconstruction
    # metric by well under 0.1 dB. Measured on the display-clipped frames
    # (what PSNR is defined over; avatarHD_reenactment.py:165-167).
    psnr_db = _psnr(got_f, want_f)
    assert psnr_db >= 55.0, f"cross-implementation PSNR {psnr_db:.2f} dB"

    # a few LSB of uint8 tolerance (f32 accumulation-order differences)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 4, f"max LSB diff {diff.max()}"
    assert (diff > 1).mean() < 0.01


def _densify_trainer(trainer):
    """Weight surgery producing a REAL avatar-shaped density from a
    random-init checkpoint, applied to a deepcopy of the reference trainer.

    A freshly-initialized field renders an (almost) empty scene (measured
    mean acc 1.5e-4) — any two sampling schedules would trivially agree on
    it, so gated-vs-blind PSNR on raw random weights is meaningless. The
    surgery drives the density from the PLANE FEATURES, which are
    zero-padded outside the canonical box (model/nerf_model.py:95-99,
    padding_mode='zeros'), exactly the structure the mask-BCE supervision
    trains into a real avatar (train_avatar.py:131-136):
      * layers_xyz[0] plane-feat columns x20 — in-box activations become
        feat-dominated;
      * fc_alpha weight x(-2), bias -0.1 — maps the feat-driven spread to
        positive in-box sigma while the zero-feat (outside-box) response
        stays <= ~0.03.
    Measured on the parity scenario: in-box sigma 1.45±0.90 (94.5% > 0),
    outside-box -0.195±0.068 (max 0.028), scene acc_fine mean 0.95 — a
    dense volumetric head, the hard case for sampling-schedule changes
    (every ray integrates real density; background rays, which gating
    handles exactly, contribute nothing to the comparison)."""
    import copy

    t = copy.deepcopy(trainer)
    m = t.model_coarse
    with torch.no_grad():
        m.layers_xyz[0].weight[:, :128] *= 20.0
        m.fc_alpha.weight *= -2.0
        m.fc_alpha.bias.fill_(-0.1)
    return t


@pytest.mark.slow
def test_stage2_checkpoint_file_gated_fidelity(tmp_path, reference_modules):
    """Fidelity of the GATED operating points that set the headline bench
    numbers (bench.py default: occupancy-gated 16+16; --coarse 32 is the
    quality knee), on a densified checkpoint scene (see _densify_trainer —
    raw random init renders an empty frame where the comparison is
    vacuous). Two measurements per schedule:

    AGREEMENT with the reference's blind 64+16 float frame from the SAME
    torch checkpoint file (what a reference user diffing outputs sees),
    measured with gate_aabb halo gating (docs/PERF.md round 5):
      * blind 64+16 (parity path)            — 112.9 dB (bit-level);
      * gated 64+16                          — 49.2 dB;
      * gated 32+16 (quality knee)           — 50.0 dB;
      * gated 16+16 (the BENCH default)      — 47.6 dB.

    ACCURACY against a dense ground truth (our blind 509+16 — ~8x the
    reference's sampling density, same f32 parity path that matches torch
    at 112.9 dB): most of the "disagreement" above is the blind 64-sample
    schedule's OWN quadrature error, not a gating cost —
      * blind 64+16 (the reference schedule)  — 45.9 dB;
      * gated 64+16                           — 54.0 dB (+8.1 over blind);
      * gated 32+16                           — 48.5 dB (+2.6 over blind);
      * gated 16+16                           — 44.9 dB (−1.0 vs blind at
        2.0x the frame rate).
    Asserted: the quality knee renders the scene MORE accurately than the
    reference's own schedule, and the bench default within ~1.5 dB of it.
    Floors sit ~1.5 dB under the measured values (platform noise)."""
    trainer, g, d = reference_modules
    dense = _densify_trainer(trainer)
    path = _save_stage2_file(tmp_path, (dense, g, d))
    inp = _make_parity_inputs()
    want_f = _reference_float_frame((dense, g, d), inp, 64, 16)

    blind = _our_float_frame(path, inp, 64, 16)
    psnr_blind = _psnr(blind, want_f)

    gated_same = _our_float_frame(path, inp, 64, 16, gated=True)
    psnr_same = _psnr(gated_same, want_f)

    gated_knee = _our_float_frame(path, inp, 32, 16, gated=True)
    psnr_knee = _psnr(gated_knee, want_f)

    gated_bench = _our_float_frame(path, inp, 16, 16, gated=True)
    psnr_bench = _psnr(gated_bench, want_f)

    print(f"\nvs reference blind 64+16 (dense scene): blind {psnr_blind:.2f}"
          f" dB, gated 64+16 {psnr_same:.2f} dB, gated 32+16 "
          f"{psnr_knee:.2f} dB, gated 16+16 (BENCH default) "
          f"{psnr_bench:.2f} dB")
    assert psnr_blind >= 70.0, f"blind parity PSNR {psnr_blind:.2f} dB"
    assert psnr_same >= 47.5, f"gated 64+16 PSNR {psnr_same:.2f} dB"
    assert psnr_knee >= 48.5, f"gated 32+16 PSNR {psnr_knee:.2f} dB"
    assert psnr_bench >= 46.0, f"gated 16+16 PSNR {psnr_bench:.2f} dB"

    # accuracy vs dense ground truth: the schedule-superiority claim
    gt = _our_float_frame(path, inp, 509, 16)
    acc_blind = _psnr(blind, gt)
    acc_knee = _psnr(gated_knee, gt)
    acc_bench = _psnr(gated_bench, gt)
    print(f"vs dense GT (blind 509+16): blind 64+16 {acc_blind:.2f} dB, "
          f"gated 32+16 {acc_knee:.2f} dB, gated 16+16 {acc_bench:.2f} dB")
    assert acc_knee >= acc_blind - 0.5, (
        f"quality knee less accurate than the reference schedule: "
        f"{acc_knee:.2f} vs {acc_blind:.2f} dB")
    assert acc_bench >= acc_blind - 2.5, (
        f"bench default too far below the reference schedule's accuracy: "
        f"{acc_bench:.2f} vs {acc_blind:.2f} dB")
