"""Measure gated-mode fidelity (PSNR vs the reference's blind 64+16 float
frame) for candidate sampling schedules, on the densified checkpoint scene
from tests/test_torch_checkpoint_files.py.

Companion to scripts/sweep_sampling.py (which measures fps on the TPU):
together they pick the headline BENCH configuration — the fastest schedule
whose dB cost stays inside the 0.1 dB north-star budget (BASELINE.json).
Runs on CPU (torch + jax); ~2 min per config at 128² x 80 samples.

Usage: python scripts/measure_gated_fidelity.py [nc+nf ...]
       (default: 16+16 24+12 24+16 32+8 32+16)
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pin the CPU backend + exact f32 matmuls BEFORE any jax use. The
# environment's sitecustomize pre-imports jax and pins the 'axon' TPU
# platform, so the env var alone is not enough (tests/conftest.py documents
# this) — without the config.update the frames render on the TPU with bf16
# pallas kernels and every schedule reads a constant ~22 dB (bf16 noise
# floor), not the quadrature error this script exists to measure.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import torch  # noqa: E402

from tests import torch_oracle  # noqa: E402

torch_oracle.install()


def main() -> None:
    from utils.cfgnode import CfgNode as RefCfg
    from model.nerf_trainer import Trainer as RefTrainer
    from model.styleUnet import Discriminator, SWGAN_unet

    from tests.test_torch_checkpoint_files import (
        _densify_trainer, _make_parity_inputs, _our_float_frame, _psnr,
        _reference_float_frame, _save_stage2_file)

    configs = [tuple(int(x) for x in a.split("+")) for a in sys.argv[1:]] or [
        (16, 16), (24, 12), (24, 16), (32, 8), (32, 16)]

    cfg = RefCfg({
        "experiment": {"latent_code_dim": 32, "model_mode": "DoublePlane",
                       "cond_pose": True, "cond_expr": False},
        "models": {
            "StyleUnet": {"inp_size": 128, "out_size": 512},
            "coarse": {"XYZ_bounding": [[-1.5, 1.5], [-1.6, 1.4],
                                        [-1.6, 1.2]]},
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

    dense = _densify_trainer(trainer)
    with tempfile.TemporaryDirectory() as tmp:
        import pathlib
        path = _save_stage2_file(pathlib.Path(tmp), (dense, g, d))
        inp = _make_parity_inputs()
        print("reference blind 64+16 frame...", flush=True)
        want_f = _reference_float_frame((dense, g, d), inp, 64, 16)

        for nc, nf in configs:
            got = _our_float_frame(path, inp, nc, nf, gated=True)
            db = _psnr(got, want_f)
            print(json.dumps({"gated": True, "nc": nc, "nf": nf,
                              "psnr_db": round(db, 2)}), flush=True)


if __name__ == "__main__":
    main()
