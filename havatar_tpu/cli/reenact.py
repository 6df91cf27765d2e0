"""Reenactment inference CLI (capability parity with the reference's
``avatarHD_reenactment.py``; SURVEY.md §2.4, call stack §3.3).

Usage:
  python -m havatar_tpu.cli.reenact --ckpt CKPT --savedir OUT --split SPLIT \
      [--config singleview_512_HD_base.yml]

``--ckpt`` accepts either a reference torch ``latest.pt``/``*.ckpt`` (it is
converted on the fly) or an orbax checkpoint directory from
``train_avatarHD``.
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp

from havatar_tpu.checkpoints import CheckpointManager, convert
from havatar_tpu.cli.common import resolve_config, seed_everything
from havatar_tpu.infer.reenact import run_reenactment


def load_inference_weights(ckpt_path: str):
    """Returns (renderer variables, latent_codes, g_ema params, enc_mode).

    ``enc_mode`` is the plane-encoder variant detected from a reference
    torch checkpoint's keys (None for orbax checkpoints, which were
    written by these trainers under the config that describes them)."""
    if ckpt_path.endswith((".pt", ".ckpt")):
        conv = convert.convert_stage2_checkpoint(ckpt_path)
        assert conv["latent_codes"] is not None, "checkpoint lacks latent_codes"
        assert conv["g_ema"] is not None, "checkpoint lacks g_ema"
        return (conv["variables"], conv["latent_codes"],
                conv["g_ema"]["params"], conv["enc_mode"])
    restored = CheckpointManager(ckpt_path).restore()
    assert restored is not None, f"no checkpoint found in {ckpt_path}"
    variables = {"params": restored["nerf_params"],
                 "buffers": restored["nerf_buffers"]}
    return variables, restored["latent_codes"], restored["g_ema_params"], None


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="singleview_512_HD_base.yml")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--savedir", type=str, default="./renders/")
    p.add_argument("--split", type=str, required=True)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--precision", type=str, default="auto",
                   choices=["auto", "fast", "exact"],
                   help="fast: bf16 + fused Pallas march (default on TPU); "
                        "exact: f32 XLA path matching the parity tests")
    p.add_argument("--gated", action="store_true",
                   help="occupancy-gated sampling: tighten per-ray near/far "
                        "to the avatar's AABB and march --coarse samples in "
                        "the occupied chord (+50%% fps at 32; a few uint8 "
                        "LSB off the blind reference schedule — see "
                        "infer/reenact.py:make_reenact_fn)")
    p.add_argument("--coarse", type=int, default=0,
                   help="coarse samples/ray override (0 = config value; "
                        "with --gated use 16 for the bench default "
                        "[34 fps, accuracy within 1 dB of the blind "
                        "schedule's own] or 32 for the quality knee "
                        "[more accurate than blind 64+16 — docs/PERF.md "
                        "round 5])")
    args = p.parse_args()

    cfg = resolve_config(args.config)
    seed_everything(cfg.experiment.randomseed)

    variables, latent_codes, g_ema, ckpt_enc = load_inference_weights(
        args.ckpt)
    if ckpt_enc is not None:
        cfg_enc = cfg.models.coarse.get("enc_mode", "split")
        if ckpt_enc != cfg_enc:
            # build the field the CHECKPOINT was trained with — the config
            # default would mismatch the converted params tree
            print(f"checkpoint enc_mode {ckpt_enc!r} overrides config "
                  f"{cfg_enc!r}")
            cfg.models.coarse.enc_mode = ckpt_enc
    stats = run_reenactment(
        cfg, args.split, args.savedir, variables, latent_codes, g_ema,
        seed=cfg.experiment.randomseed,
        max_frames=args.max_frames or None, precision=args.precision,
        gated=args.gated, num_coarse=args.coarse or None)
    print(json.dumps(stats))
    print("Done!")


if __name__ == "__main__":
    main()
