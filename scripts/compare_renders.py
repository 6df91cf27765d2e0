"""Frame-by-frame PSNR/LPIPS between two render directories.

The parity protocol from BASELINE.md: run the reference's reenactment to
produce golden frames, run havatar_tpu's reenactment on the same split, then
score with this tool (target: PSNR within 0.1 dB).

Usage: python scripts/compare_renders.py DIR_A DIR_B [--lpips weights.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("dir_a")
    p.add_argument("dir_b")
    p.add_argument("--lpips", type=str, default="",
                   help="converted LPIPS weights (npz) for perceptual score")
    args = p.parse_args()

    import cv2

    names = sorted(set(os.listdir(args.dir_a)) & set(os.listdir(args.dir_b)))
    names = [n for n in names if n.endswith(".png")]
    assert names, "no common frames"

    lpips_fn = None
    if args.lpips:
        import jax
        import jax.numpy as jnp

        from havatar_tpu.train import lpips_jax

        params = dict(np.load(args.lpips, allow_pickle=True))
        lpips_fn = jax.jit(lambda a, b: lpips_jax.lpips_loss(
            params["params"].item(), a, b))

    psnrs, lpipss = [], []
    for n in names:
        a = cv2.imread(os.path.join(args.dir_a, n)).astype(np.float32) / 255.0
        b = cv2.imread(os.path.join(args.dir_b, n)).astype(np.float32) / 255.0
        assert a.shape == b.shape, (n, a.shape, b.shape)
        mse = float(np.mean((a - b) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        if lpips_fn is not None:
            import jax.numpy as jnp

            lpipss.append(float(lpips_fn(jnp.asarray(a[None]),
                                         jnp.asarray(b[None]))))

    out = {
        "frames": len(names),
        "psnr_mean": round(float(np.mean(psnrs)), 4),
        "psnr_min": round(float(np.min(psnrs)), 4),
    }
    if lpipss:
        out["lpips_mean"] = round(float(np.mean(lpipss)), 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
