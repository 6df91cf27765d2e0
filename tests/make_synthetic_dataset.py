"""Generate a tiny synthetic on-disk dataset in the reference's split format
(sv_v31_all.json + frame/mask/condition PNGs) for end-to-end CLI smoke runs
and data-layer tests."""

from __future__ import annotations

import json
import os

import numpy as np


def make_dataset(root: str, num_frames: int = 3, img_res: int = 64,
                 cond_res: int = 64, seed: int = 0) -> str:
    import cv2

    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    frames = []
    for fi in range(num_frames):
        inst = os.path.join(root, f"inst_{fi}")
        os.makedirs(inst, exist_ok=True)

        img = (rng.rand(img_res, img_res, 3) * 255).astype(np.uint8)
        mask = np.zeros((img_res, img_res, 3), np.uint8)
        c = img_res // 2
        mask[c - 16:c + 16, c - 16:c + 16] = 255
        img_path = os.path.join(root, f"frame_{fi}.png")
        mask_path = os.path.join(root, f"mask_{fi}.png")
        cv2.imwrite(img_path, img)
        cv2.imwrite(mask_path, mask)

        for view in ("front", "left", "right"):
            render = (rng.rand(cond_res, cond_res, 3) * 255).astype(np.uint8)
            normal = np.zeros((cond_res, cond_res, 3), np.uint8)
            normal[8:-8, 8:-8] = (rng.rand(cond_res - 16, cond_res - 16, 3)
                                  * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(
                inst, f"ortho_{view}_render_256_baseGama.png"), render)
            cv2.imwrite(os.path.join(
                inst, f"ortho_{view}_normal_256_baseGama.png"), normal)

        angle = 0.05 * fi
        rot = np.eye(3)
        rot[0, 0] = rot[2, 2] = np.cos(angle)
        rot[0, 2], rot[2, 0] = np.sin(angle), -np.sin(angle)
        head_T = np.eye(4)
        head_T[:3, :3] = rot
        head_T[3, :3] = [0.01 * fi, 0.0, 0.0]

        c2w = np.eye(4)
        c2w[:3, 3] = [0.0, 0.3, 3.0]
        c2w[2, 2] = -1.0  # look along -z

        frames.append({
            "fidx": fi,
            "head_transformation": head_T.tolist(),
            "inst_dir": inst,
            "mutiview_info_ls": [{
                "view_name": "0",
                "transform_matrix": c2w.tolist(),
                "transform_matrix_ori": c2w.tolist(),
                "file_path": img_path,
                "mask_path": mask_path,
            }],
        })

    meta = {
        "img_res": img_res,
        "mutiview_intr_ls": [[float(img_res), float(img_res), 0.5, 0.5]],
        "frames": frames,
    }
    split = os.path.join(root, "sv_v31_all.json")
    with open(split, "w") as f:
        json.dump(meta, f)
    return split


if __name__ == "__main__":
    import sys

    make_dataset(sys.argv[1] if len(sys.argv) > 1 else "/tmp/havatar_synth")
