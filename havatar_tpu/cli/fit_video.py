"""Monocular preprocessing pipeline CLI (capability parity with the
reference's ``data_preprocessing/fit_video.py``; SURVEY.md §2.5, §3.4).

Usage:
  python -m havatar_tpu.cli.fit_video --video_path V.mp4 --base_dir OUT \
      [--avatar_tracking_dir AVATAR_DIR]   # cross-reenactment driving mode

Pipeline: frame extraction + fixed face crop -> background matting ->
per-frame FaceVerse fitting (jitted Adam, see preprocess/fitting.py) ->
ortho condition renders -> sv_v31_all.json split (or drive_*.json when
--avatar_tracking_dir is given).

Requires the FaceVerse model asset (``--faceverse_path``, a download in the
reference too: README.md:27) and a landmark backend (mediapipe, or
precomputed landmark .npy files via --lms_dir).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", type=str, required=True)
    p.add_argument("--base_dir", type=str, required=True)
    p.add_argument("--avatar_tracking_dir", type=str, default="")
    p.add_argument("--faceverse_path", type=str,
                   default="metamodel/v3/faceverse_v3_1.npy")
    p.add_argument("--exp52_path", type=str,
                   default="metamodel/v3/exBase_52.npy")
    p.add_argument("--lms_dir", type=str, default="",
                   help="precomputed landmark .npy dir (else mediapipe)")
    p.add_argument("--lm_weights", type=str, default="",
                   help="converted OpenSeeFace landmark weights (.npz): use "
                        "the in-repo JaxTracker for the crop/presence role "
                        "(preprocess/tracker.py) instead of mediapipe")
    p.add_argument("--detect_weights", type=str, default="",
                   help="torch-port OpenSeeFace detection.pth for the "
                        "tracker's face detector (else whole-frame fallback)")
    p.add_argument("--rvm_path", type=str, default="",
                   help="RVM torchscript for matting (else precomputed masks)")
    p.add_argument("--rvm_jax", action="store_true",
                   help="run --rvm_path weights through the in-repo JAX RVM "
                        "(preprocess/rvm.py) instead of torchscript")
    p.add_argument("--tar_size", type=int, default=512)
    p.add_argument("--cam_dist", type=float, default=10.0)
    p.add_argument("--first_frame_iters", type=int, default=2000)
    p.add_argument("--frame_iters", type=int, default=100)
    p.add_argument("--base_zero_frame", type=str, default="10")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from havatar_tpu.cli.common import apply_platform_override

    apply_platform_override()

    from havatar_tpu.preprocess import faceverse as fv
    from havatar_tpu.preprocess import fitting, landmarks, matting, video
    from havatar_tpu.preprocess.pipeline import (
        make_animation_transform,
        make_transform,
        render_condition_set,
        save_frame_assets,
    )

    lm_backend = (landmarks.PrecomputedBackend(args.lms_dir) if args.lms_dir
                  else landmarks.get_backend("mediapipe"))

    # 1. frame extraction + crop (landmark-driven). With --lm_weights the
    # crop/presence role runs the in-repo JaxTracker (the reference's
    # OpenSeeFace split: tracker for crop, mediapipe for precise landmarks —
    # fit_video.py:534-638 vs :163-171); otherwise the fitting backend
    # doubles as the crop detector.
    if args.lm_weights:
        holder = {}

        def detect(frame_rgb):
            if "t" not in holder:
                from havatar_tpu.preprocess.tracker import JaxTracker

                h, w = frame_rgb.shape[:2]
                holder["t"] = JaxTracker.from_weights(
                    w, h, args.lm_weights,
                    detect_weights=args.detect_weights or None)
            preds = holder["t"].predict(frame_rgb)
            return preds[0].lms[:66, :2] if preds else None

        crop_fn = video.crop_params_from_landmarks
    else:
        def detect(frame_rgb):
            if hasattr(lm_backend, "set_frame"):
                lm_backend.set_frame("0")
            return lm_backend.detect(frame_rgb)

        crop_fn = video.crop_params_from_mediapipe

    n = video.extract_video_frames(args.video_path, args.base_dir, detect,
                                   dst_resolution=args.tar_size,
                                   crop_fn=crop_fn)
    print(f"extracted {n + 1} frames")

    # 2. matting
    if args.rvm_path and args.rvm_jax:
        mb = matting.JaxRVMBackend(args.rvm_path)
    elif args.rvm_path:
        mb = matting.RVMTorchBackend(args.rvm_path)
    else:
        mask_dir = os.path.join(args.base_dir, f"mv_mask{args.tar_size}", "0")
        if not os.path.isdir(mask_dir):
            raise RuntimeError(
                "no RVM model given and no precomputed masks found; supply "
                "--rvm_path or pre-fill mv_mask512/0/")
        mb = matting.PrecomputedBackend(mask_dir)
    video.run_matting(args.base_dir, mb, args.tar_size)

    # 3. per-frame FaceVerse fitting (jitted)
    model = fv.load_model_file(args.faceverse_path,
                               args.exp52_path if os.path.exists(args.exp52_path) else None)
    intr = np.asarray([1315.0, 1315.0, args.tar_size / 2, args.tar_size / 2],
                      np.float32)
    cam_K = np.asarray([[1315.0, 0, args.tar_size / 2],
                        [0, 1315.0, args.tar_size / 2], [0, 0, 1]], np.float32)
    fit_cfg = fitting.FitConfig(img_size=args.tar_size, cam_dist=args.cam_dist)

    img_dir = os.path.join(args.base_dir, f"mv_rgb{args.tar_size}", "0")
    save_dir = os.path.join(args.base_dir, "tracking")
    names = sorted(os.listdir(img_dir), key=lambda s: int(s.split(".")[0]))

    avatar_mode = bool(args.avatar_tracking_dir)
    state = fitting.init_fit_state(model.exp_dims)
    prev_rot = jnp.zeros((1, 3))
    prev_trans = jnp.zeros((1, 3))
    fit_first = fitting.make_fit_frame(model, intr, fit_cfg,
                                       args.first_frame_iters,
                                       first_frame=True, fit_id=True)
    fit_early = fitting.make_fit_frame(model, intr, fit_cfg, args.frame_iters,
                                       first_frame=False, fit_id=True)
    fit_rest = fitting.make_fit_frame(model, intr, fit_cfg, args.frame_iters,
                                      first_frame=False, fit_id=False)

    for i, name in enumerate(names):
        fid = name.split(".")[0]
        out_dir = os.path.join(save_dir, fid)
        if os.path.exists(os.path.join(out_dir, "finish")):
            continue
        frame = cv2.cvtColor(cv2.imread(os.path.join(img_dir, name)),
                             cv2.COLOR_BGR2RGB)
        if hasattr(lm_backend, "set_frame"):
            lm_backend.set_frame(fid)
        lms = lm_backend.detect(frame)
        if lms is None:
            print(f"frame {fid}: no face, skipping")
            continue
        fit = fit_first if i == 0 else (fit_early if i < 10 else fit_rest)
        state, loss = fit(state, jnp.asarray(lms), prev_rot, prev_trans)
        prev_rot, prev_trans = state.rot, state.trans

        coeffs = np.asarray(fitting.pack(state))[0]
        head_T = np.asarray(fitting.head_transform_matrix(state, no_scale=True))
        extr_T = np.asarray(fitting.head_transform_matrix(state, no_scale=False))
        save_frame_assets(save_dir, fid, coeffs, head_T=head_T, extr=extr_T,
                          transformation=extr_T)

        # condition renders (avatar drive mode transplants expressions later)
        c = jnp.asarray(coeffs)[None]
        id_c, exp_c, tex_c, _, _, _, eye_c, _ = fv.split_coeffs(c, model.exp_dims)
        vs = fv.get_vs(model, id_c, exp_c, eye_c)[0]
        colors = fv.get_color(model, tex_c)[0]
        render_condition_set(model, vs, colors, out_dir)
        if i % 50 == 0:
            print(f"frame {fid}: lm fit loss {float(loss):.5f}")

    # 4. split JSON
    calib = {
        "img_res": args.tar_size,
        "intrinsics": {"0": {"cam_K": cam_K.tolist(),
                             "cam_T": np.eye(4).tolist()}},
    }
    if avatar_mode:
        out = make_animation_transform(
            args.base_dir, save_dir, calib, args.base_zero_frame, cam_K,
            avatar_baseframe_path=os.path.join(args.avatar_tracking_dir,
                                               args.base_zero_frame),
            drive_dir_name="drive")
    else:
        out = make_transform(args.base_dir, save_dir, calib, ["0"],
                             args.base_zero_frame)
    print(f"split written: {out}")


if __name__ == "__main__":
    main()
