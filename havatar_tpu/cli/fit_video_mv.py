"""Calibrated multi-view preprocessing CLI (capability parity with the
reference's ``data_preprocessing/fit_video_mv.py``; SURVEY.md §2.5).

Usage:
  python -m havatar_tpu.cli.fit_video_mv --base_dir D --calib_file calib.json \
      --faceverse_path metamodel/v3/faceverse_v3_1.npy \
      [--views 0 1 2 ...] [--lms_root L]

Expects per-view frame folders ``{base_dir}/mv_rgb{res}/{view}/`` (produced by
per-view extraction, see preprocess/video.py), a raw calibration JSON
({cam: {K, R, T}}), crop params per view, and landmark backends per view.
Writes per-frame assets + the mv_v31_all.json split.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", type=str, required=True)
    p.add_argument("--calib_file", type=str, required=True)
    p.add_argument("--crop_params", type=str, default="",
                   help="JSON {view: [top, left, resolution, pad]}; default "
                        "reads {base_dir}/crop_param_mv.json")
    p.add_argument("--faceverse_path", type=str, required=True)
    p.add_argument("--exp52_path", type=str, default="")
    p.add_argument("--views", type=str, nargs="+", required=True)
    p.add_argument("--lms_root", type=str, default="",
                   help="precomputed landmarks {view}/{frame}.npy")
    p.add_argument("--tar_size", type=int, default=512)
    p.add_argument("--first_frame_iters", type=int, default=2000)
    p.add_argument("--frame_iters", type=int, default=100)
    p.add_argument("--base_zero_frame", type=str, default="10")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    from havatar_tpu.preprocess import faceverse as fv
    from havatar_tpu.preprocess import fitting, landmarks, multiview
    from havatar_tpu.preprocess.pipeline import (
        make_transform, render_condition_set, save_frame_assets)

    crop_path = args.crop_params or os.path.join(args.base_dir,
                                                 "crop_param_mv.json")
    crop_params = json.loads(open(crop_path).read())
    calib = multiview.make_calib(args.calib_file, args.base_dir,
                                 {v: crop_params[v] for v in args.views},
                                 args.tar_size)

    model = fv.load_model_file(args.faceverse_path, args.exp52_path or None)
    cam_Ks = np.stack([np.asarray(calib["intrinsics"][v]["cam_K"],
                                  np.float32).reshape(3, 3)
                       for v in args.views])
    cam_Ts = np.stack([np.asarray(calib["intrinsics"][v]["cam_T"],
                                  np.float32).reshape(4, 4)
                       for v in args.views])
    cfg = fitting.FitConfig(img_size=args.tar_size)

    backends = {}
    for v in args.views:
        backends[v] = (landmarks.PrecomputedBackend(
            os.path.join(args.lms_root, v)) if args.lms_root
            else landmarks.get_backend("mediapipe"))

    img_root = os.path.join(args.base_dir, f"mv_rgb{args.tar_size}")
    save_dir = os.path.join(args.base_dir, "tracking")
    names = sorted(os.listdir(os.path.join(img_root, args.views[0])),
                   key=lambda s: int(s.split(".")[0]))

    state = fitting.init_fit_state(model.exp_dims)
    prev_rot = jnp.zeros((1, 3))
    prev_trans = jnp.zeros((1, 3))
    fits = {
        True: multiview.make_fit_frame_mv(model, cam_Ks, cam_Ts, cfg,
                                          args.first_frame_iters,
                                          first_frame=True, fit_id=True),
        False: multiview.make_fit_frame_mv(model, cam_Ks, cam_Ts, cfg,
                                           args.frame_iters,
                                           first_frame=False, fit_id=False),
    }

    for i, name in enumerate(names):
        fid = name.split(".")[0]
        out_dir = os.path.join(save_dir, fid)
        if os.path.exists(os.path.join(out_dir, "finish")):
            continue
        lms, valid = [], []
        for v in args.views:
            img_path = os.path.join(img_root, v, name)
            frame = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
            b = backends[v]
            if hasattr(b, "set_frame"):
                b.set_frame(fid)
            l = b.detect(frame)
            valid.append(1.0 if l is not None else 0.0)
            lms.append(l if l is not None else np.zeros((478, 2), np.float32))
        if sum(valid) < 1:
            print(f"frame {fid}: no valid views, skipping")
            continue
        if sum(valid) < 3:
            print(f"WARNING! frame {fid}: too few faces detected")

        state, loss = fits[i == 0](
            state, jnp.asarray(np.stack(lms)), jnp.asarray(valid),
            prev_rot, prev_trans)
        prev_rot, prev_trans = state.rot, state.trans

        coeffs = np.asarray(fitting.pack(state))[0]
        head_T = np.asarray(fitting.head_transform_matrix(state, True))
        extr_T = np.asarray(fitting.head_transform_matrix(state, False))
        save_frame_assets(save_dir, fid, coeffs, head_T, extr_T, extr_T)

        c = jnp.asarray(coeffs)[None]
        id_c, exp_c, tex_c, _, _, _, eye_c, _ = fv.split_coeffs(c, model.exp_dims)
        vs = fv.get_vs(model, id_c, exp_c, eye_c)[0]
        colors = fv.get_color(model, tex_c)[0]
        render_condition_set(model, vs, colors, out_dir)
        if i % 50 == 0:
            print(f"frame {fid}: mv fit loss {float(loss):.5f} "
                  f"({int(sum(valid))}/{len(args.views)} views)")

    out = make_transform(args.base_dir, save_dir, calib, list(args.views),
                         args.base_zero_frame)
    print(f"split written: {out}")


if __name__ == "__main__":
    main()
