"""Dataset-scale FaceVerse fitting (capability parity with the reference's
``data_preprocessing/fit_videos_mp.py``; SURVEY.md §2.5).

The reference fans videos over 8 CPU processes, each stepping torch Adam
per frame (fit_videos_mp.py:59-75). TPU-native redesign: ONE device runs the
jitted fitting loop (the fit itself is serial in time — temporal smoothness
chains frames), and the host-side work — image decode + landmark detection,
the part the reference's Pool actually parallelized usefully — fans out over
an IO worker pool (``--io_workers``) that prefetches upcoming videos while
the device fits the current one. Consumption order is deterministic (videos
complete in submission order), so worker count never changes the outputs.
Resumability (finish/skip markers) and the no-face log mirror the reference
(fit_videos_mp.py:46-55,105-164).

Usage:
  python -m havatar_tpu.cli.fit_videos_batch --videos_root R --save_root S \
      --faceverse_path metamodel/v3/faceverse_v3_1.npy [--lms_root L]
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

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


# mediapipe topology rings used by the reference's landmark-counter debug
# image (facts of the mediapipe mesh; spec: fit_videos_mp.py:306-325)
_OUTER_MOUTH = [0, 267, 269, 270, 409, 291, 375, 321, 405, 314, 17, 84, 181,
                91, 146, 76, 185, 40, 39, 37]
_INNER_MOUTH = [13, 312, 311, 310, 415, 308, 324, 318, 402, 317, 14, 87, 178,
                88, 95, 78, 191, 80, 81, 82]
_LEFT_EYE = [33, 246, 161, 160, 159, 158, 157, 173, 133, 155, 154, 153, 145,
             144, 163, 7]
_RIGHT_EYE = [362, 398, 384, 385, 386, 387, 388, 466, 263, 249, 390, 373,
              374, 380, 381, 382]


def draw_lms_counter(img: np.ndarray, lms_proj: np.ndarray) -> np.ndarray:
    """Landmark-contour debug image: mouth rings (blue, 4px), eye rings
    (green, 2px), pupils (red dots) — spec: fit_videos_mp.py:306-325."""
    import cv2

    pts = np.round(lms_proj).astype(np.int32)
    out = cv2.polylines(img.copy(), [pts[_OUTER_MOUTH]], True, (255, 0, 0), 4)
    out = cv2.polylines(out, [pts[_INNER_MOUTH]], True, (255, 0, 0), 4)
    out = cv2.polylines(out, [pts[_LEFT_EYE]], True, (0, 255, 0), 2)
    out = cv2.polylines(out, [pts[_RIGHT_EYE]], True, (0, 255, 0), 2)
    out = cv2.circle(out, (pts[473, 0], pts[473, 1]), 4, [0, 0, 255], -1)
    out = cv2.circle(out, (pts[468, 0], pts[468, 1]), 4, [0, 0, 255], -1)
    return out


def render_fvmask(model, coeffs: np.ndarray, intr, tar_size: int) -> np.ndarray:
    """Silhouette of the fitted FaceVerse mesh: coverage of the perspective-
    projected triangles (spec: fit_videos_mp.py:268-271 — nonzero-render
    mask), rasterized as filled polygons in pixel space."""
    import cv2
    import jax.numpy as jnp

    from havatar_tpu.preprocess import faceverse as fv

    id_c, exp_c, _, angles, _, trans, eye_c, scale = fv.split_coeffs(
        jnp.asarray(coeffs[None]), model.exp_dims)
    rot = fv.euler_rotation(angles)
    vs = fv.get_vs(model, id_c, exp_c, eye_c)
    vs_t = fv.rigid_transform(vs, rot, trans, jnp.abs(scale))
    proj = np.asarray(fv.project_points(
        vs_t, intr[0], intr[1], intr[2], intr[3]))[0]
    tris = np.round(proj[np.asarray(model.tri)]).astype(np.int32)
    mask = np.zeros((tar_size, tar_size), np.uint8)
    cv2.fillPoly(mask, list(tris), 255)
    return mask


def load_video_landmarks(
    vdir: str, frame_names: List[str], lms_root: str, name: str
) -> Tuple[Optional[np.ndarray], Optional[str]]:
    """IO stage for one video: decode every frame, run the landmark backend.
    Returns (lms [T, L, 2-3], None) or (None, first_failed_frame). Runs on
    an IO worker thread — cv2 decode releases the GIL, so workers overlap
    with each other and with the device fit of the previous video."""
    import cv2

    from havatar_tpu.preprocess import landmarks

    backend = (landmarks.PrecomputedBackend(os.path.join(lms_root, name))
               if lms_root else landmarks.get_backend("mediapipe"))
    lms_all = []
    for f in frame_names:
        img = cv2.cvtColor(cv2.imread(os.path.join(vdir, f)),
                           cv2.COLOR_BGR2RGB)
        if hasattr(backend, "set_frame"):
            backend.set_frame(f.split(".")[0])
        lms = backend.detect(img)
        if lms is None:
            return None, f
        lms_all.append(lms)
    return np.stack(lms_all), None


def iter_videos_prefetched(pending: List[str], videos_root: str,
                           lms_root: str, io_workers: int,
                           prefetch: int = 2):
    """Yield (name, frame_names, lms | None, failed_frame) in ``pending``
    order while the pool works ``prefetch`` videos ahead."""
    def frame_list(name):
        vdir = os.path.join(videos_root, name)
        return vdir, sorted(
            (f for f in os.listdir(vdir) if f.endswith((".png", ".jpg"))),
            key=lambda s: int(s.split(".")[0]))

    with ThreadPoolExecutor(max_workers=io_workers) as pool:
        queue = []
        names = list(pending)
        while names or queue:
            while names and len(queue) <= prefetch:
                name = names.pop(0)
                vdir, frames = frame_list(name)
                queue.append((name, frames, pool.submit(
                    load_video_landmarks, vdir, frames, lms_root, name)))
            name, frames, fut = queue.pop(0)
            lms, failed = fut.result()
            yield name, frames, lms, failed


def main() -> None:
    from havatar_tpu.cli.common import apply_platform_override

    apply_platform_override()
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
    p.add_argument("--save_fvmask", type=str, default=None,
                   help="also save per-frame mesh silhouette masks under "
                        "save_root/{video}/<save_fvmask>/ "
                        "(spec: fit_videos_mp.py:268-271)")
    p.add_argument("--save_lmscounter", type=str, default=None,
                   help="also save landmark-contour debug images under "
                        "save_root/{video}/<save_lmscounter>/ "
                        "(spec: fit_videos_mp.py:273-278)")
    p.add_argument("--io_workers", type=int,
                   default=min(8, os.cpu_count() or 1),
                   help="host threads for decode+landmark IO (the analogue "
                        "of the reference's Pool(8), fit_videos_mp.py:59-75)")
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    from havatar_tpu.preprocess import faceverse as fv
    from havatar_tpu.preprocess import fitting
    from havatar_tpu.preprocess.pipeline import save_frame_assets

    model = fv.load_model_file(
        args.faceverse_path, args.exp52_path or None)
    focal_px = args.focal * args.tar_size / 2
    intr = np.asarray([focal_px, focal_px, args.tar_size / 2,
                       args.tar_size / 2], np.float32)
    cfg = fitting.FitConfig(img_size=args.tar_size)

    no_face_log: Dict[str, str] = {}
    pending = collect_pending(args.videos_root, args.save_root)
    print(f"{len(pending)} videos pending ({args.io_workers} IO workers)")
    for name, frame_names, lms_all, failed in iter_videos_prefetched(
            pending, args.videos_root, args.lms_root, args.io_workers):
        sdir = os.path.join(args.save_root, name)
        os.makedirs(sdir, exist_ok=True)
        if failed is not None:
            no_face_log[f"{name}/{failed}"] = "no_face"
            open(os.path.join(sdir, "skip"), "w").close()
            continue

        coeffs, losses, state = fit_video_frames(
            model, lms_all, intr, cfg,
            args.iters_first, args.iters_rest)
        for f, c in zip(frame_names, coeffs):
            fid = f.split(".")[0]
            # per-frame pose: rebuild the head transform from THIS frame's
            # packed coeffs (rot/trans/scale vary frame to frame; the fit
            # state only holds the last frame's pose)
            _, _, _, ang, _, trans, _, scale = fv.split_coeffs(
                jnp.asarray(c[None]), model.exp_dims)
            head_T = np.asarray(fv.make_rot_mat(ang, trans, scale,
                                                no_scale=True))
            extr_T = np.asarray(fv.make_rot_mat(ang, trans, scale,
                                                no_scale=False))
            save_frame_assets(sdir, fid, c, head_T, extr_T, extr_T)
            if args.save_fvmask:
                mdir = os.path.join(sdir, args.save_fvmask)
                os.makedirs(mdir, exist_ok=True)
                cv2.imwrite(os.path.join(mdir, f"{fid}.png"),
                            render_fvmask(model, c, intr, args.tar_size))
            if args.save_lmscounter:
                ldir = os.path.join(sdir, args.save_lmscounter)
                os.makedirs(ldir, exist_ok=True)
                lms_proj = np.asarray(fv.forward_landmarks(
                    model, jnp.asarray(c[None]), intr[0], intr[1], intr[2],
                    intr[3])[0])[0]
                black = np.zeros((args.tar_size, args.tar_size, 3), np.uint8)
                cv2.imwrite(os.path.join(ldir, f"{fid}.png"),
                            draw_lms_counter(black, lms_proj)[:, :, ::-1])
        open(os.path.join(sdir, "finish"), "w").close()
        print(f"{name}: {len(frame_names)} frames, "
              f"final lm loss {losses[-1]:.5f}")

    if no_face_log:
        with open(os.path.join(args.save_root, "no_face_log.json"), "w") as f:
            json.dump(no_face_log, f, indent=2)


if __name__ == "__main__":
    main()
