"""Preprocessing throughput: dataset-scale FaceVerse fitting frames/hour
(cli/fit_videos_batch.py vs the reference's fit_videos_mp.py Pool(8),
fit_videos_mp.py:59-75).

Builds a synthetic corpus at production-like dims (27k-vertex model, 512²
frames, 478 landmarks), runs the batch CLI at the reference's iteration
schedule (first frame 500, rest 100 — fit_videos_mp.py:126,187), and
reports frames/hour end-to-end (decode + landmarks on the IO worker pool,
jitted Adam fit on the device).

Usage: python scripts/bench_preprocess.py [--videos 2] [--frames 12]
       [--platform tpu|cpu] [--io_workers 4]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_corpus(root, n_videos, n_frames, res=512):
    import cv2

    from tests.test_fit_video_e2e import make_fake_faceverse

    rng = np.random.RandomState(7)
    videos_root = os.path.join(root, "videos")
    lms_root = os.path.join(root, "lms")
    for v in range(n_videos):
        vdir = os.path.join(videos_root, f"vid{v}")
        ldir = os.path.join(lms_root, f"vid{v}")
        os.makedirs(vdir), os.makedirs(ldir)
        for i in range(n_frames):
            img = (rng.rand(res, res, 3) * 80).astype(np.uint8)
            cv2.imwrite(os.path.join(vdir, f"{i}.png"), img)
            lms = np.stack([res // 4 + res // 2 * rng.rand(478),
                            res // 4 + res // 2 * rng.rand(478)],
                           -1).astype(np.float32)
            lms += 2.0 * i
            np.save(os.path.join(ldir, f"{i}.npy"), lms)
    fv = os.path.join(root, "faceverse_prod.npy")
    # production-scale basis: FaceVerse v3 has ~27k vertices
    make_fake_faceverse(fv, V=27000)
    return videos_root, lms_root, fv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=2)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--platform", default="")
    ap.add_argument("--io_workers", type=int, default=4)
    ap.add_argument("--iters_first", type=int, default=500)
    ap.add_argument("--iters_rest", type=int, default=100)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="havatar_prebench_")
    try:
        videos_root, lms_root, fv = make_corpus(root, args.videos,
                                                args.frames)
        save_root = os.path.join(root, "out")
        env = dict(os.environ, PYTHONUNBUFFERED="1")
        if args.platform:
            env["HAVATAR_PLATFORM"] = args.platform
        cmd = [sys.executable, "-m", "havatar_tpu.cli.fit_videos_batch",
               "--videos_root", videos_root, "--save_root", save_root,
               "--faceverse_path", fv, "--lms_root", lms_root,
               "--tar_size", "512",
               "--iters_first", str(args.iters_first),
               "--iters_rest", str(args.iters_rest),
               "--io_workers", str(args.io_workers)]
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                              text=True)
        dt = time.time() - t0
        if proc.returncode != 0:
            print(proc.stdout[-2000:])
            print(proc.stderr[-4000:])
            raise SystemExit(proc.returncode)
        n = args.videos * args.frames
        print(json.dumps({
            "videos": args.videos, "frames_per_video": args.frames,
            "io_workers": args.io_workers,
            "iters": [args.iters_first, args.iters_rest],
            "wall_s": round(dt, 1),
            "frames_per_hour": round(n / dt * 3600, 1),
            "s_per_frame": round(dt / n, 2),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
