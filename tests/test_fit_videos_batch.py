"""Dataset-scale batch fitting CLI (cli/fit_videos_batch.py, the TPU-native
analogue of the reference's fit_videos_mp.py Pool(8) driver):

1. IO worker count must NEVER change the outputs — the pool only prefetches
   decode+landmark work; videos are consumed in submission order and the
   device fit is serial. 1 worker vs 4 workers must produce bit-identical
   assets (spec: fit_videos_mp.py:59-75 fans over processes; our redesign
   moves the parallelism to IO only).
2. Per-frame pose assets: each frame's metaFace_extr.npz must be built from
   THAT frame's fitted rot/trans (regression: an earlier version stamped
   every frame with the final fit state's pose).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_fit_video_e2e import make_fake_faceverse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_inputs(tmp_path, n_videos=3, n_frames=3, res=64):
    import cv2

    rng = np.random.RandomState(7)
    videos_root = tmp_path / "videos"
    lms_root = tmp_path / "lms"
    for v in range(n_videos):
        vdir = videos_root / f"vid{v}"
        ldir = lms_root / f"vid{v}"
        vdir.mkdir(parents=True)
        ldir.mkdir(parents=True)
        for i in range(n_frames):
            img = (rng.rand(res, res, 3) * 80).astype(np.uint8)
            cv2.imwrite(str(vdir / f"{i}.png"), img)
            # landmarks drift frame to frame so the fitted pose varies
            lms = np.stack([16 + 32 * rng.rand(478),
                            16 + 32 * rng.rand(478)], -1).astype(np.float32)
            lms += 2.0 * i
            np.save(str(ldir / f"{i}.npy"), lms)
    fv_path = tmp_path / "faceverse_tiny.npy"
    make_fake_faceverse(str(fv_path))
    return str(videos_root), str(lms_root), str(fv_path)


def _run(videos_root, lms_root, fv_path, save_root, io_workers):
    env = dict(os.environ, HAVATAR_PLATFORM="cpu", PYTHONUNBUFFERED="1")
    proc = subprocess.run(
        [sys.executable, "-m", "havatar_tpu.cli.fit_videos_batch",
         "--videos_root", videos_root, "--save_root", save_root,
         "--faceverse_path", fv_path, "--lms_root", lms_root,
         "--tar_size", "64", "--iters_first", "8", "--iters_rest", "4",
         "--io_workers", str(io_workers)],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


def _collect_assets(save_root):
    out = {}
    for root, _, files in os.walk(save_root):
        for f in files:
            p = os.path.join(root, f)
            rel = os.path.relpath(p, save_root)
            if f == "coeffs.npy":
                out[rel] = np.load(p)
            elif f == "metaFace_extr.npz":
                with np.load(p) as z:
                    out[rel] = {k: z[k] for k in z.files}
            else:
                out[rel] = None  # markers: presence only
    return out


@pytest.mark.slow
def test_io_worker_count_does_not_change_outputs(tmp_path):
    videos_root, lms_root, fv_path = _make_inputs(tmp_path)
    a = str(tmp_path / "out_w1")
    b = str(tmp_path / "out_w4")
    _run(videos_root, lms_root, fv_path, a, io_workers=1)
    _run(videos_root, lms_root, fv_path, b, io_workers=4)

    assets_a = _collect_assets(a)
    assets_b = _collect_assets(b)
    assert assets_a.keys() == assets_b.keys()
    assert any(k.endswith("coeffs.npy") for k in assets_a)
    for k, va in assets_a.items():
        vb = assets_b[k]
        if isinstance(va, dict):
            for name in va:
                np.testing.assert_array_equal(va[name], vb[name], err_msg=k)
        elif va is not None:
            np.testing.assert_array_equal(va, vb, err_msg=k)

    # resumability: every video got its finish marker
    for v in range(3):
        assert os.path.exists(os.path.join(a, f"vid{v}", "finish"))

    # per-frame pose regression: the saved head transforms must differ
    # across frames (each frame re-fits rot/trans on drifted landmarks)
    with np.load(os.path.join(a, "vid0", "0", "metaFace_extr.npz")) as z0, \
            np.load(os.path.join(a, "vid0", "2", "metaFace_extr.npz")) as z2:
        assert not np.allclose(z0["head_T"], z2["head_T"]), (
            "all frames share one pose — metaFace_extr must come from each "
            "frame's own coeffs")
