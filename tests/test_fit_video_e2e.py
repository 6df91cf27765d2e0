"""End-to-end preprocessing: synthetic video -> fit_video CLI (frame
extraction + crop, precomputed matting + landmarks, jitted FaceVerse fitting,
condition renders, split JSON) -> the split loads through AvatarDataset.

Uses a tiny synthetic FaceVerse model dict in the reference's .npy layout
and precomputed landmark/mask backends (the zero-dependency path)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def make_fake_faceverse(path, V=80, exp_dims=52):
    rng = np.random.RandomState(0)
    tri = rng.randint(0, V, (60, 3)).astype(np.int64)
    model = {
        "meanshape": (rng.randn(V * 3) * 0.5).astype(np.float32),
        "meantex": np.abs(rng.randn(V * 3)).astype(np.float32) * 120,
        "idBase": (rng.randn(V * 3, 150) * 0.01).astype(np.float32),
        "exBase": (rng.randn(V * 3, 171) * 0.01).astype(np.float32),
        "texBase": (rng.randn(V * 3, 251) * 0.01).astype(np.float32),
        "tri": tri,
        "point_buf": rng.randint(0, 60, (V, 8)).astype(np.int64),
        "mediapipe_keypoints": (np.arange(478) % V).astype(np.int64),
        "ver_inds": np.asarray([V - 30, V - 15, V]),
        "uv": rng.rand(V, 2).astype(np.float32),
        "left_eye_exp": np.zeros(exp_dims, np.float32),
        "right_eye_exp": np.zeros(exp_dims, np.float32),
    }
    np.save(path, model, allow_pickle=True)


@pytest.mark.slow
def test_fit_video_cli_end_to_end(tmp_path):
    import cv2

    rng = np.random.RandomState(1)
    res = 128
    n_frames = 3

    # synthetic video with a bright square "face"
    video_path = str(tmp_path / "input.mp4")
    vw = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (res, res))
    assert vw.isOpened(), "mp4v codec unavailable"
    for i in range(n_frames):
        frame = (rng.rand(res, res, 3) * 60).astype(np.uint8)
        frame[32:96, 32:96] = 200
        vw.write(frame)
    vw.release()

    # precomputed landmarks: a 478-point blob inside the face square
    lms_dir = tmp_path / "lms"
    lms_dir.mkdir()
    base_lms = np.stack([
        32 + 64 * rng.rand(478), 32 + 64 * rng.rand(478)], -1).astype(np.float32)
    # crop uses mediapipe indices 105/334 (brows), 152 (chin), 6 (bridge)
    base_lms[105] = [48, 44]
    base_lms[334] = [80, 44]
    base_lms[152] = [64, 90]
    base_lms[6] = [64, 60]
    for i in range(n_frames + 1):
        np.save(str(lms_dir / f"{i}.npy"), base_lms)

    fv_path = str(tmp_path / "faceverse_tiny.npy")
    make_fake_faceverse(fv_path)

    base_dir = str(tmp_path / "out")

    # 1st pass will fail at matting (no masks yet) — prime the mask dir by
    # running extraction first through the CLI's own code path
    from havatar_tpu.preprocess import landmarks as lm
    from havatar_tpu.preprocess import video as pv

    backend = lm.PrecomputedBackend(str(lms_dir))

    def detect(frame_rgb):
        backend.set_frame("0")
        return backend.detect(frame_rgb)

    tar = 64
    pv.extract_video_frames(video_path, base_dir, detect, dst_resolution=tar)
    img_dir = os.path.join(base_dir, f"mv_rgb{tar}", "0")
    mask_dir = os.path.join(base_dir, f"mv_mask{tar}", "0")
    os.makedirs(mask_dir, exist_ok=True)
    for name in os.listdir(img_dir):
        m = np.zeros((tar, tar), np.uint8)
        m[8:-8, 8:-8] = 255
        cv2.imwrite(os.path.join(mask_dir, name), m)

    env = dict(os.environ, HAVATAR_PLATFORM="cpu", PYTHONUNBUFFERED="1")
    proc = subprocess.run(
        [sys.executable, "-m", "havatar_tpu.cli.fit_video",
         "--video_path", video_path, "--base_dir", base_dir,
         "--faceverse_path", fv_path, "--exp52_path", "/nonexistent",
         "--lms_dir", str(lms_dir), "--tar_size", str(tar),
         "--first_frame_iters", "10", "--frame_iters", "5",
         "--base_zero_frame", "0"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-3000:]

    split = os.path.join(base_dir, "sv_v31_all.json")
    assert os.path.exists(split), proc.stdout[-2000:]
    meta = json.loads(open(split).read())
    assert len(meta["frames"]) >= 1
    inst = meta["frames"][0]["inst_dir"]
    assert os.path.exists(os.path.join(
        inst, "ortho_front_render_256_baseGama.png"))

    # the split loads through the data layer
    from havatar_tpu.data import AvatarDataset
    from havatar_tpu.utils.cfgnode import CfgNode

    cfg = CfgNode({"experiment": {"patch_rgb": False},
                   "dataset": {"near": -1.6, "far": 1.0, "length": 1.0,
                               "num_random_rays": 16,
                               "cond_render_res": 64}})
    ds = AvatarDataset(split, "train", cfg)
    item = ds.load_item(0)
    assert item["mv_rays"].shape == (16, 12)
    assert np.isfinite(item["mv_rays"]).all()
