"""Round-trip test: preprocessing split writers -> data layer.

Builds a fake tracking directory (frame assets as written by
save_frame_assets + condition renders + rgb/mask frames), runs
make_transform, and validates the resulting JSON loads through
AvatarDataset — i.e. our preprocessing output feeds our training input,
with the same on-disk contract as the reference."""

import json
import os

import numpy as np
import pytest

from havatar_tpu.preprocess.pipeline import (
    filter_selected_transform,
    make_animation_transform,
    make_transform,
    save_frame_assets,
)
from havatar_tpu.utils.cfgnode import CfgNode


def _write_png(path, arr):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, arr)


def _fake_tracking(base, save_dir, frames, img_res=32, view="0"):
    rng = np.random.RandomState(0)
    for fid in frames:
        coeffs = rng.randn(491).astype(np.float32)
        rot = np.eye(4, dtype=np.float32)
        rot[3, :3] = [0.01 * int(fid), 0, 0]
        save_frame_assets(save_dir, fid, coeffs, head_T=rot, extr=rot,
                          transformation=rot)
        inst = os.path.join(save_dir, fid)
        for v in ("front", "left", "right"):
            img = (rng.rand(img_res, img_res, 3) * 255).astype(np.uint8)
            _write_png(os.path.join(inst, f"ortho_{v}_render_256_baseGama.png"), img)
            _write_png(os.path.join(inst, f"ortho_{v}_normal_256_baseGama.png"), img)
        _write_png(os.path.join(base, f"mv_rgb{img_res}", view, f"{fid}.png"),
                   (rng.rand(img_res, img_res, 3) * 255).astype(np.uint8))
        mask = np.zeros((img_res, img_res, 3), np.uint8)
        mask[8:-8, 8:-8] = 255
        _write_png(os.path.join(base, f"mv_mask{img_res}", view, f"{fid}.png"), mask)


def test_make_transform_roundtrip(tmp_path):
    base = str(tmp_path)
    save_dir = os.path.join(base, "tracking")
    frames = ["10", "11", "12"]
    img_res = 32
    _fake_tracking(base, save_dir, frames, img_res)

    K = np.asarray([[100.0, 0, 16], [0, 100, 16], [0, 0, 1]])
    T = np.eye(4)
    T[2, 3] = 3.0
    calib = {"img_res": img_res,
             "intrinsics": {"0": {"cam_K": K.tolist(), "cam_T": T.tolist()}}}
    split = make_transform(base, save_dir, calib, ["0"], "10",
                           shuffle=True, seed=0)
    meta = json.loads(open(split).read())
    assert meta["img_res"] == img_res
    assert len(meta["frames"]) == 3
    f0 = meta["frames"][0]
    assert set(f0) >= {"fidx", "inst_dir", "head_transformation",
                       "mutiview_info_ls"}
    mv = f0["mutiview_info_ls"][0]
    assert set(mv) >= {"view_name", "mask_path", "file_path",
                       "transform_matrix", "transform_matrix_ori"}

    # ...and the data layer consumes it
    from havatar_tpu.data import AvatarDataset

    cfg = CfgNode({"experiment": {"patch_rgb": False},
                   "dataset": {"near": -1.6, "far": 1.0, "length": 1.0,
                               "num_random_rays": 16, "cond_render_res": 32}})
    ds = AvatarDataset(split, "train", cfg)
    item = ds.load_item(0)
    assert item["mv_rays"].shape == (16, 12)
    assert np.isfinite(item["mv_rays"]).all()


def test_animation_transform_and_freeview(tmp_path):
    base = str(tmp_path)
    drive_save = os.path.join(base, "drive_tracking")
    avatar_base = os.path.join(base, "avatar", "10")
    rng = np.random.RandomState(1)
    rot = np.eye(4, dtype=np.float32)
    os.makedirs(avatar_base, exist_ok=True)
    np.save(os.path.join(avatar_base, "coeffs.npy"), rng.randn(491))
    np.savez(os.path.join(avatar_base, "metaFace_extr.npz"),
             head_T=rot, extr=rot, transformation=rot, self_rotation=np.eye(3))

    for fid in ("0", "1"):
        save_frame_assets(drive_save, fid, rng.randn(491), rot, rot, rot)
        os.makedirs(os.path.join(drive_save, fid, "driveA"), exist_ok=True)

    K = np.asarray([[100.0, 0, 16], [0, 100, 16], [0, 0, 1]])
    calib = {"img_res": 32, "intrinsics": {}}
    out = make_animation_transform(base, drive_save, calib, "0", K,
                                   avatar_baseframe_path=avatar_base,
                                   drive_dir_name="driveA", view_num=4)
    meta = json.loads(open(out).read())
    assert len(meta["frames"]) == 2
    assert len(meta["frames"][0]["mutiview_info_ls"]) == 4
    sel = out.split(".")[0] + "_selected.json"
    assert os.path.exists(sel)
    sel_meta = json.loads(open(sel).read())
    assert len(sel_meta["frames"][0]["mutiview_info_ls"]) <= 2


def test_merge_partial():
    from havatar_tpu.checkpoints.partial import merge_partial

    target = {"a": np.zeros(3), "b": {"c": np.zeros((2, 2)), "d": np.zeros(1)},
              "latent_codes": np.zeros(5)}
    source = {"a": np.ones(3), "b": {"c": np.ones((2, 2)),
                                     "d": np.ones(9)},  # shape mismatch
              "latent_codes": np.ones(5)}
    merged, loaded, skipped = merge_partial(target, source,
                                            except_paths=["latent_codes"])
    np.testing.assert_allclose(merged["a"], 1.0)
    np.testing.assert_allclose(merged["b"]["c"], 1.0)
    np.testing.assert_allclose(merged["b"]["d"], 0.0)   # mismatch skipped
    np.testing.assert_allclose(merged["latent_codes"], 0.0)  # excluded
    assert len(loaded) == 2 and len(skipped) == 2
