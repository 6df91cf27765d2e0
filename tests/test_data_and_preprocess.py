"""Tests for the data layer (against a synthetic on-disk dataset in the
reference split format) and the preprocessing subsystem."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from havatar_tpu.utils.cfgnode import CfgNode
from tests.make_synthetic_dataset import make_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    split = make_dataset(root, num_frames=3, img_res=32, cond_res=32)
    cfg = CfgNode({
        "experiment": {"patch_rgb": False},
        "dataset": {"near": -1.6, "far": 1.0, "length": 1.0,
                    "num_random_rays": 32, "cond_render_res": 32},
    })
    return split, cfg


def test_stage1_ray_dataset(synth):
    from havatar_tpu.data import AvatarDataset, Loader

    split, cfg = synth
    ds = AvatarDataset(split, "train", cfg)
    assert len(ds) == 3
    item = ds.load_item(0)
    # 12-channel ray layout [o, d, near, far, bg, mask] (dataloader.py:179)
    assert item["mv_rays"].shape == (32, 13 - 1)
    assert item["gt_color"].shape == (32, 3)
    assert item["front_render_cond"].shape == (32, 32, 7)
    assert item["inv_head_T"].shape == (4, 3)
    # dirs unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(item["mv_rays"][:, 3:6], axis=-1), 1.0, atol=1e-5)
    # mask channel binary
    assert set(np.unique(item["mv_rays"][:, -1])) <= {0.0, 1.0}

    loader = Loader(ds, batch_size=2, num_workers=1)
    batch = next(iter(loader))
    assert batch["mv_rays"].shape == (2, 32, 12)
    assert batch["dataset_idx"].shape == (2,)


def test_patch_sampling_mode(synth):
    from havatar_tpu.data import AvatarDataset

    split, cfg = synth
    cfg2 = cfg.clone()
    cfg2.experiment.patch_rgb = True
    ds = AvatarDataset(split, "train", cfg2)
    ds.patch_size, ds.n_patches = 8, 1
    item = ds.load_item(1)
    assert item["mv_rays"].shape[0] == 64  # one 8x8 patch


def test_full_image_mode(synth):
    from havatar_tpu.data import AvatarDataset

    split, cfg = synth
    ds = AvatarDataset(split, "train", cfg, down_sample=0.5, full_image=True)
    item = ds.load_item(0)
    assert item["mv_rays"].shape == (16 * 16, 12)   # 16² downsampled rays
    assert item["gt_color"].shape == (32 * 32, 3)   # full-res GT


def test_test_mode_no_gt(synth):
    from havatar_tpu.data import AvatarDataset

    split, cfg = synth
    ds = AvatarDataset(split, "test", cfg, full_image=True)
    item = ds.load_item(0)
    assert item["mv_rays"].shape == (32 * 32, 11)   # no mask channel
    assert "gt_color" not in item


def test_inv_head_transform_math():
    from havatar_tpu.data import inv_head_transform

    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    rot[3, :3] = [0.1, 0.2, 0.3]  # row-vector translation (right-multiply)
    out = inv_head_transform(rot.T.T)  # head_transformation as stored
    assert out.shape == (4, 3)


def test_rasterizer_against_brute_force():
    """z-buffer correctness: nearest triangle wins, barycentric interpolation
    matches a direct per-pixel evaluation."""
    from havatar_tpu.preprocess.rasterizer import rasterize_ortho

    rng = np.random.RandomState(0)
    # two overlapping triangles at different depths
    verts = np.asarray([
        [-0.5, -0.5, 0.0], [0.9, -0.4, 0.0], [0.0, 0.8, 0.0],     # near z=0
        [-0.8, -0.8, 0.5], [0.8, -0.8, 0.5], [0.0, 0.9, 0.5],     # far z=-0.5
    ], np.float32)
    verts[3:, 2] = -0.5  # farther (depth = -z)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    attrs = np.asarray([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)

    img, depth, mask = rasterize_ortho(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs),
        jnp.asarray([1.0, 1.0, 0.0, 0.0]), res=16, chunk=1)
    img = np.asarray(img)
    mask = np.asarray(mask)
    assert mask.sum() > 10
    # wherever both triangles cover, the near (red) one wins
    covered_red = img[..., 0] > 0.5
    covered_green = img[..., 1] > 0.5
    assert covered_red.sum() > 0 and covered_green.sum() > 0
    assert not np.any(covered_red & covered_green)
    # near-triangle pixels all have depth 0 (attrs interpolate to pure red)
    np.testing.assert_allclose(np.asarray(depth)[covered_red], 0.0, atol=1e-5)


def test_depth2normal_flat_plane():
    from havatar_tpu.preprocess.rasterizer import depth2normal_ortho

    depth = jnp.ones((8, 8))
    n = np.asarray(depth2normal_ortho(depth, 0.1, 0.1))
    inner = n[2:-2, 2:-2]
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)


def test_faceverse_coeff_roundtrip_and_rotation():
    from havatar_tpu.preprocess import faceverse as fv

    coeffs = jnp.asarray(np.random.RandomState(0).randn(2, 150 + 52 + 251 + 37 + 1)
                         .astype(np.float32))
    parts = fv.split_coeffs(coeffs, 52)
    merged = fv.merge_coeffs(*parts[:-1], parts[-1])
    np.testing.assert_allclose(np.asarray(merged), np.asarray(coeffs), atol=1e-6)

    # euler rotation matches the reference convention: transposed Rz·Ry·Rx
    import torch

    angles = np.asarray([[0.1, -0.2, 0.3]], np.float32)
    got = np.asarray(fv.euler_rotation(jnp.asarray(angles)))[0]
    ax, ay, az = angles[0]
    Rx = np.asarray([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                     [0, np.sin(ax), np.cos(ax)]])
    Ry = np.asarray([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                     [-np.sin(ay), 0, np.cos(ay)]])
    Rz = np.asarray([[np.cos(az), -np.sin(az), 0],
                     [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    want = (Rz @ Ry @ Rx).T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fitting_converges_on_synthetic_landmarks():
    """Fit rot/trans/exp to landmarks generated by a known coefficient
    vector — loss must drop by >10x."""
    from havatar_tpu.preprocess import faceverse as fv
    from havatar_tpu.preprocess import fitting

    rng = np.random.RandomState(0)
    V = 60
    model = fv.FaceVerseModel(
        meanshape=jnp.asarray(rng.randn(1, 3 * V).astype(np.float32) * 0.1),
        meantex=jnp.zeros((1, 3 * V)),
        id_base=jnp.asarray(rng.randn(3 * V, 150).astype(np.float32) * 0.01),
        exp_base=jnp.asarray(rng.randn(3 * V, 52).astype(np.float32) * 0.01),
        tex_base=jnp.asarray(rng.randn(3 * V, 251).astype(np.float32) * 0.01),
        tri=jnp.asarray(rng.randint(0, V, (40, 3)).astype(np.int32)),
        point_buf=jnp.zeros((V, 4), jnp.int32),
        kp_inds=jnp.asarray((np.arange(478) % V).astype(np.int32)),
        ver_inds=(V - 20, V - 10, V))

    intr = np.asarray([500.0, 500.0, 128.0, 128.0], np.float32)
    true = fitting.init_fit_state(52)._replace(
        rot=jnp.asarray([[0.1, -0.05, 0.02]]),
        trans=jnp.asarray([[0.05, -0.02, 0.1]]))
    gt_lms, _ = fv.forward_landmarks(model, fitting.pack(true),
                                     *intr, cam_dist=10.0)

    cfg = fitting.FitConfig(img_size=256)
    fit = fitting.make_fit_frame(model, intr, cfg, num_iters=150,
                                 first_frame=True, fit_id=False)
    state0 = fitting.init_fit_state(52)
    state, final_loss = fit(state0, gt_lms[0], jnp.zeros((1, 3)),
                            jnp.zeros((1, 3)))
    # recovered head pose close to ground truth
    np.testing.assert_allclose(np.asarray(state.rot), np.asarray(true.rot),
                               atol=0.05)
    assert np.all(np.asarray(state.exp_c) >= 0.0)  # clamp held


def test_multiview_intrinsic_adjustment():
    from havatar_tpu.preprocess.multiview import adjust_intrinsic

    K = np.asarray([[100.0, 0, 50], [0, 100, 60], [0, 0, 1]], np.float32)
    K2 = adjust_intrinsic(K, "padding", (10, 10))
    K2 = adjust_intrinsic(K2, "crop", (20, 30))
    K2 = adjust_intrinsic(K2, "resize", (0.5, 0.5))
    np.testing.assert_allclose(K2[0, 2], (50 + 10 - 20) * 0.5)
    np.testing.assert_allclose(K2[1, 2], (60 + 10 - 30) * 0.5)
    np.testing.assert_allclose(K2[0, 0], 50.0)


def test_animation_transplant():
    from havatar_tpu.preprocess import faceverse as fv
    from havatar_tpu.preprocess.animation import transplant_coeffs

    class M:
        exp_dims = 52

    dim = 150 + 52 + 251 + 38
    avatar = np.zeros(dim, np.float32)
    actor = np.ones(dim, np.float32) * 2
    base = np.ones(dim, np.float32)
    out = transplant_coeffs(M, avatar, actor, base, incre_expr=True)
    np.testing.assert_allclose(out[150:202], 1.0)      # delta exp
    np.testing.assert_allclose(out[:150], 0.0)         # identity untouched
    all_dims = 150 + 52 + 251
    np.testing.assert_allclose(out[all_dims + 33:all_dims + 37], 2.0)  # pupils
    out2 = transplant_coeffs(M, avatar, actor, None, incre_expr=False)
    np.testing.assert_allclose(out2[150:202], 2.0)     # absolute exp


def test_render_chunked_matches_unchunked():
    from havatar_tpu.models import AvatarRenderer

    model = AvatarRenderer(latent_code_dim=8, plane_feat_dim=16, plane_res=16,
                           cond_res=32, plane_middle_size=4, feat_dim=16,
                           render_size=4, skin_vol_res=8)
    B, R = 1, 16
    rays = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0),
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), -1.0),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    bg = jnp.ones((B, R, 3))
    latent = jnp.zeros((B, 8))
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    conds = [jnp.full((B, 32, 32, 7), 0.4)] * 3
    params = model.init(jax.random.PRNGKey(0), rays, bg, latent, inv_T,
                        *conds, num_coarse=4, num_fine=2, perturb=False)
    full = model.apply(params, rays, bg, latent, inv_T, *conds,
                       num_coarse=4, num_fine=2, perturb=False)
    chunked = model.apply(params, rays, bg, latent, inv_T, *conds,
                          chunk_size=4, num_coarse=4, num_fine=2,
                          perturb=False,
                          method=AvatarRenderer.render_chunked)
    np.testing.assert_allclose(np.asarray(chunked["rgb_fine"]),
                               np.asarray(full["rgb_fine"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(chunked["acc_coarse"]),
                               np.asarray(full["acc_coarse"]), atol=1e-5)


def test_fit_videos_batch_debug_outputs(tmp_path):
    """fvmask / lmscounter debug artifacts (spec: fit_videos_mp.py:268-278):
    silhouette mask covers the projected mesh; contour image draws the
    mouth/eye rings + pupils."""
    import numpy as np

    from havatar_tpu.cli import fit_videos_batch as B
    from havatar_tpu.preprocess import faceverse as fv
    from tests.test_fit_video_e2e import make_fake_faceverse

    fv_path = str(tmp_path / "fv.npy")
    make_fake_faceverse(fv_path)
    model = fv.load_model_file(fv_path)

    coeffs = np.zeros((610,), np.float32)
    coeffs[-1] = 1.0                     # scale
    coeffs[606] = 0.0
    intr = np.asarray([256.0, 256.0, 64.0, 64.0], np.float32)

    mask = B.render_fvmask(model, coeffs, intr, tar_size=128)
    assert mask.shape == (128, 128) and mask.dtype == np.uint8
    assert (mask == 255).any()           # mesh covers some pixels

    lms = np.random.RandomState(0).rand(478, 2).astype(np.float32) * 100 + 10
    img = B.draw_lms_counter(np.zeros((128, 128, 3), np.uint8), lms)
    assert img.any()                     # something was drawn
    assert img.shape == (128, 128, 3)


def test_fit_videos_batch_io_fanout_deterministic(tmp_path, monkeypatch):
    """The IO worker pool (fit_videos_batch.iter_videos_prefetched) must not
    change outputs: any worker count yields the same videos in the same
    order with identical landmark stacks, and the full CLI writes identical
    assets for --io_workers 1 vs 2."""
    import sys

    import cv2
    import numpy as np

    from havatar_tpu.cli import fit_videos_batch as B
    from tests.test_fit_video_e2e import make_fake_faceverse

    rng = np.random.RandomState(0)
    videos_root = tmp_path / "videos"
    lms_root = tmp_path / "lms"
    for v in ("a", "b", "c"):
        (videos_root / v).mkdir(parents=True)
        (lms_root / v).mkdir(parents=True)
        for i in range(3):
            cv2.imwrite(str(videos_root / v / f"{i}.png"),
                        rng.randint(0, 255, (16, 16, 3), np.uint8))
            # plausible on-screen landmarks for a 128px fit
            lms = rng.rand(478, 2).astype(np.float32) * 80 + 20
            np.save(str(lms_root / v / f"{i}.npy"), lms)

    def snapshot(io_workers):
        out = []
        for name, frames, lms, failed in B.iter_videos_prefetched(
                ["a", "b", "c"], str(videos_root), str(lms_root),
                io_workers):
            assert failed is None
            out.append((name, tuple(frames), lms.copy()))
        return out

    s1, s3 = snapshot(1), snapshot(3)
    assert [x[0] for x in s1] == [x[0] for x in s3] == ["a", "b", "c"]
    for (_, f1, l1), (_, f3, l3) in zip(s1, s3):
        assert f1 == f3
        np.testing.assert_array_equal(l1, l3)

    # full CLI: identical assets regardless of worker count
    fv_path = str(tmp_path / "fv.npy")
    make_fake_faceverse(fv_path)

    def run(save_root, workers):
        argv = ["fit_videos_batch",
                "--videos_root", str(videos_root),
                "--save_root", str(save_root),
                "--faceverse_path", fv_path,
                "--lms_root", str(lms_root),
                "--tar_size", "128",
                "--iters_first", "2", "--iters_rest", "1",
                "--io_workers", str(workers)]
        monkeypatch.setattr(sys, "argv", argv)
        B.main()

    run(tmp_path / "out1", 1)
    run(tmp_path / "out2", 2)
    for v in ("a", "b", "c"):
        assert (tmp_path / "out1" / v / "finish").exists()
        d1 = sorted((tmp_path / "out1" / v).glob("*/coeffs.npy"))
        d2 = sorted((tmp_path / "out2" / v).glob("*/coeffs.npy"))
        assert d1 and [p.parent.name for p in d1] == [p.parent.name
                                                      for p in d2]
        for p1, p2 in zip(d1, d2):
            np.testing.assert_array_equal(np.load(p1), np.load(p2))
