"""Unit tests for the numerics ops layer against independent oracles
(numpy definitions + torch CPU primitives)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from havatar_tpu import ops
from tests.torch_oracle import upfirdn2d_np


def to_nhwc(x_nchw):
    return jnp.asarray(np.moveaxis(x_nchw, 1, -1))


def from_nhwc(y):
    return np.moveaxis(np.asarray(y), -1, 1)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (2, 1)),
    (2, 1, (2, 1)),
    (1, 2, (1, 1)),
    (2, 1, (1, 0, 1, 0)),     # inverse-Haar padding
    (1, 2, (0, 0)),           # forward-Haar
    (2, 2, (3, 2)),
    (1, 1, (-1, 2)),          # negative padding (crop)
])
@pytest.mark.parametrize("ksize", [2, 3, 4])
def test_upfirdn2d_matches_numpy(up, down, pad, ksize):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 12, 10).astype(np.float32)
    k = rng.randn(ksize, ksize).astype(np.float32)

    pad4 = (pad[0], pad[1], pad[0], pad[1]) if len(pad) == 2 else pad
    want = upfirdn2d_np(x.astype(np.float64), k.astype(np.float64),
                        (up, up), (down, down), pad4)
    got = from_nhwc(ops.upfirdn2d(to_nhwc(x), jnp.asarray(k), up=up, down=down, pad=pad))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample_downsample_blur_shapes():
    x = jnp.ones((1, 16, 16, 4))
    k = ops.make_kernel([1, 3, 3, 1])
    assert ops.upsample2d(x, k).shape == (1, 32, 32, 4)
    assert ops.downsample2d(x, k).shape == (1, 8, 8, 4)


def test_haar_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    fwd = ops.haar_transform(x)
    assert fwd.shape == (2, 8, 8, 12)
    rec = ops.inverse_haar_transform(fwd)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_fused_leaky_relu_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 4, 4).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    want = (F.leaky_relu(torch.from_numpy(x) + torch.from_numpy(b).view(1, 8, 1, 1),
                         0.2) * np.sqrt(2.0)).numpy()
    got = ops.fused_leaky_relu(jnp.asarray(x), jnp.asarray(b), channel_axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(padding_mode):
    rng = np.random.RandomState(3)
    feat = rng.randn(2, 9, 7, 5).astype(np.float32)   # B, H, W, C=5
    coords = (rng.rand(2, 33, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB

    want = F.grid_sample(
        torch.from_numpy(np.moveaxis(feat, -1, 1)),
        torch.from_numpy(coords).unsqueeze(-2),
        mode="bilinear", padding_mode=padding_mode, align_corners=True,
    )[..., 0].permute(0, 2, 1).numpy()

    got = ops.grid_sample_2d(jnp.asarray(feat), jnp.asarray(coords), padding_mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(padding_mode):
    rng = np.random.RandomState(4)
    vol = rng.randn(2, 6, 5, 4, 3).astype(np.float32)  # B, D, H, W, C
    coords = (rng.rand(2, 21, 3).astype(np.float32) * 2.4 - 1.2)

    want = F.grid_sample(
        torch.from_numpy(np.moveaxis(vol, -1, 1)),
        torch.from_numpy(coords).reshape(2, 21, 1, 1, 3),
        mode="bilinear", padding_mode=padding_mode, align_corners=True,
    )[:, :, :, 0, 0].permute(0, 2, 1).numpy()

    got = ops.grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords), padding_mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("sorted_scatter", [False, True])
def test_grid_sample_2d_grads_match_torch(padding_mode, sorted_scatter,
                                          monkeypatch):
    """The custom VJP (TPU-shaped splat backward, ops/grid_sample.py) must
    reproduce torch autograd's gradients wrt both the features and the
    coords — including partially out-of-bounds points in zeros mode and
    clamped points in border mode — for both scatter strategies."""
    from havatar_tpu.ops import grid_sample as gs
    monkeypatch.setattr(gs, "SORTED_SCATTER", sorted_scatter)

    rng = np.random.RandomState(7)
    feat = rng.randn(2, 9, 7, 5).astype(np.float32)
    coords = (rng.rand(2, 33, 2).astype(np.float32) * 2.6 - 1.3)
    cot = rng.randn(2, 33, 5).astype(np.float32)

    tf = torch.from_numpy(np.moveaxis(feat, -1, 1)).requires_grad_(True)
    tc = torch.from_numpy(coords).unsqueeze(-2).requires_grad_(True)
    out = F.grid_sample(tf, tc, mode="bilinear", padding_mode=padding_mode,
                        align_corners=True)[..., 0].permute(0, 2, 1)
    out.backward(torch.from_numpy(cot))
    want_df = np.moveaxis(tf.grad.numpy(), 1, -1)
    want_dc = tc.grad.numpy()[:, :, 0, :]

    def loss(f, c):
        return jnp.sum(gs.grid_sample_2d(f, c, padding_mode)
                       * jnp.asarray(cot))

    df, dc = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(feat), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(df), want_df, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dc), want_dc, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("sorted_scatter", [False, True])
def test_grid_sample_3d_grads_match_torch(padding_mode, sorted_scatter,
                                          monkeypatch):
    from havatar_tpu.ops import grid_sample as gs
    monkeypatch.setattr(gs, "SORTED_SCATTER", sorted_scatter)

    rng = np.random.RandomState(8)
    vol = rng.randn(2, 6, 5, 4, 3).astype(np.float32)
    coords = (rng.rand(2, 21, 3).astype(np.float32) * 2.4 - 1.2)
    cot = rng.randn(2, 21, 3).astype(np.float32)

    tv = torch.from_numpy(np.moveaxis(vol, -1, 1)).requires_grad_(True)
    tc = torch.from_numpy(coords).reshape(2, 21, 1, 1, 3).requires_grad_(True)
    out = F.grid_sample(tv, tc, mode="bilinear", padding_mode=padding_mode,
                        align_corners=True)[:, :, :, 0, 0].permute(0, 2, 1)
    out.backward(torch.from_numpy(cot))
    want_dv = np.moveaxis(tv.grad.numpy(), 1, -1)
    want_dc = tc.grad.numpy().reshape(2, 21, 3)

    def loss(v, c):
        return jnp.sum(gs.grid_sample_3d(v, c, padding_mode)
                       * jnp.asarray(cot))

    dv, dc = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(vol), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(dv), want_dv, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dc), want_dc, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("sorted_scatter", [False, True])
def test_grid_sample_3d_fixed_coords_grads(padding_mode, sorted_scatter,
                                           monkeypatch):
    """coords_grad=False (the skinning-field path): forward identical to the
    full sampler, d(volume) identical to torch autograd, d(coords) exactly
    zero (declared non-differentiated)."""
    from havatar_tpu.ops import grid_sample as gs
    monkeypatch.setattr(gs, "SORTED_SCATTER", sorted_scatter)

    rng = np.random.RandomState(11)
    vol = rng.randn(2, 6, 5, 4, 3).astype(np.float32)
    coords = (rng.rand(2, 21, 3).astype(np.float32) * 2.4 - 1.2)
    cot = rng.randn(2, 21, 3).astype(np.float32)

    tv = torch.from_numpy(np.moveaxis(vol, -1, 1)).requires_grad_(True)
    tc = torch.from_numpy(coords).reshape(2, 21, 1, 1, 3)
    out = F.grid_sample(tv, tc, mode="bilinear", padding_mode=padding_mode,
                        align_corners=True)[:, :, :, 0, 0].permute(0, 2, 1)
    out.backward(torch.from_numpy(cot))
    want_dv = np.moveaxis(tv.grad.numpy(), 1, -1)

    got = gs.grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                            padding_mode, coords_grad=False)
    want_fwd = gs.grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                                 padding_mode)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want_fwd))

    def loss(v, c):
        return jnp.sum(gs.grid_sample_3d(v, c, padding_mode,
                                         coords_grad=False)
                       * jnp.asarray(cot))

    dv, dc = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(vol), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(dv), want_dv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dc), np.zeros_like(coords))


def test_grid_sample_grads_match_autodiff_bf16():
    """bf16 features: the custom backward accumulates the splat in f32 and
    casts once — values must still agree with torch's f32 grads to bf16
    tolerance."""
    from havatar_tpu.ops import grid_sample as gs
    rng = np.random.RandomState(9)
    feat = rng.randn(1, 9, 7, 4).astype(np.float32)
    coords = (rng.rand(1, 65, 2).astype(np.float32) * 1.8 - 0.9)
    cot = rng.randn(1, 65, 4).astype(np.float32)

    tf = torch.from_numpy(np.moveaxis(feat, -1, 1)).requires_grad_(True)
    tc = torch.from_numpy(coords).unsqueeze(-2)
    out = F.grid_sample(tf, tc, mode="bilinear", padding_mode="zeros",
                        align_corners=True)[..., 0].permute(0, 2, 1)
    out.backward(torch.from_numpy(cot))
    want_df = np.moveaxis(tf.grad.numpy(), 1, -1)

    def loss(f):
        out = gs.grid_sample_2d(f.astype(jnp.bfloat16),
                                jnp.asarray(coords), "zeros")
        return jnp.sum(out.astype(jnp.float32) * jnp.asarray(cot))

    df = jax.grad(loss)(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(df), want_df, rtol=0.05, atol=0.05)


def test_sample_from_triplane_axis_convention():
    """Plane 0 reads (x,y), plane 1 reads (z,y) (utils/util.py:378-384)."""
    rng = np.random.RandomState(5)
    planes = rng.randn(2, 1, 8, 8, 4).astype(np.float32)
    coords = rng.rand(1, 10, 3).astype(np.float32) * 1.6 - 0.8

    out = ops.sample_from_triplane(jnp.asarray(coords), jnp.asarray(planes))
    assert out.shape == (1, 10, 4, 2)

    xy = ops.grid_sample_2d(jnp.asarray(planes[0]), jnp.asarray(coords[..., [0, 1]]))
    zy = ops.grid_sample_2d(jnp.asarray(planes[1]), jnp.asarray(coords[..., [2, 1]]))
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(xy))
    np.testing.assert_allclose(np.asarray(out[..., 1]), np.asarray(zy))


def test_positional_encoding_matches_reference_layout():
    """Feature order is [F, (sin, sin+pi/2), C] flattened
    (model/network/embedder.py:40-56)."""
    x = np.array([[0.3, -0.2, 0.7]], dtype=np.float32)
    F_ = 4
    got = np.asarray(ops.positional_encoding(jnp.asarray(x), F_))
    assert got.shape == (1, 2 * F_ * 3)
    freqs = 2.0 ** np.linspace(0, F_ - 1, F_)
    want = []
    for f in freqs:
        want.append(np.sin(x[0] * f))
        want.append(np.sin(x[0] * f + np.pi / 2))
    want = np.concatenate(want)
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-6)


def test_boxwarp_param_and_apply():
    bounds = [[-1.5, 1.5], [-1.6, 1.4], [-1.6, 1.2]]
    warp = ops.BoxWarp.from_bounds(bounds)
    lo = np.array([[b[0] for b in bounds]], dtype=np.float32)
    hi = np.array([[b[1] for b in bounds]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(warp(jnp.asarray(lo))), -1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(warp(jnp.asarray(hi))), 1.0, atol=1e-6)
    np.testing.assert_allclose(warp.inv(np.asarray(warp(jnp.asarray(lo)))), lo, atol=1e-6)


def test_cumprod_exclusive():
    x = jnp.asarray(np.random.RandomState(6).rand(3, 5).astype(np.float32))
    got = np.asarray(ops.cumprod_exclusive(x))
    want = np.cumprod(np.asarray(x), -1)
    want = np.roll(want, 1, -1)
    want[..., 0] = 1.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_volume_render_reference_semantics():
    """sigmoid on rgb[:3] only; feat channels linear; bg composited on :3
    (utils/nerf_util.py:40-71)."""
    rng = np.random.RandomState(7)
    R, S, C = 6, 10, 8   # 3 rgb + 4 feat + 1 sigma
    rf = rng.randn(R, S, C).astype(np.float32)
    z = np.sort(rng.rand(R, S).astype(np.float32), axis=-1) + 1.0
    rd = rng.randn(R, 3).astype(np.float32)
    bg = rng.rand(R, 3).astype(np.float32)

    rgb, disp, acc, w, depth = ops.volume_render_radiance_field(
        jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd),
        background_prior=jnp.asarray(bg))

    # independent numpy recompute
    dists = np.concatenate([z[:, 1:] - z[:, :-1], (z[:, -1:] - z[:, -2:-1])], -1)
    dists = dists * np.linalg.norm(rd, axis=-1, keepdims=True)
    color = rf[..., :-1].copy()
    color[..., :3] = 1 / (1 + np.exp(-color[..., :3]))
    sig = np.maximum(rf[..., -1], 0)
    alpha = 1 - np.exp(-sig * dists)
    t = np.cumprod(1 - alpha + 1e-10, -1)
    t = np.roll(t, 1, -1)
    t[..., 0] = 1
    ww = alpha * t
    want_rgb = (ww[..., None] * color).sum(-2)
    want_acc = ww.sum(-1)
    want_rgb[..., :3] += (1 - want_acc[..., None]) * bg

    np.testing.assert_allclose(np.asarray(rgb), want_rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), want_acc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), ww, rtol=1e-4, atol=1e-5)


def test_sample_pdf_det_matches_torch_searchsorted():
    rng = np.random.RandomState(8)
    R, S = 4, 9
    bins = np.sort(rng.rand(R, S).astype(np.float32), -1)
    weights = rng.rand(R, S - 1).astype(np.float32)

    got = np.asarray(ops.sample_pdf(jnp.asarray(bins), jnp.asarray(weights),
                                    num_samples=7, det=True))

    # independent torch recompute of the inverse-CDF interpolation
    w = torch.from_numpy(weights) + 1e-5
    pdf = w / w.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0, 1, 7).expand(R, 7).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = (inds - 1).clamp(min=0)
    above = inds.clamp(max=cdf.shape[-1] - 1)
    cdf_g = torch.stack([torch.gather(cdf, 1, below), torch.gather(cdf, 1, above)], -1)
    b = torch.from_numpy(bins)
    bins_g = torch.stack([torch.gather(b, 1, below.clamp(max=S - 1)),
                          torch.gather(b, 1, above.clamp(max=S - 1))], -1)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    want = (bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_get_rays_matches_torch_reference_math():
    intr = np.array([500.0, 510.0, 0.5, 0.52], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.1, -0.2, 2.5]
    H = W = 8
    ro, rd = ops.get_rays_np(H, W, intr, c2w)
    assert ro.shape == (H, W, 3) and rd.shape == (H, W, 3)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(ro[0, 0], c2w[:3, 3])
    # center pixel looks along +z (K has no skew, identity rotation)
    K = ops.intrinsics_to_K(intr, W, H)
    ij = np.array([3.0, 3.0, 1.0], np.float32)
    want_dir = np.linalg.inv(K) @ ij
    want_dir /= np.linalg.norm(want_dir)
    np.testing.assert_allclose(rd[3, 3], want_dir, atol=1e-5)

    # jnp variant agrees
    ro2, rd2 = ops.get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(rd2), rd, atol=1e-4)


def test_eval_sh_deg0_and_deg2():
    rng = np.random.RandomState(9)
    sh0 = rng.randn(5, 3, 1).astype(np.float32)
    out0 = np.asarray(ops.eval_sh(0, jnp.asarray(sh0), jnp.zeros((5, 3))))
    np.testing.assert_allclose(out0, 0.28209479177387814 * sh0[..., 0], rtol=1e-6)

    sh2 = rng.randn(5, 3, 9).astype(np.float32)
    dirs = rng.randn(5, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, -1, keepdims=True)
    out2 = ops.eval_sh(2, jnp.asarray(sh2), jnp.asarray(dirs))
    assert out2.shape == (5, 3)
