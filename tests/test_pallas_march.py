"""Fused field+composite kernels (interpret mode) vs the unfused XLA math:
field MLP -> volume_render_radiance_field, incl. the concat-order fine
composite vs sort-then-composite."""

import numpy as np

import jax
import jax.numpy as jnp

from havatar_tpu.ops import volume_render_radiance_field
from havatar_tpu.ops.pallas_march import (
    fused_march_coarse,
    fused_march_fine,
)


def _params(rng, fin=176, hidden=128, cf=64):
    def dense(i, o):
        return {"kernel": jnp.asarray(rng.randn(i, o).astype(np.float32) * .2),
                "bias": jnp.asarray(rng.randn(o).astype(np.float32) * .2)}

    return {"layer0": dense(fin, hidden), "layer1": dense(hidden, hidden),
            "fc_alpha": dense(hidden, 1), "fc_rgbFeat": dense(hidden, cf),
            "fc_rgb": dense(cf, 3)}


def _xla_field(x, p):
    h = jax.nn.relu(x @ p["layer0"]["kernel"] + p["layer0"]["bias"])
    h = jax.nn.relu(h @ p["layer1"]["kernel"] + p["layer1"]["bias"])
    alpha = h @ p["fc_alpha"]["kernel"] + p["fc_alpha"]["bias"]
    feat = h @ p["fc_rgbFeat"]["kernel"] + p["fc_rgbFeat"]["bias"]
    rgb = feat @ p["fc_rgb"]["kernel"] + p["fc_rgb"]["bias"]
    return jnp.concatenate([rgb, feat, alpha], -1)


def _ref_composite(rad, z, rd, bg=None):
    return volume_render_radiance_field(rad, z, rd, background_prior=bg)


def test_coarse_kernel_matches_unfused():
    rng = np.random.RandomState(0)
    R, S, fin = 128, 16, 176
    p = _params(rng, fin)
    x = jnp.asarray(rng.randn(R, S, fin).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.rand(R, S).astype(np.float32) * 2 + 1), -1)
    rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))

    dists = jnp.diff(z, axis=-1)
    dists = jnp.concatenate([dists, dists[..., -1:]], -1)
    dists = dists * jnp.linalg.norm(rd, axis=-1, keepdims=True)

    rad = _xla_field(x.reshape(R * S, fin), p).reshape(R, S, 68)
    want_rgb, _, want_acc, want_w, _ = _ref_composite(rad, z, rd)

    rgbmap, w, keeps = fused_march_coarse(x, dists, p, interpret=True)
    np.testing.assert_allclose(np.asarray(w), np.asarray(want_w),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rgbmap), np.asarray(want_rgb),
                               atol=1e-4, rtol=1e-3)
    # half-rate reuse outputs, packed [feat | rgb | sig_hi | sig_lo]
    k = np.asarray(keeps, np.float32).reshape(R, S // 2, 69)
    np.testing.assert_allclose(k[..., 67] + k[..., 68],
                               np.asarray(rad[:, ::2, -1]),
                               atol=1e-5, rtol=1e-5)   # hi+lo ~ f32 sigma
    np.testing.assert_allclose(k[..., 64:67], np.asarray(rad[:, ::2, :3]),
                               atol=0.02, rtol=0.02)   # bf16 storage
    np.testing.assert_allclose(k[..., :64], np.asarray(rad[:, ::2, 3:67]),
                               atol=0.05, rtol=0.02)




def _pack_keeps(rad_keep):
    """rad_keep [R, Sk, 68] f32 -> the coarse kernel's packed keep layout."""
    R, Sk, _ = rad_keep.shape
    feat = rad_keep[..., 3:67].astype(jnp.bfloat16)
    rgb = rad_keep[..., :3].astype(jnp.bfloat16)
    sig = rad_keep[..., 67:]
    hi = sig.astype(jnp.bfloat16)
    lo = (sig - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([feat, rgb, hi, lo], -1).reshape(R * Sk, 69)


def test_fine_kernel_matches_sorted_composite():
    rng = np.random.RandomState(1)
    R, S, fin = 128, 16, 176
    Sn, Sk = 8, S // 2
    Sa = Sn + Sk
    p = _params(rng, fin)
    rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))

    # keep depths: strided ascending; new depths: random in range
    z = jnp.sort(jnp.asarray(rng.rand(R, S).astype(np.float32) * 2 + 1), -1)
    z_keep = z[:, ::2]
    z_new = jnp.sort(
        jnp.asarray(rng.rand(R, Sn).astype(np.float32) * 2 + 1), -1)

    x_keep = jnp.asarray(rng.randn(R, Sk, fin).astype(np.float32))
    x_new = jnp.asarray(rng.randn(R, Sn, fin).astype(np.float32))

    rad_keep = _xla_field(x_keep.reshape(-1, fin), p).reshape(R, Sk, 68)
    rad_new = _xla_field(x_new.reshape(-1, fin), p).reshape(R, Sn, 68)

    # reference: sort-then-composite (renderer merge semantics)
    z_cat = jnp.concatenate([z_keep, z_new], -1)
    rad_cat = jnp.concatenate([rad_keep, rad_new], 1)
    a, b = z_keep, z_new
    pos_a = (jnp.arange(Sk) + jnp.sum(b[:, None, :] < a[:, :, None], -1))
    pos_b = (jnp.arange(Sn) + jnp.sum(a[:, :, None] <= b[:, None, :], 1))
    ranks = jnp.concatenate([pos_a, pos_b], -1)            # [R, Sa]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Sa), 2)
    onehot = (ranks[:, :, None] == iota).astype(jnp.float32)
    z_all = jnp.einsum("rks,rk->rs", onehot, z_cat)
    rad_all = jnp.einsum("rks,rkc->rsc", onehot, rad_cat)
    want_rgb, _, want_acc, want_w_sorted, _ = _ref_composite(rad_all, z_all, rd)

    # kernel: concat-order composite
    d_sorted = jnp.diff(z_all, axis=-1)
    d_sorted = jnp.concatenate([d_sorted, d_sorted[..., -1:]], -1)
    d_sorted = d_sorted * jnp.linalg.norm(rd, axis=-1, keepdims=True)
    d_concat = jnp.einsum("rks,rs->rk", onehot, d_sorted)

    rgbmap, w_concat = fused_march_fine(
        x_new, _pack_keeps(rad_keep), d_concat, ranks, p, num_keep=Sk,
        interpret=True)

    # compare weights mapped back to sorted order
    w_sorted = jnp.einsum("rks,rk->rs", onehot, w_concat)
    np.testing.assert_allclose(np.asarray(w_sorted), np.asarray(want_w_sorted),
                               atol=5e-3, rtol=5e-3)       # bf16 keeps
    np.testing.assert_allclose(np.asarray(rgbmap), np.asarray(want_rgb),
                               atol=0.05, rtol=0.02)
    np.testing.assert_allclose(np.asarray(jnp.sum(w_concat, -1)),
                               np.asarray(want_acc), atol=5e-3, rtol=5e-3)


def test_fine_kernel_exact_with_f32_keeps():
    """With f32 keeps and f32 x, the concat-order composite is exact to
    float tolerance vs sort-then-composite."""
    rng = np.random.RandomState(2)
    R, fin = 128, 176
    Sn, Sk = 4, 8
    Sa = Sn + Sk
    p = _params(rng, fin)
    rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    z_keep = jnp.sort(jnp.asarray(rng.rand(R, Sk).astype(np.float32)), -1)
    z_new = jnp.sort(jnp.asarray(rng.rand(R, Sn).astype(np.float32)), -1)
    x_keep = jnp.asarray(rng.randn(R, Sk, fin).astype(np.float32))
    x_new = jnp.asarray(rng.randn(R, Sn, fin).astype(np.float32))
    rad_keep = _xla_field(x_keep.reshape(-1, fin), p).reshape(R, Sk, 68)

    z_cat = jnp.concatenate([z_keep, z_new], -1)
    rad_new = _xla_field(x_new.reshape(-1, fin), p).reshape(R, Sn, 68)
    rad_cat = jnp.concatenate([rad_keep, rad_new], 1)
    pos_a = (jnp.arange(Sk) + jnp.sum(z_new[:, None, :] < z_keep[:, :, None], -1))
    pos_b = (jnp.arange(Sn) + jnp.sum(z_keep[:, :, None] <= z_new[:, None, :], 1))
    ranks = jnp.concatenate([pos_a, pos_b], -1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Sa), 2)
    onehot = (ranks[:, :, None] == iota).astype(jnp.float32)
    z_all = jnp.einsum("rks,rk->rs", onehot, z_cat)
    rad_all = jnp.einsum("rks,rkc->rsc", onehot, rad_cat)
    want_rgb, _, _, want_w, _ = _ref_composite(rad_all, z_all, rd)

    d_sorted = jnp.diff(z_all, axis=-1)
    d_sorted = jnp.concatenate([d_sorted, d_sorted[..., -1:]], -1)
    d_sorted = d_sorted * jnp.linalg.norm(rd, axis=-1, keepdims=True)
    d_concat = jnp.einsum("rks,rs->rk", onehot, d_sorted)

    rgbmap, w_concat = fused_march_fine(
        x_new, _pack_keeps(rad_keep), d_concat, ranks, p, num_keep=Sk,
        interpret=True)
    # rebuild the reference with the SAME bf16-rounded keeps
    rad_keep_r = jnp.concatenate(
        [rad_keep[..., :3].astype(jnp.bfloat16).astype(jnp.float32),
         rad_keep[..., 3:67].astype(jnp.bfloat16).astype(jnp.float32),
         rad_keep[..., 67:]], -1)
    rad_cat_r = jnp.concatenate([rad_keep_r, rad_new], 1)
    rad_all_r = jnp.einsum("rks,rkc->rsc", onehot, rad_cat_r)
    want_rgb_r, _, _, want_w_r, _ = _ref_composite(rad_all_r, z_all, rd)
    w_sorted = jnp.einsum("rks,rk->rs", onehot, w_concat)
    np.testing.assert_allclose(np.asarray(w_sorted), np.asarray(want_w_r),
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(rgbmap), np.asarray(want_rgb_r),
                               atol=1e-3, rtol=1e-3)


def _interleave_planes(xy, zy):
    """[R, S, C] x2 -> [R, S, 2C] in the reference channel order c*2+p
    (model/nerf_model.py:99) that the plain kernels' layer0 expects."""
    R, S, C = xy.shape
    return jnp.stack([xy, zy], axis=-1).reshape(R, S, 2 * C)


def test_quad_kernels_match_plain_kernels():
    """The quad-consuming kernels (raw gather rows + in-kernel corner
    reduction + permuted layer0) must equal the plain kernels fed the
    pre-reduced interleaved input — same math, relocated."""
    from havatar_tpu.ops.pallas_march import (
        fused_march_coarse_quad,
        fused_march_fine_quad,
    )

    rng = np.random.RandomState(7)
    R, S, C, n_pe = 64, 8, 64, 48
    fin = 2 * C + n_pe
    p = _params(rng, fin)

    def mk(Sx):
        quads = jnp.asarray(rng.randn(R, Sx, 8 * C).astype(np.float32))
        pe = rng.randn(R, Sx, n_pe).astype(np.float32)
        w8 = rng.rand(R, Sx, 8).astype(np.float32)
        aux = jnp.asarray(np.concatenate([pe, w8], -1))
        # the XLA-side reduction the quad kernel replaces
        q4 = quads.reshape(R, Sx, 8, C)
        xy = jnp.einsum("rskc,rsk->rsc", q4[:, :, :4], aux[..., n_pe:n_pe + 4])
        zy = jnp.einsum("rskc,rsk->rsc", q4[:, :, 4:], aux[..., n_pe + 4:])
        x = jnp.concatenate([_interleave_planes(xy, zy), aux[..., :n_pe]], -1)
        return quads, aux, x

    quads, aux, x = mk(S)
    z = jnp.sort(jnp.asarray(rng.rand(R, S).astype(np.float32) * 2 + 1), -1)
    rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    dists = jnp.diff(z, axis=-1)
    dists = jnp.concatenate([dists, dists[..., -1:]], -1)
    dists = dists * jnp.linalg.norm(rd, axis=-1, keepdims=True)

    want = fused_march_coarse(x, dists, p, interpret=True)
    got = fused_march_coarse_quad(quads, aux, dists, p, interpret=True)
    # keeps are stored bf16: the in-kernel sequential corner adds vs the
    # test's einsum reduction differ in f32 association order, which can
    # flip a bf16 rounding boundary (1 ulp) on ~0.1% of elements
    for g, w, name, tol in zip(got, want, ("rgbmap", "weights", "keeps"),
                               (1e-5, 1e-5, 5e-3)):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   atol=tol, rtol=2 * tol, err_msg=name)

    # fine pass: new samples through the quad path
    Sn, Sk = 4, S // 2
    Sa = Sn + Sk
    qn, auxn, xn = mk(Sn)
    keeps = want[2]
    ranks = jnp.asarray(
        np.stack([rng.permutation(Sa) for _ in range(R)]).astype(np.int32))
    d_concat = jnp.asarray(rng.rand(R, Sa).astype(np.float32))
    want_f = fused_march_fine(xn, keeps, d_concat, ranks, p, num_keep=Sk,
                              interpret=True)
    got_f = fused_march_fine_quad(qn, auxn, keeps, d_concat, ranks, p,
                                  num_keep=Sk, interpret=True)
    for g, w, name in zip(got_f, want_f, ("rgbmap", "weights")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-4, err_msg=name)


def test_renderer_fused_path_matches_xla_path():
    """AvatarRenderer(use_pallas_march=True) == the XLA path (perturb/noise
    off) to bf16-keep tolerance, via the real module tree on CPU."""
    from havatar_tpu.models.renderer import AvatarRenderer

    rng = jax.random.PRNGKey(3)
    B, R = 1, 64
    ray = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0),
        (jax.random.uniform(rng, (B, R, 2)) - 0.5) * 0.4,
        jnp.full((B, R, 1), -1.0),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    bg = jnp.ones((B, R, 3)) * 0.5
    latent = jnp.zeros((B, 32))
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    conds = [jnp.full((B, 32, 32, 7), 0.5)] * 3

    kw = dict(plane_res=32, cond_res=32, plane_middle_size=8,
              skin_vol_res=16, render_size=8)
    r_ref = AvatarRenderer(**kw)
    r_fus = AvatarRenderer(use_pallas_march=True, **kw)
    variables = r_ref.init(rng, ray[:, :8], bg[:, :8], latent, inv_T, *conds,
                           num_coarse=4, num_fine=2, perturb=False)

    out_ref = r_ref.apply(variables, ray, bg, latent, inv_T, *conds,
                          num_coarse=16, num_fine=4, perturb=False)
    out_fus = r_fus.apply(variables, ray, bg, latent, inv_T, *conds,
                          num_coarse=16, num_fine=4, perturb=False)

    for key, tol in (("rgb_coarse", 1e-4), ("acc_coarse", 1e-4),
                     ("depth_coarse", 1e-4), ("rgb_fine", 2e-2),
                     ("acc_fine", 1e-2), ("depth_fine", 1e-2)):
        np.testing.assert_allclose(
            np.asarray(out_fus[key]), np.asarray(out_ref[key]),
            atol=tol, rtol=tol, err_msg=key)
