"""Oracle tests for the quad-consuming fused field MLP custom_vjp
(ops/pallas_mlp_quad.py) against the plain XLA field math — forward and
every gradient (planes, warped coords, posenc, all five dense layers) —
in Pallas interpret mode on CPU.

The reference math being matched: plane channels interleaved c*P+p
(model/nerf_model.py:99) ++ posenc -> 2x relu Dense(128) -> alpha / feat /
rgb heads, output cat(rgb, feat, alpha) (model/nerf_model.py:101-117).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from havatar_tpu.ops.grid_sample import grid_sample_2d
from havatar_tpu.ops.pallas_mlp_quad import field_radiance_quad


def make_params(rng, fin, hid=32, cf=16, rgb=3):
    ks = jax.random.split(rng, 10)
    s = lambda k, shape: (jax.random.normal(k, shape) * 0.3).astype(
        jnp.float32)
    return {
        "layer0": {"kernel": s(ks[0], (fin, hid)), "bias": s(ks[1], (hid,))},
        "layer1": {"kernel": s(ks[2], (hid, hid)), "bias": s(ks[3], (hid,))},
        "fc_rgbFeat": {"kernel": s(ks[4], (hid, cf)),
                       "bias": s(ks[5], (cf,))},
        "fc_alpha": {"kernel": s(ks[6], (hid, 1)), "bias": s(ks[7], (1,))},
        "fc_rgb": {"kernel": s(ks[8], (cf, rgb)), "bias": s(ks[9], (rgb,))},
    }


def plain_field(plane_xy, plane_zy, warped, pe, params):
    """The unfused reference math (interleaved plane channels ++ posenc)."""
    planes = jnp.stack([plane_xy[None], plane_zy[None]], 0)  # [2, 1, H, W, C]
    xy = grid_sample_2d(planes[0], warped[None][..., (0, 1)], "zeros")[0]
    zy = grid_sample_2d(planes[1], warped[None][..., (2, 1)], "zeros")[0]
    feats = jnp.stack([xy, zy], axis=-1)          # [N, C, P]
    x = jnp.concatenate(
        [feats.reshape(feats.shape[0], -1).astype(jnp.float32), pe], -1)
    h = jax.nn.relu(x @ params["layer0"]["kernel"]
                    + params["layer0"]["bias"])
    h = jax.nn.relu(h @ params["layer1"]["kernel"]
                    + params["layer1"]["bias"])
    alpha = h @ params["fc_alpha"]["kernel"] + params["fc_alpha"]["bias"]
    feat = h @ params["fc_rgbFeat"]["kernel"] + params["fc_rgbFeat"]["bias"]
    rgb = feat @ params["fc_rgb"]["kernel"] + params["fc_rgb"]["bias"]
    return jnp.concatenate([rgb, feat, alpha], axis=-1)


def setup_case(N=97, H=9, W=9, C=8, n_pe=12, seed=0):
    rng = jax.random.PRNGKey(seed)
    ks = jax.random.split(rng, 5)
    plane_xy = jax.random.normal(ks[0], (H, W, C), dtype=jnp.float32)
    plane_zy = jax.random.normal(ks[1], (H, W, C), dtype=jnp.float32)
    warped = jax.random.uniform(ks[2], (N, 3), minval=-1.2, maxval=1.2)
    pe = jax.random.normal(ks[3], (N, n_pe), dtype=jnp.float32)
    params = make_params(ks[4], fin=2 * C + n_pe)
    cot = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, 3 + 16 + 1))
    return plane_xy, plane_zy, warped, pe, params, cot


def quad_fn(plane_xy, plane_zy, warped, pe, params, tile=32):
    return field_radiance_quad("zeros", True, tile, plane_xy, plane_zy,
                               warped, pe, params)


def test_forward_matches_plain():
    plane_xy, plane_zy, warped, pe, params, _ = setup_case()
    want = plain_field(plane_xy, plane_zy, warped, pe, params)
    got = quad_fn(plane_xy, plane_zy, warped, pe, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sorted_scatter", [False, True])
def test_grads_match_plain(sorted_scatter, monkeypatch):
    from havatar_tpu.ops import grid_sample as gs
    monkeypatch.setattr(gs, "SORTED_SCATTER", sorted_scatter)
    plane_xy, plane_zy, warped, pe, params, cot = setup_case(seed=3)

    def loss(fn):
        def f(pxy, pzy, w, p, prm):
            return jnp.sum(fn(pxy, pzy, w, p, prm) * cot)
        return f

    args = (plane_xy, plane_zy, warped, pe, params)
    want = jax.grad(loss(plain_field), argnums=(0, 1, 2, 3, 4))(*args)
    got = jax.grad(loss(quad_fn), argnums=(0, 1, 2, 3, 4))(*args)

    names = ["plane_xy", "plane_zy", "warped", "pe", "params"]
    for name, w, g in zip(names, want, got):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=name),
            w, g)


def test_grads_under_jit_and_checkpoint():
    """The custom_vjp must compose with jit and jax.checkpoint (the
    parity-mode G step wraps the render in jax.checkpoint)."""
    plane_xy, plane_zy, warped, pe, params, cot = setup_case(seed=5, N=40)

    def f(pxy, prm):
        out = field_radiance_quad("zeros", True, 32, pxy, plane_zy, warped,
                                  pe, prm)
        return jnp.sum(out * cot)

    g1 = jax.grad(f)(plane_xy, params)
    g2 = jax.jit(jax.grad(jax.checkpoint(f)))(plane_xy, params)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_padding_rows_are_inert():
    """N not divisible by the tile: pad rows must not contribute to any
    gradient (zero cotangent on pads)."""
    plane_xy, plane_zy, warped, pe, params, cot = setup_case(N=33, seed=7)

    def f(prm):
        out = quad_fn(plane_xy, plane_zy, warped, pe, prm, tile=32)
        return jnp.sum(out * cot)

    def f_ref(prm):
        return jnp.sum(plain_field(plane_xy, plane_zy, warped, pe, prm)
                       * cot)

    got = jax.grad(f)(params)
    want = jax.grad(f_ref)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4),
        want, got)


def test_chunked_backward_matches_unchunked(monkeypatch):
    """The row-chunked backward (scanned re-gather + splat accumulation —
    the round-5 fix for the f32 production-shape HBM OOM) is grad-identical
    to the single-chunk path up to f32 summation order."""
    from havatar_tpu.ops import pallas_mlp_quad as q

    plane_xy, plane_zy, warped, pe, params, cot = setup_case(seed=11, N=96)

    def loss(pxy, pzy, w, p, prm):
        return jnp.sum(quad_fn(pxy, pzy, w, p, prm) * cot)

    args = (plane_xy, plane_zy, warped, pe, params)
    want = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    # chunk=40 over N=96 -> 3 chunks with 24 pad rows in the last
    monkeypatch.setattr(q, "_BWD_CHUNK_ROWS", 40)
    got = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for name, w, g in zip(["plane_xy", "plane_zy", "warped", "pe", "params"],
                          want, got):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=name),
            w, g)
