"""The fused Pallas dense-chain kernel must match the XLA field tail exactly
(run in interpreter mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from havatar_tpu.ops.pallas_mlp import fused_mlp_chain


def _xla_reference(x, params):
    h = jax.nn.relu(x @ params["layer0"]["kernel"] + params["layer0"]["bias"])
    h = jax.nn.relu(h @ params["layer1"]["kernel"] + params["layer1"]["bias"])
    alpha = h @ params["fc_alpha"]["kernel"] + params["fc_alpha"]["bias"]
    feat = h @ params["fc_rgbFeat"]["kernel"] + params["fc_rgbFeat"]["bias"]
    rgb = feat @ params["fc_rgb"]["kernel"] + params["fc_rgb"]["bias"]
    return jnp.concatenate([rgb, feat, alpha], -1)


def _params(rng, fin, hidden=128):
    def dense(i, o):
        return {"kernel": jnp.asarray(rng.randn(i, o).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(o).astype(np.float32) * 0.05)}

    return {"layer0": dense(fin, hidden), "layer1": dense(hidden, hidden),
            "fc_alpha": dense(hidden, 1), "fc_rgbFeat": dense(hidden, 64),
            "fc_rgb": dense(64, 3)}


def test_fused_mlp_chain_matches_xla():
    rng = np.random.RandomState(0)
    N, fin = 3000, 176   # N not a tile multiple on purpose
    params = _params(rng, fin)
    x = jnp.asarray(rng.randn(N, fin).astype(np.float32))
    want = np.asarray(_xla_reference(x, params))
    got = np.asarray(fused_mlp_chain(x, params, interpret=True))
    assert got.shape == (N, 68)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_fused_mlp_chain_bf16_contract():
    """bf16 input -> same dtype handling as the XLA compute_dtype path
    (bf16 matmuls, f32 bias/accum): values agree to bf16 tolerance."""
    rng = np.random.RandomState(1)
    N, fin = 2048, 176
    params = _params(rng, fin)
    x32 = jnp.asarray(rng.randn(N, fin).astype(np.float32))
    want = np.asarray(_xla_reference(x32, params))
    got = np.asarray(fused_mlp_chain(x32.astype(jnp.bfloat16), params,
                                     interpret=True))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)


def test_fused_mlp_chain_grads_match_xla_autodiff():
    """The custom_vjp backward kernel == jax.grad of the XLA chain (f32,
    interpret mode): dx and every weight/bias grad."""
    rng = np.random.RandomState(3)
    N, fin = 700, 176    # padding path exercised (700 % tile != 0)
    params = _params(rng, fin)
    x = jnp.asarray(rng.randn(N, fin).astype(np.float32))
    cot = jnp.asarray(rng.randn(N, 68).astype(np.float32))

    def loss_ref(x, p):
        return jnp.sum(_xla_reference(x, p) * cot)

    def loss_fused(x, p):
        return jnp.sum(fused_mlp_chain(x, p, True, 512) * cot)

    want_dx, want_dp = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    got_dx, got_dp = jax.grad(loss_fused, argnums=(0, 1))(x, params)

    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               atol=1e-4, rtol=1e-4)
    flat_w, tree_w = jax.tree_util.tree_flatten_with_path(want_dp)
    flat_g = jax.tree_util.tree_leaves(got_dp)
    assert len(flat_w) == len(flat_g)
    for (path, w), g in zip(flat_w, flat_g):
        scale = max(1.0, float(np.abs(np.asarray(w)).max()))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-4 * scale, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_fused_mlp_chain_grads_under_jit_and_remat():
    """The vjp composes with jit and jax.checkpoint (the stage-2 G step
    wraps the render in remat)."""
    rng = np.random.RandomState(4)
    N, fin = 512, 176
    params = _params(rng, fin)
    x = jnp.asarray(rng.randn(N, fin).astype(np.float32))

    @jax.jit
    def loss(x, p):
        f = jax.checkpoint(
            lambda x, p: jnp.sum(jnp.square(fused_mlp_chain(x, p, True, 512))))
        return f(x, p)

    g = jax.grad(loss, argnums=1)(x, params)
    want = jax.grad(
        lambda x, p: jnp.sum(jnp.square(_xla_reference(x, p))), argnums=1)(
        x, params)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(want)):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=2e-4)
