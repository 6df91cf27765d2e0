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
