"""The fused Pallas field kernel must match the XLA field tail exactly
(run in interpreter mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from havatar_tpu.ops.pallas_field import fused_field_eval
from havatar_tpu.ops import positional_encoding


def _xla_reference(pts, pts_feat, params):
    enc = positional_encoding(pts, 8)
    x = jnp.concatenate([pts_feat, enc], -1)
    h = jax.nn.relu(x @ params["layer0"]["kernel"] + params["layer0"]["bias"])
    h = jax.nn.relu(h @ params["layer1"]["kernel"] + params["layer1"]["bias"])
    alpha = h @ params["fc_alpha"]["kernel"] + params["fc_alpha"]["bias"]
    feat = h @ params["fc_rgbFeat"]["kernel"] + params["fc_rgbFeat"]["bias"]
    rgb = feat @ params["fc_rgb"]["kernel"] + params["fc_rgb"]["bias"]
    return jnp.concatenate([rgb, feat, alpha], -1)


def test_fused_field_matches_xla():
    rng = np.random.RandomState(0)
    N, F_in, H = 3000, 128, 128   # N not a tile multiple on purpose

    def dense(i, o):
        return {"kernel": jnp.asarray(rng.randn(i, o).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(o).astype(np.float32) * 0.05)}

    params = {"layer0": dense(F_in + 48, H), "layer1": dense(H, H),
              "fc_alpha": dense(H, 1), "fc_rgbFeat": dense(H, 64),
              "fc_rgb": dense(64, 3)}
    pts = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    feat = jnp.asarray(rng.randn(N, F_in).astype(np.float32))

    want = np.asarray(_xla_reference(pts, feat, params))
    got = np.asarray(fused_field_eval(pts, feat, params, interpret=True))
    assert got.shape == (N, 68)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
