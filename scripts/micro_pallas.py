"""Fused Pallas field kernel vs XLA path on TPU, real sizes."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=10):
    def run(*a):
        def one(i):
            return fn(a[0] * (1.0 + i * 1e-9), *a[1:])
        return jax.lax.map(one, jnp.arange(n, dtype=jnp.float32))
    f = jax.jit(run)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from havatar_tpu.ops.pallas_field import fused_field_eval
    from havatar_tpu.ops import positional_encoding

    rng = np.random.RandomState(0)
    N, F_in, H = 1_310_720, 128, 128

    def dense(i, o):
        return {"kernel": jnp.asarray(rng.randn(i, o).astype(np.float32) * .05),
                "bias": jnp.asarray(rng.randn(o).astype(np.float32) * .05)}

    params = {"layer0": dense(F_in + 48, H), "layer1": dense(H, H),
              "fc_alpha": dense(H, 1), "fc_rgbFeat": dense(H, 64),
              "fc_rgb": dense(64, 3)}
    pts = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    feat16 = jnp.asarray(rng.randn(N, F_in).astype(np.float32)).astype(jnp.bfloat16)

    def xla_path(pts, feat):
        cdt = feat.dtype
        enc = positional_encoding(pts, 8).astype(cdt)
        x = jnp.concatenate([feat, enc], -1)
        h = jax.nn.relu(x @ params["layer0"]["kernel"].astype(cdt)
                        + params["layer0"]["bias"].astype(cdt))
        h = jax.nn.relu(h @ params["layer1"]["kernel"].astype(cdt)
                        + params["layer1"]["bias"].astype(cdt))
        alpha = h @ params["fc_alpha"]["kernel"].astype(cdt) + params["fc_alpha"]["bias"].astype(cdt)
        f = h @ params["fc_rgbFeat"]["kernel"].astype(cdt) + params["fc_rgbFeat"]["bias"].astype(cdt)
        rgb = f @ params["fc_rgb"]["kernel"].astype(cdt) + params["fc_rgb"]["bias"].astype(cdt)
        return jnp.concatenate([rgb, f, alpha], -1).astype(jnp.float32)

    res = {}
    res["xla_bf16_ms"] = bench(xla_path, pts, feat16)
    res["pallas_bf16_ms"] = bench(
        lambda p, f: fused_field_eval(p, f, params), pts, feat16)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
