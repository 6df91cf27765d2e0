"""Self-golden regression: a fixed-seed tiny render must reproduce stored
values exactly (atol 1e-4). Protects the numerics through future
optimization rounds even when the torch-oracle tests aren't run.

Regenerate (only after an INTENDED numerics change, with oracle parity
green): python tests/test_golden_regression.py --regen
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "renderer_tiny.npz")


def _tiny_render():
    from havatar_tpu.models import AvatarRenderer

    model = AvatarRenderer(latent_code_dim=8, plane_feat_dim=16, plane_res=16,
                           cond_res=32, plane_middle_size=4, feat_dim=16,
                           render_size=4, skin_vol_res=8)
    B, R = 1, 16
    rng = jax.random.PRNGKey(1234)
    k1, k2, k3 = jax.random.split(rng, 3)
    rays = jnp.concatenate([
        jax.random.normal(k1, (B, R, 3)) * 0.1,
        jax.random.normal(k2, (B, R, 3)) * 0.05 + jnp.asarray([0., 0., -1.]),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0)], -1)
    bg = jnp.full((B, R, 3), 0.5)
    latent = jnp.full((B, 8), 0.1)
    inv_T = jnp.broadcast_to(jnp.concatenate(
        [jnp.eye(3), jnp.full((1, 3), 0.05)], 0), (B, 4, 3))
    conds = [jax.random.uniform(jax.random.fold_in(k3, i), (B, 32, 32, 7))
             for i in range(3)]
    params = model.init(jax.random.PRNGKey(7), rays, bg, latent, inv_T,
                        *conds, num_coarse=6, num_fine=3, perturb=False)
    out = model.apply(params, rays, bg, latent, inv_T, *conds,
                      num_coarse=6, num_fine=3, perturb=False)
    return {
        "rgb_coarse": np.asarray(out["rgb_coarse"]),
        "rgb_fine": np.asarray(out["rgb_fine"]),
        "acc_fine": np.asarray(out["acc_fine"]),
        "depth_fine": np.asarray(out["depth_fine"]),
    }


def test_renderer_matches_golden():
    assert os.path.exists(GOLDEN), (
        "golden fixture missing — run tests/test_golden_regression.py --regen")
    want = dict(np.load(GOLDEN))
    got = _tiny_render()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-4, rtol=1e-3,
                                   err_msg=f"golden mismatch in {k}")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **_tiny_render())
        print(f"wrote {GOLDEN}")
