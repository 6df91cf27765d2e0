"""Two-axis ('dcn', 'data') mesh: the multi-slice layout parallel/mesh.py
documents must actually partition and reproduce single-device semantics.

The mesh is (2 slices x 4 chips) over the 8 virtual CPU devices; the
training batch axis shards over BOTH axes (P(('dcn', 'data'))) so the
compiler-inserted gradient psum crosses the slice boundary — on real
hardware the outer axis rides DCN, the inner ICI, but the SPMD program is
identical. Verified exactly like the driver dryrun's section 1: sharded
grads == single-device grads.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from havatar_tpu.parallel import make_mesh, replicated
from havatar_tpu.train import stage1

from tests.test_train_steps import tiny_batch, tiny_cfg


@pytest.mark.slow
def test_dcn_data_mesh_grads_match_single_device():
    mesh = make_mesh(("dcn", "data"), shape=(2, 4))
    assert mesh.shape == {"dcn": 2, "data": 4}

    cfg = tiny_cfg()
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng, B=8)
    example = {k: np.asarray(v) for k, v in batch.items()}
    model, state = stage1.init_state(cfg, rng, num_frames=8,
                                     example_batch=example)

    loss_fn = stage1.make_loss_fn(model, cfg)
    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    g_ref, aux_ref = grad_fn((state.params, state.latent_codes),
                             state.buffers, batch, jax.random.PRNGKey(1))

    bsh = NamedSharding(mesh, P(("dcn", "data")))
    batch_sh = {
        k: jax.device_put(v, bsh if (hasattr(v, "ndim") and v.ndim >= 1)
                          else replicated(mesh))
        for k, v in batch.items()
    }
    state_sh = jax.device_put(state, replicated(mesh))
    g_sh, aux_sh = grad_fn((state_sh.params, state_sh.latent_codes),
                           state_sh.buffers, batch_sh, jax.random.PRNGKey(1))

    a, b = float(aux_ref["loss"]), float(aux_sh["loss"])
    assert np.isfinite(a) and abs(a - b) <= 1e-4 * max(1.0, abs(a)), (a, b)
    for ref_leaf, sh_leaf in zip(jax.tree_util.tree_leaves(g_ref),
                                 jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(ref_leaf), np.asarray(sh_leaf),
                                   atol=1e-5, rtol=5e-3)
