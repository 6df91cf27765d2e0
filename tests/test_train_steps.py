"""Unit tests for the stage-1 and stage-2 training steps on tiny configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from havatar_tpu.utils.cfgnode import CfgNode


def tiny_cfg():
    return CfgNode({
        "experiment": {"randomseed": 0, "latent_code_dim": 8,
                       "mask_weight": 0.01, "rgb_loss": "mse",
                       "patch_rgb": False, "cond_pose": True,
                       "cond_expr": False, "validate_every": 100,
                       "save_every": 100, "print_every": 1,
                       "train_iters": 10},
        "dataset": {"near": -1.6, "far": 1.0, "length": 1.0,
                    "num_random_rays": 16, "down_sample": 1.0,
                    "cond_render_res": 32},
        "models": {"StyleUnet": {"inp_size": 4, "inp_ch": 16, "out_ch": 16,
                                 "out_size": 16},
                   "coarse": {"Head_bounding": [[-1.2, 1.2], [-1.6, 1.0], [-1.6, 1.2]],
                              "XYZ_bounding": [[-1.5, 1.5], [-1.6, 1.4], [-1.6, 1.2]],
                              "num_encoding_fn_xyz": 2,
                              "plane_feat_dim": 16, "plane_res": 16,
                              "plane_middle_size": 4, "skin_vol_res": 8}},
        "optimizer": {"type": "adam", "lr": 5e-4},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1,
                      "lr_floor": 5e-5},
        "gan": {"latent": 16, "n_mlp": 2, "channel_multiplier": 1,
                "batch": 2, "lr": 1e-3, "mixing": 0.9, "r1": 10.0,
                "d_reg_every": 16, "g_reg_every": 4,
                "path_regularize": 2.0, "path_batch_shrink": 2,
                "iter": 10},
        "nerf": {"train": {"chunksize": 4096, "perturb": True,
                           "num_coarse": 4, "num_fine": 2,
                           "radiance_field_noise_std": 0.1},
                 "validation": {"chunksize": 4096, "perturb": False,
                                "num_coarse": 4, "num_fine": 2,
                                "radiance_field_noise_std": 0.0}},
    })


def tiny_batch(rng, B=2, R=16, gen_size=16, render_size=4):
    k = jax.random.split(rng, 8)
    rays = jnp.concatenate([
        jax.random.normal(k[0], (B, R, 3)) * 0.1,
        jax.random.normal(k[1], (B, R, 3)) * 0.05 + jnp.asarray([0., 0., -1.]),
        jnp.full((B, R, 1), 1.4), jnp.full((B, R, 1), 4.0),
        jax.random.uniform(k[2], (B, R, 3)),
        (jax.random.uniform(k[3], (B, R, 1)) > 0.5).astype(jnp.float32),
    ], axis=-1)
    return {
        "mv_rays": rays,
        "gt_color": jax.random.uniform(k[4], (B, R, 3)),
        "dataset_idx": jnp.arange(B),
        "inv_head_T": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3)),
        "front_render_cond": jax.random.uniform(k[5], (B, 32, 32, 7)),
        "left_render_cond": jax.random.uniform(k[6], (B, 32, 32, 7)),
        "right_render_cond": jax.random.uniform(k[7], (B, 32, 32, 7)),
        "gt_hr_img": jax.random.uniform(k[4], (B, gen_size, gen_size, 3)),
        "gt_lr_mask": (jax.random.uniform(
            k[3], (B, render_size, render_size, 1)) > 0.5).astype(jnp.float32),
    }


def test_stage1_step_decreases_loss():
    from havatar_tpu.train import stage1

    cfg = tiny_cfg()
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng)
    example = {k: np.asarray(v) for k, v in batch.items()}
    model, state = stage1.init_state(cfg, rng, num_frames=2,
                                     example_batch=example)
    step = stage1.make_train_step(model, cfg)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 4
    # latent codes get gradient (selected rows must change)
    assert float(jnp.abs(state.latent_codes).max()) > 0


def test_stage1_step_skin_bf16():
    """models.skin_compute_dtype=bfloat16: the skinning volume GATHER runs
    bf16 (64 B rows) while the custom grid-sample VJP still accumulates the
    splat backward in f32 (ops/grid_sample.py) — the step must run and
    train."""
    from havatar_tpu.train import stage1

    cfg = tiny_cfg()
    cfg.models.skin_compute_dtype = "bfloat16"
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng)
    example = {k: np.asarray(v) for k, v in batch.items()}
    model, state = stage1.init_state(cfg, rng, num_frames=2,
                                     example_batch=example)
    assert model.skin_compute_dtype == "bfloat16"
    step = stage1.make_train_step(model, cfg)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_stage1_quad_shard_map_matches_single_device():
    """Stage-1 analogue of the stage-2 mesh test: make_train_step(mesh=...)
    routes the render through shard_map over the ray axis (quad kernels in
    interpret mode); with perturb off the sharded step equals the
    single-device one."""
    from havatar_tpu.parallel import make_mesh
    from havatar_tpu.train import stage1

    cfg = tiny_cfg()
    cfg.models.use_pallas_mlp_quad = True
    cfg.nerf.train.perturb = False
    cfg.nerf.train.radiance_field_noise_std = 0.0
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng)  # R=16 rays, divides the 8-device mesh
    example = {k: np.asarray(v) for k, v in batch.items()}
    model, state = stage1.init_state(cfg, rng, num_frames=2,
                                     example_batch=example)
    step_s = stage1.make_train_step(model, cfg)
    step_m = stage1.make_train_step(model, cfg, mesh=make_mesh(("data",)))

    st_s, m_s = step_s(state, batch, jax.random.PRNGKey(5))
    st_m, m_m = step_m(state, batch, jax.random.PRNGKey(5))
    for key in ("loss", "coarse_loss", "fine_loss", "mask_coarse_loss"):
        np.testing.assert_allclose(float(m_m[key]), float(m_s[key]),
                                   atol=1e-5, rtol=1e-5, err_msg=key)
    for a, b in zip(jax.tree_util.tree_leaves(st_s.params),
                    jax.tree_util.tree_leaves(st_m.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-3)


def test_stage1_pretrain_skinning_reduces_bce():
    from havatar_tpu.train import stage1

    cfg = tiny_cfg()
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng)
    example = {k: np.asarray(v) for k, v in batch.items()}
    model, state = stage1.init_state(cfg, rng, num_frames=2,
                                     example_batch=example)
    new_params, hist = stage1.pretrain_skinning(
        model, state.params, state.buffers, jax.random.PRNGKey(1),
        cfg.models.coarse.Head_bounding, num_iter=30, steps=8)
    assert float(hist[-1]) < float(hist[0])


@pytest.mark.slow
def test_stage2_steps_run_and_update():
    from havatar_tpu.train import stage2

    cfg = tiny_cfg()
    # SWGAN geometry needs inp_size >= 8 (channel map bottoms out at 4)
    cfg.models.StyleUnet.inp_size = 16
    cfg.models.StyleUnet.out_size = 64
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng, R=16 * 16, gen_size=64, render_size=16)
    example = {k: np.asarray(v) for k, v in batch.items()}
    models, state = stage2.init_state(cfg, rng, num_frames=2,
                                      example_batch=example)
    renderer, generator, discriminator = models
    d_step, r1_step, g_step, dg_step = stage2.make_steps(
        cfg, renderer, generator, discriminator)

    d0 = jax.tree_util.tree_leaves(state.d_params)[0].copy()
    state, dm = d_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(dm["d"]))

    state, rm = r1_step(state, batch)
    assert np.isfinite(float(rm["r1"]))

    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    n0 = jax.tree_util.tree_leaves(state.nerf_params)[0].copy()
    state, gm = g_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(gm["nerf_loss"]))
    assert np.isfinite(float(gm["g"]))

    # all three parameter sets actually moved
    d1 = jax.tree_util.tree_leaves(state.d_params)[0]
    g1 = jax.tree_util.tree_leaves(state.g_params)[0]
    n1 = jax.tree_util.tree_leaves(state.nerf_params)[0]
    assert float(jnp.abs(d1 - d0).max()) > 0
    assert float(jnp.abs(g1 - g0).max()) > 0
    assert float(jnp.abs(n1 - n0).max()) > 0
    # EMA moved toward g
    assert int(state.step) == 1

    # fused fast step: one program updates D, G, NeRF and EMA
    state, fm = dg_step(state, batch, jax.random.PRNGKey(3))
    for key in ("d", "g", "nerf_loss", "hr_l1", "real_score"):
        assert np.isfinite(float(fm[key])), key
    d2 = jax.tree_util.tree_leaves(state.d_params)[0]
    g2 = jax.tree_util.tree_leaves(state.g_params)[0]
    n2 = jax.tree_util.tree_leaves(state.nerf_params)[0]
    assert float(jnp.abs(d2 - d1).max()) > 0
    assert float(jnp.abs(g2 - g1).max()) > 0
    assert float(jnp.abs(n2 - n1).max()) > 0
    assert int(state.step) == 2


@pytest.mark.slow
def test_stage2_fused_mlp_noremat_matches_default():
    """The production fast path (`train_avatarHD.py --fused-mlp`:
    use_pallas_mlp + remat_render=False) is loss-identical to the default
    XLA-field rematted dg_step — same state, batch and rng through both
    step functions (the Pallas custom_vjp runs in interpret mode on CPU)."""
    from havatar_tpu.train import stage2

    cfg = tiny_cfg()
    cfg.models.StyleUnet.inp_size = 16
    cfg.models.StyleUnet.out_size = 64
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng, R=16 * 16, gen_size=64, render_size=16)
    example = {k: np.asarray(v) for k, v in batch.items()}
    models, state = stage2.init_state(cfg, rng, num_frames=2,
                                      example_batch=example)
    _, _, _, dg_ref = stage2.make_steps(cfg, *models)

    cfg_f = tiny_cfg()
    cfg_f.models.StyleUnet.inp_size = 16
    cfg_f.models.StyleUnet.out_size = 64
    cfg_f.models.use_pallas_mlp = True
    models_f = stage2.build_models(cfg_f)
    _, _, _, dg_fast = stage2.make_steps(cfg_f, *models_f,
                                         remat_render=False)

    step_rng = jax.random.PRNGKey(3)
    state_r, m_ref = dg_ref(state, batch, step_rng)
    state_f, m_fast = dg_fast(state, batch, step_rng)

    for key in ("rgb_loss", "mask_loss", "nerf_loss", "g", "hr_l1", "d",
                "real_score", "fake_score"):
        np.testing.assert_allclose(float(m_fast[key]), float(m_ref[key]),
                                   atol=2e-4, rtol=2e-3, err_msg=key)
    # parameters moved in both paths and track each other closely (step-1
    # Adam is ~lr*sign(g): allow a small multiple of lr for near-zero grads)
    n_r = jax.tree_util.tree_leaves(state_r.nerf_params)[0]
    n_f = jax.tree_util.tree_leaves(state_f.nerf_params)[0]
    n_0 = jax.tree_util.tree_leaves(state.nerf_params)[0]
    assert float(jnp.abs(n_r - n_0).max()) > 0
    lr = float(cfg.optimizer.lr)
    assert float(jnp.abs(n_f - n_r).max()) <= 2.5 * lr


@pytest.mark.slow
def test_stage2_fused_quad_noremat_matches_default():
    """`train_avatarHD.py --fused-quad` (use_pallas_mlp_quad: one custom_vjp
    spanning gather -> corner reduce -> field MLP, ops/pallas_mlp_quad.py)
    is loss-identical to the default XLA-field rematted dg_step — same
    state, batch and rng through both (interpret mode on CPU)."""
    from havatar_tpu.train import stage2

    cfg = tiny_cfg()
    cfg.models.StyleUnet.inp_size = 16
    cfg.models.StyleUnet.out_size = 64
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng, R=16 * 16, gen_size=64, render_size=16)
    example = {k: np.asarray(v) for k, v in batch.items()}
    models, state = stage2.init_state(cfg, rng, num_frames=2,
                                      example_batch=example)
    _, _, _, dg_ref = stage2.make_steps(cfg, *models)

    cfg_q = tiny_cfg()
    cfg_q.models.StyleUnet.inp_size = 16
    cfg_q.models.StyleUnet.out_size = 64
    cfg_q.models.use_pallas_mlp_quad = True
    models_q = stage2.build_models(cfg_q)
    _, _, _, dg_quad = stage2.make_steps(cfg_q, *models_q,
                                         remat_render=False)

    step_rng = jax.random.PRNGKey(3)
    state_r, m_ref = dg_ref(state, batch, step_rng)
    state_q, m_quad = dg_quad(state, batch, step_rng)

    for key in ("rgb_loss", "mask_loss", "nerf_loss", "g", "hr_l1", "d",
                "real_score", "fake_score"):
        np.testing.assert_allclose(float(m_quad[key]), float(m_ref[key]),
                                   atol=2e-4, rtol=2e-3, err_msg=key)
    n_r = jax.tree_util.tree_leaves(state_r.nerf_params)[0]
    n_q = jax.tree_util.tree_leaves(state_q.nerf_params)[0]
    n_0 = jax.tree_util.tree_leaves(state.nerf_params)[0]
    assert float(jnp.abs(n_r - n_0).max()) > 0
    lr = float(cfg.optimizer.lr)
    assert float(jnp.abs(n_q - n_r).max()) <= 2.5 * lr


@pytest.mark.slow
def test_stage2_quad_shard_map_matches_single_device():
    """Multi-chip fast-step training: make_steps(mesh=...) routes the NeRF
    render through shard_map over the ray axis so the Pallas kernels
    survive on a mesh (train/stage2.py; the training counterpart of the
    serving fix). With perturb=False / noise 0 the sharded dg step must be
    loss-identical to the single-device one — kernels in interpret mode on
    the 8-virtual-device CPU mesh."""
    from havatar_tpu.parallel import make_mesh
    from havatar_tpu.train import stage2

    def mk_cfg():
        cfg = tiny_cfg()
        cfg.models.StyleUnet.inp_size = 16
        cfg.models.StyleUnet.out_size = 64
        cfg.models.use_pallas_mlp_quad = True
        cfg.nerf.train.perturb = False
        cfg.nerf.train.radiance_field_noise_std = 0.0
        return cfg

    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng, R=16 * 16, gen_size=64, render_size=16)
    example = {k: np.asarray(v) for k, v in batch.items()}
    cfg = mk_cfg()
    models, state = stage2.init_state(cfg, rng, num_frames=2,
                                      example_batch=example)
    _, _, _, dg_single = stage2.make_steps(cfg, *models, remat_render=False)

    mesh = make_mesh(("data",))
    assert mesh.size == 8
    _, _, _, dg_mesh = stage2.make_steps(cfg, *models,
                                         remat_render=False, mesh=mesh)

    step_rng = jax.random.PRNGKey(3)
    state_s, m_s = dg_single(state, batch, step_rng)
    state_m, m_m = dg_mesh(state, batch, step_rng)

    # real/fake_score cover the replicated-D guard (the GSPMD auto
    # partitioner trigger — see stage2.make_steps docstring). The d_step
    # variant of this comparison lives in dryrun_multichip section 4:
    # running MORE 8-device programs in this process trips XLA's 40 s
    # collective-rendezvous termination on single-core CI hosts.
    for key in ("rgb_loss", "mask_loss", "nerf_loss", "g", "hr_l1", "d",
                "real_score", "fake_score"):
        np.testing.assert_allclose(float(m_m[key]), float(m_s[key]),
                                   atol=1e-5, rtol=1e-5, err_msg=key)
    for a, b in zip(jax.tree_util.tree_leaves(state_s.nerf_params),
                    jax.tree_util.tree_leaves(state_m.nerf_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_stage2_bf16_fast_step_runs():
    """The `--fused-mlp --bf16` CLI combination (bf16 NeRF compute +
    fused-MLP custom_vjp + no render remat — the fastest measured step,
    docs/PERF.md): runs, produces finite losses, and updates every
    parameter group."""
    from havatar_tpu.train import stage2

    cfg = tiny_cfg()
    cfg.models.StyleUnet.inp_size = 16
    cfg.models.StyleUnet.out_size = 64
    cfg.models.use_pallas_mlp = True
    cfg.models.compute_dtype = "bfloat16"
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng, R=16 * 16, gen_size=64, render_size=16)
    example = {k: np.asarray(v) for k, v in batch.items()}
    models, state = stage2.init_state(cfg, rng, num_frames=2,
                                      example_batch=example)
    _, _, _, dg_step = stage2.make_steps(cfg, *models, remat_render=False)

    state2, metrics = dg_step(state, batch, jax.random.PRNGKey(3))
    for key in ("d", "g", "nerf_loss", "hr_l1"):
        assert np.isfinite(float(metrics[key])), (key, metrics[key])
    for old, new in (
            (state.nerf_params, state2.nerf_params),
            (state.g_params, state2.g_params),
            (state.d_params, state2.d_params)):
        o = jax.tree_util.tree_leaves(old)[0]
        n = jax.tree_util.tree_leaves(new)[0]
        assert float(jnp.abs(n - o).max()) > 0


@pytest.mark.slow
def test_stage2_d_step_sharded_matches_single():
    """GSPMD-sharded d_step == single-device d_step (moved here from
    __graft_entry__.dryrun_multichip section 3, where the duplicate
    multi-minute XLA:CPU compile blew the driver's gate budget).

    The d_step LOSS depends on cross-device batch statistics — the
    minibatch-stddev groups (models/blocks.py, spec reference
    model/styleUnet.py:542-548) — so this is the one stage-2 comparison
    where a wrong cross-device reduction shows up in the loss itself.
    Runs on a 4-device sub-mesh with batch 4 (one frame per device): the
    stddev group (4) spans EVERY device, the maximal group-vs-batch
    cross-device interaction."""
    from havatar_tpu.parallel import make_mesh, batch_sharding, replicated
    from havatar_tpu.train import stage2

    mesh = make_mesh(("data",), devices=jax.devices()[:4])
    cfg = tiny_cfg()
    cfg.models.StyleUnet.inp_size = 16
    cfg.models.StyleUnet.out_size = 64
    cfg.gan.batch = 4
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng, B=4, R=16 * 16, gen_size=64, render_size=16)
    example = {k: np.asarray(v) for k, v in batch.items()}
    models, state = stage2.init_state(cfg, rng, num_frames=4,
                                      example_batch=example)
    d_step, _, _, _ = stage2.make_steps(cfg, *models)

    # single-device oracle
    st_ref, dm_ref = d_step(state, batch, jax.random.PRNGKey(11))

    batch_sh = {k: jax.device_put(v, batch_sharding(mesh))
                for k, v in batch.items()}
    st_sh = jax.device_put(state, replicated(mesh))
    st_sh, dm = d_step(st_sh, batch_sh, jax.random.PRNGKey(11))

    # the LOSS is the sensitive quantity (cross-device batch statistics);
    # post-Adam params can only be bounded by the step size, since Adam's
    # grad normalization amplifies reduction-order noise on tiny grads
    a, b = float(dm_ref["d"]), float(dm["d"])
    assert np.isfinite(a) and abs(a - b) <= 1e-4 * max(1.0, abs(a)), (a, b)
    lr_d = float(cfg.gan.lr)
    for ref_leaf, sh_leaf in zip(
            jax.tree_util.tree_leaves(st_ref.d_params),
            jax.tree_util.tree_leaves(st_sh.d_params)):
        np.testing.assert_allclose(np.asarray(ref_leaf), np.asarray(sh_leaf),
                                   atol=2.5 * lr_d, rtol=0)


@pytest.mark.slow
def test_stage2_r1_g_sharded_and_ema():
    """GSPMD-sharded r1/g steps + the EMA identity (moved here from
    __graft_entry__.dryrun_multichip section 3, where the extra multi-minute
    XLA:CPU compiles blew the driver's gate budget — MULTICHIP_r03.json).

    Runs on a 4-device sub-mesh (8 GSPMD device threads starve the 1-core
    host's collective rendezvous; see the dryrun section-3 comment): r1's
    double-backward and g's NeRF+SR+D chain execute batch-sharded, and the
    EMA update must satisfy ema' = a*ema + (1-a)*g' exactly."""
    from havatar_tpu.parallel import make_mesh, batch_sharding, replicated
    from havatar_tpu.train import stage2

    mesh = make_mesh(("data",), devices=jax.devices()[:4])
    cfg = tiny_cfg()
    cfg.models.StyleUnet.inp_size = 16
    cfg.models.StyleUnet.out_size = 64
    cfg.gan.batch = 4
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng, B=4, R=16 * 16, gen_size=64, render_size=16)
    example = {k: np.asarray(v) for k, v in batch.items()}
    models, state = stage2.init_state(cfg, rng, num_frames=4,
                                      example_batch=example)
    _, r1_step, g_step, _ = stage2.make_steps(cfg, *models)

    bsh = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    state = jax.device_put(state, replicated(mesh))

    state, rm = r1_step(state, batch_sh)
    assert np.isfinite(float(rm["r1"])), rm

    g_ema_before = jax.tree_util.tree_map(np.asarray, state.g_ema_params)
    state, gm = g_step(state, batch_sh, jax.random.PRNGKey(12))
    for name in ("g", "nerf_loss", "hr_l1"):
        assert np.isfinite(float(gm[name])), (name, gm[name])
    # EMA identity on the sharded result: ema' = a*ema + (1-a)*g'
    accum = 0.5 ** (32.0 / (10 * 1000))
    for e, g, p in zip(jax.tree_util.tree_leaves(state.g_ema_params),
                       jax.tree_util.tree_leaves(state.g_params),
                       jax.tree_util.tree_leaves(g_ema_before)):
        np.testing.assert_allclose(
            np.asarray(e), accum * p + (1 - accum) * np.asarray(g),
            atol=1e-5, rtol=1e-4)
