"""Checkpoint semantics: orbax save -> restore round trip on real train
states, and latest-step auto-restore (the preemption-resume contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from havatar_tpu.checkpoints import CheckpointManager
from havatar_tpu.train import stage1
from tests.test_train_steps import tiny_batch, tiny_cfg


@pytest.mark.slow
def test_stage1_state_roundtrip(tmp_path):
    cfg = tiny_cfg()
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch(rng)
    example = {k: np.asarray(v) for k, v in batch.items()}
    model, state = stage1.init_state(cfg, rng, num_frames=2,
                                     example_batch=example)
    step = stage1.make_train_step(model, cfg)
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpts"), save_interval_steps=1)
    assert mgr.save(1, state._asdict(), force=True)
    mgr.wait()
    assert mgr.latest_step() == 1

    restored = CheckpointManager(str(tmp_path / "ckpts")).restore(
        template=state._asdict())
    restored = stage1.TrainState(**restored)

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.latent_codes),
                                  np.asarray(restored.latent_codes))
    assert int(restored.step) == int(state.step)

    # training continues from the restored state
    state2, metrics = step(restored, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_audio_animation_smoke(tmp_path):
    """audio-driven condition generation end to end with a tiny 3DMM."""
    import os

    from havatar_tpu.preprocess import faceverse as fv
    from havatar_tpu.preprocess.animation import audio_animation

    rng = np.random.RandomState(0)
    V = 40
    model = fv.FaceVerseModel(
        meanshape=jnp.asarray(rng.randn(1, 3 * V).astype(np.float32) * 0.3),
        meantex=jnp.asarray(np.abs(rng.randn(1, 3 * V)).astype(np.float32) * 100),
        id_base=jnp.asarray(rng.randn(3 * V, 150).astype(np.float32) * 0.01),
        exp_base=jnp.asarray(rng.randn(3 * V, 171).astype(np.float32) * 0.01),
        tex_base=jnp.asarray(rng.randn(3 * V, 251).astype(np.float32) * 0.01),
        tri=jnp.asarray(rng.randint(0, V, (30, 3)).astype(np.int32)),
        point_buf=jnp.zeros((V, 4), jnp.int32),
        kp_inds=jnp.asarray((np.arange(478) % V).astype(np.int32)),
        ver_inds=(V - 20, V - 10, V))

    avatar_dir = tmp_path / "avatar" / "10"
    avatar_dir.mkdir(parents=True)
    coeffs = np.zeros(150 + 171 + 251 + 38, np.float32)
    coeffs[-1] = 1.0
    np.save(str(avatar_dir / "coeffs.npy"), coeffs)

    audio = rng.randn(2, 171).astype(np.float32) * 0.01
    audio_path = tmp_path / "exp_seq.npy"
    np.save(str(audio_path), audio)

    n = audio_animation(model, str(audio_path), str(avatar_dir),
                        savedir=str(tmp_path / "drive"))
    assert n == 2
    out0 = tmp_path / "drive" / "0"
    for view in ("front", "left", "right"):
        assert (out0 / f"ortho_{view}_render_256_baseGama.png").exists()
        assert (out0 / f"ortho_{view}_normal_256_baseGama.png").exists()
