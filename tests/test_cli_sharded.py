"""End-to-end sharded CLI smoke tests on virtual CPU devices.

Drives the production training CLIs as real subprocesses with a forced
multi-device CPU platform and a synthetic on-disk dataset, covering both
sharding modes of parallel.auto_batch_shardings:

* frame-axis data parallel (batch % n_devices == 0) — at the REFERENCE
  operating point (batch 2, train_avatar.py:62) on 2 devices;
* ray-axis sharding when frames don't divide (batch 1 on 2 devices).

This is the guarantee that `python -m havatar_tpu.cli.train_avatar` on a
real v5e-8 uses all chips (the reference's DataParallel scaffolding,
dataloader/dist_util.py:6-133, made real). 2 virtual devices, not 8: the
CI host has ONE core, and every XLA collective spin-waits for all device
threads — an 8-device CLI run took ~19 min; 2 devices exercise the same
code paths (mesh build, per-key shardings, replicated state, compiler
collectives) at tolerable cost.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from tests.make_synthetic_dataset import make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(REPO, "tests", "configs", "tiny.yml")
TINY_HD = os.path.join(REPO, "tests", "configs", "tiny_hd.yml")


def _run_cli(module, argv, cwd, n_devices=2):
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={n_devices}"])
    env["JAX_PLATFORMS"] = "cpu"
    env["HAVATAR_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, "-m", module] + argv,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1500)
    assert res.returncode == 0, (res.stdout[-4000:], res.stderr[-4000:])
    return res.stdout


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_dataset(str(root), num_frames=4, img_res=16, cond_res=64)
    return str(root)


def test_train_avatar_cli_frame_dp(synth_root, tmp_path):
    """reference batch 2 over 2 devices -> frame-axis data parallel."""
    out = _run_cli("havatar_tpu.cli.train_avatar", [
        "--datadir", synth_root, "--logdir", str(tmp_path / "log"),
        "--config", TINY, "--max-iters", "2", "--pretrain-iters", "0",
        "--batch-size", "2"], cwd=REPO)
    assert "data mesh: 2 devices" in out
    assert "'mv_rays'" in out and "'dataset_idx'" in out
    assert "Iter: 1" in out


@pytest.mark.slow
def test_train_avatar_cli_ray_sharded(synth_root, tmp_path):
    """batch 1 doesn't divide 2 devices -> the RAY axis is sharded."""
    out = _run_cli("havatar_tpu.cli.train_avatar", [
        "--datadir", synth_root, "--logdir", str(tmp_path / "log"),
        "--config", TINY, "--max-iters", "2", "--pretrain-iters", "0",
        "--batch-size", "1"], cwd=REPO)
    assert "data mesh: 2 devices" in out
    assert "'mv_rays'" in out          # rays sharded
    assert "'dataset_idx'" not in out  # frame-keyed tensors replicated
    assert "Iter: 1" in out


@pytest.mark.slow
def test_train_avatarHD_cli_sharded(tmp_path):
    # stage-2 geometry: down_sample*img_res == inp_size, img_res == out_size
    root = str(tmp_path / "synth64")
    make_dataset(root, num_frames=4, img_res=64, cond_res=64)
    out = _run_cli("havatar_tpu.cli.train_avatarHD", [
        "--datadir", root, "--logdir", str(tmp_path / "log"),
        "--config", TINY_HD, "--max-iters", "2"], cwd=REPO)
    assert "data mesh: 2 devices" in out
    assert "iter 1" in out

@pytest.mark.slow
def test_train_avatarHD_warm_start_from_stage1_orbax(tmp_path):
    """The reference's default --ckpt semantics (train_avatarHD.py:137-159):
    a STAGE-1 checkpoint warm-starts the NeRF side of a fresh stage-2 run.
    Regression for the round-5 e2e find: the orbax branch restored with a
    Stage2State template, so every stage-1 orbax dir failed with
    all-params-MISSING (only torch .pt stage-1 files worked)."""
    root = str(tmp_path / "synth64")
    make_dataset(root, num_frames=4, img_res=64, cond_res=64)
    _run_cli("havatar_tpu.cli.train_avatar", [
        "--datadir", root, "--logdir", str(tmp_path / "l1"),
        "--config", TINY_HD, "--max-iters", "1", "--pretrain-iters", "0",
        "--batch-size", "2"], cwd=REPO)
    ckpt = str(tmp_path / "l1" / "checkpoints")
    assert os.listdir(ckpt), "stage-1 saved no checkpoint"
    out = _run_cli("havatar_tpu.cli.train_avatarHD", [
        "--datadir", root, "--logdir", str(tmp_path / "l2"),
        "--config", TINY_HD, "--ckpt", ckpt, "--max-iters", "2"], cwd=REPO)
    assert "iter 1" in out
    # and a stage-2 dir without --continue-training fails with guidance
    env_ckpt = str(tmp_path / "l2" / "checkpoints")
    res = subprocess.run(
        [sys.executable, "-m", "havatar_tpu.cli.train_avatarHD",
         "--datadir", root, "--logdir", str(tmp_path / "l3"),
         "--config", TINY_HD, "--ckpt", env_ckpt, "--max-iters", "1"],
        cwd=REPO, env=dict(os.environ, JAX_PLATFORMS="cpu",
                           HAVATAR_PLATFORM="cpu",
                           PYTHONPATH=REPO + os.pathsep + os.environ.get(
                               "PYTHONPATH", "")),
        capture_output=True, text=True, timeout=1500)
    assert res.returncode != 0
    assert "--continue-training" in res.stdout + res.stderr


@pytest.mark.slow
def test_cli_resume_paths(tmp_path):
    """Stage-1 --ckpt (resume) and stage-2 --continue-training (resume)
    restore their own orbax checkpoints — the template-matched siblings of
    the warm-start path above, driven as real subprocesses."""
    root = str(tmp_path / "synth64")
    make_dataset(root, num_frames=4, img_res=64, cond_res=64)
    _run_cli("havatar_tpu.cli.train_avatar", [
        "--datadir", root, "--logdir", str(tmp_path / "l1"),
        "--config", TINY_HD, "--max-iters", "1", "--pretrain-iters", "0",
        "--batch-size", "2"], cwd=REPO)
    ckpt1 = str(tmp_path / "l1" / "checkpoints")
    out = _run_cli("havatar_tpu.cli.train_avatar", [
        "--datadir", root, "--logdir", str(tmp_path / "l1b"),
        "--config", TINY_HD, "--max-iters", "3", "--pretrain-iters", "0",
        "--batch-size", "2", "--ckpt", ckpt1], cwd=REPO)
    # resumed past the restored step, not from scratch
    assert "Iter: 2" in out

    _run_cli("havatar_tpu.cli.train_avatarHD", [
        "--datadir", root, "--logdir", str(tmp_path / "l2"),
        "--config", TINY_HD, "--ckpt", ckpt1, "--max-iters", "1"], cwd=REPO)
    out = _run_cli("havatar_tpu.cli.train_avatarHD", [
        "--datadir", root, "--logdir", str(tmp_path / "l2b"),
        "--config", TINY_HD, "--ckpt", str(tmp_path / "l2" / "checkpoints"),
        "--continue-training", "--max-iters", "3"], cwd=REPO)
    assert "iter 2" in out
