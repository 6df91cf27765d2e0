"""LPIPS numeric parity.

The reference applies the ``lpips`` pip package (train_avatar.py:24-29,
train_avatarHD.py:262-266). That package is not installed here, so the
primary oracle is a plain-torch transcription of its documented math
(scaling layer -> VGG16 relu features -> unit-normalize -> squared diff ->
1x1 lin heads -> spatial mean, summed over layers) executed on a synthetic
torchvision-layout VGG16 state_dict — this pins convert_torch_lpips and the
JAX forward end to end. A second test runs against the real ``lpips``
package when available (skips otherwise).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from havatar_tpu.train import lpips_jax as L

_VGG_CONV_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]


def _synthetic_vgg_state(seed=0):
    torch.manual_seed(seed)
    sd = {}
    in_ch = 3
    plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
    for block, (out_ch, n) in zip(_VGG_CONV_IDX, plan):
        for layer in block:
            sd[f"features.{layer}.weight"] = torch.randn(
                out_ch, in_ch, 3, 3) * (1.0 / (3 * np.sqrt(in_ch)))
            sd[f"features.{layer}.bias"] = torch.randn(out_ch) * 0.05
            in_ch = out_ch
    lin = {}
    for bi, (out_ch, _) in enumerate(plan):
        lin[f"lin{bi}.model.1.weight"] = torch.rand(1, out_ch, 1, 1) * 0.02
    return sd, lin


def _torch_lpips(sd, lin, x0, x1):
    """Transcription of the lpips package's forward (spatial=False,
    normalize=False: inputs already in [-1, 1])."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        out = []
        for bi, block in enumerate(_VGG_CONV_IDX):
            for layer in block:
                h = F.conv2d(h, sd[f"features.{layer}.weight"],
                             sd[f"features.{layer}.bias"], padding=1)
                h = F.relu(h)
            out.append(h)
            if bi < len(_VGG_CONV_IDX) - 1:
                h = F.max_pool2d(h, 2, 2)
        return out

    f0, f1 = feats(x0), feats(x1)
    total = 0.0
    for bi, (a, b) in enumerate(zip(f0, f1)):
        a = a / torch.sqrt((a ** 2).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b ** 2).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        d = F.conv2d(d, lin[f"lin{bi}.model.1.weight"])
        total = total + d.mean(dim=(2, 3)).squeeze(1)
    return total.mean()


def test_lpips_matches_torch_transcription():
    sd, lin = _synthetic_vgg_state()
    torch.manual_seed(1)
    x0 = torch.rand(2, 3, 32, 32) * 2 - 1
    x1 = torch.rand(2, 3, 32, 32) * 2 - 1
    with torch.no_grad():
        want = float(_torch_lpips(sd, lin, x0, x1))

    params = L.convert_torch_lpips(sd, lin)
    got = float(L.lpips(params,
                        jnp.asarray(x0.numpy().transpose(0, 2, 3, 1)),
                        jnp.asarray(x1.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_lpips_loss_scales_01_inputs():
    sd, lin = _synthetic_vgg_state()
    params = L.convert_torch_lpips(sd, lin)
    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    a = float(L.lpips_loss(params, jnp.asarray(x), jnp.asarray(x)))
    assert a < 1e-8  # identical images -> zero distance
    b = float(L.lpips_loss(params, jnp.asarray(x),
                           jnp.asarray(1.0 - x)))
    assert b > a


def test_lpips_weight_file_roundtrip(tmp_path):
    """The full import path the trainers use: convert_torch_lpips ->
    save_lpips_file -> load_lpips_file -> lpips_loss. After this, the only
    unexercised step is the real-weight download itself."""
    sd, lin = _synthetic_vgg_state()
    params = L.convert_torch_lpips(sd, lin)
    path = str(tmp_path / "lpips_vgg.npz")
    L.save_lpips_file(params, path)
    loaded = L.load_lpips_file(path)
    assert loaded is not None
    x = np.random.RandomState(1).rand(1, 16, 16, 3).astype(np.float32)
    y = np.random.RandomState(2).rand(1, 16, 16, 3).astype(np.float32)
    a = float(L.lpips_loss(params, jnp.asarray(x), jnp.asarray(y)))
    b = float(L.lpips_loss(loaded, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # absent file -> None (the trainers gate the perceptual term on this)
    assert L.load_lpips_file(str(tmp_path / "missing.npz")) is None


def test_lpips_matches_real_package():
    lpips_pkg = pytest.importorskip("lpips")
    ref = lpips_pkg.LPIPS(net="vgg", spatial=False)
    torch.manual_seed(2)
    x0 = torch.rand(1, 3, 64, 64) * 2 - 1
    x1 = torch.rand(1, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        want = float(ref(x0, x1).mean())

    # lpips stores the torchvision features modules under sliceK with their
    # ORIGINAL feature indices as module names -> remap to features.N.*
    vgg_sd = {}
    for k, v in ref.net.state_dict().items():
        if k.startswith("slice"):
            _, idx_name = k.split(".", 1)
            vgg_sd[f"features.{idx_name}"] = v
    params = L.convert_torch_lpips(vgg_sd, ref.state_dict())
    got = float(L.lpips(params,
                        jnp.asarray(x0.numpy().transpose(0, 2, 3, 1)),
                        jnp.asarray(x1.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
