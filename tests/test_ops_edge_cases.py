"""Edge-case coverage for the ops layer."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from havatar_tpu import ops


def test_upfirdn2d_rectangular_kernel_and_asymmetric_updown():
    from tests.torch_oracle import upfirdn2d_np

    rng = np.random.RandomState(0)
    x = rng.randn(1, 2, 9, 11).astype(np.float32)
    k = rng.randn(2, 4).astype(np.float32)   # rectangular taps
    want = upfirdn2d_np(x.astype(np.float64), k.astype(np.float64),
                        up=(2, 1), down=(1, 2), pad=(1, 2, 2, 1))
    got = ops.upfirdn2d(
        jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(k),
        up=(2, 1), down=(1, 2), pad=(1, 2, 2, 1))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_posenc_alpha_window_matches_reference_formula():
    """Cosine-easing window (spec: model/network/embedder.py:52-55)."""
    x = np.array([[0.4, -0.1, 0.9]], np.float32)
    F_ = 6
    alpha = jnp.asarray(3.3)
    got = np.asarray(ops.positional_encoding(jnp.asarray(x), F_, alpha=alpha))

    freqs = 2.0 ** np.linspace(0, F_ - 1, F_)
    win = np.clip(3.3 - freqs, 0.0, 1.0)
    win = 0.5 * (1 + np.cos(np.pi * win + np.pi))
    want = []
    for f, w in zip(freqs, win):
        want.append(w * np.sin(x[0] * f))
        want.append(w * np.sin(x[0] * f + np.pi / 2))
    np.testing.assert_allclose(got[0], np.concatenate(want), rtol=1e-4,
                               atol=1e-5)


def test_volume_render_noise_reproducible_and_nonzero():
    rng = np.random.RandomState(1)
    rf = jnp.asarray(rng.randn(4, 6, 5).astype(np.float32))
    z = jnp.asarray(np.sort(rng.rand(4, 6), -1).astype(np.float32) + 1)
    rd = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    a1 = ops.volume_render_radiance_field(rf, z, rd,
                                          radiance_field_noise_std=0.5,
                                          noise_rng=key)[0]
    a2 = ops.volume_render_radiance_field(rf, z, rd,
                                          radiance_field_noise_std=0.5,
                                          noise_rng=key)[0]
    b = ops.volume_render_radiance_field(rf, z, rd)[0]
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    assert np.abs(np.asarray(a1) - np.asarray(b)).max() > 0


def test_grid_sample_exact_at_corners_and_centers():
    """align_corners=True: coords ±1 hit texel [0]/[size-1] exactly."""
    feat = jnp.arange(12.0).reshape(1, 3, 4, 1)
    coords = jnp.asarray([[[-1.0, -1.0], [1.0, 1.0], [1.0, -1.0]]])
    out = np.asarray(ops.grid_sample_2d(feat, coords, "border"))[0, :, 0]
    np.testing.assert_allclose(out, [0.0, 11.0, 3.0], atol=1e-6)


def test_sample_pdf_stratified_sorted_and_in_range():
    rng = jax.random.PRNGKey(3)
    bins = jnp.asarray(np.sort(np.random.RandomState(0).rand(5, 9), -1)
                       .astype(np.float32))
    w = jnp.asarray(np.random.RandomState(1).rand(5, 8).astype(np.float32))
    s = np.asarray(ops.sample_pdf(bins, w, 6, det=False, rng=rng))
    assert np.all(np.diff(s, axis=-1) >= -1e-6)   # stratified u => sorted
    assert np.all(s >= np.asarray(bins[:, :1]) - 1e-6)
    assert np.all(s <= np.asarray(bins[:, -1:]) + 1e-6)


def test_haar_orthonormality():
    """DWT preserves energy (orthonormal filter bank)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    fwd = ops.haar_transform(x)
    np.testing.assert_allclose(float(jnp.sum(x**2)), float(jnp.sum(fwd**2)),
                               rtol=1e-5)
