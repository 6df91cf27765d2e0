"""Background matting backends.

The reference uses Robust Video Matting via a TorchScript download
(data_preprocessing/fit_video.py:640-659). That model is an external asset,
so matting is pluggable:

* ``JaxRVMBackend`` — the RVM architecture rebuilt in JAX
  (preprocess/rvm.py); given converted weights, matting runs with no torch
  at inference time (torch is only needed once to read the .pth).
* ``RVMTorchBackend`` — runs an ``rvm_mobilenetv3_fp32.torchscript`` file
  with CPU torch if the user supplies it (exact reference parity).
* ``PrecomputedBackend`` — uses existing mask PNGs.
* ``ThresholdBackend`` — trivial luminance/chroma threshold fallback for
  controlled capture setups.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np


class MattingBackend:
    def reset(self) -> None:
        pass

    def alpha(self, frame_rgb: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 -> [H, W] float alpha in [0, 1]."""
        raise NotImplementedError


class RVMTorchBackend(MattingBackend):
    """Recurrent matting, frame-serial with carried hidden state
    (spec: fit_video.py:640-659)."""

    def __init__(self, torchscript_path: str, downsample_ratio: float = 0.25):
        import torch

        self.model = torch.jit.load(torchscript_path, map_location="cpu").eval()
        self.downsample_ratio = downsample_ratio
        self.rec = [None] * 4

    def reset(self) -> None:
        self.rec = [None] * 4

    def alpha(self, frame_rgb: np.ndarray) -> np.ndarray:
        import torch

        src = torch.from_numpy(frame_rgb).permute(2, 0, 1)[None].float() / 255.0
        with torch.no_grad():
            fgr, pha, *self.rec = self.model(src, *self.rec,
                                             self.downsample_ratio)
        return pha[0, 0].numpy()


class JaxRVMBackend(MattingBackend):
    """Recurrent RVM matting via the JAX rebuild (preprocess/rvm.py), with
    the same frame-serial carried state as the reference (fit_video.py:
    640-659). ``weights`` may be a converted pytree or a path to the official
    rvm_mobilenetv3 .pth/.torchscript file."""

    def __init__(self, weights, downsample_ratio: float = 0.25):
        import jax

        from havatar_tpu.preprocess import rvm

        self._rvm = rvm
        if isinstance(weights, str):
            weights = rvm.load_rvm_weights(weights)
        self.params = weights
        self.downsample_ratio = downsample_ratio
        self.rec = (None,) * 4
        self._fwd = jax.jit(
            lambda p, s, rec: rvm.rvm_forward(
                p, s, rec, downsample_ratio=downsample_ratio))
        self._fwd_first = jax.jit(
            lambda p, s: rvm.rvm_forward(
                p, s, (None,) * 4, downsample_ratio=downsample_ratio))

    def reset(self) -> None:
        self.rec = (None,) * 4

    def alpha(self, frame_rgb: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        src = jnp.asarray(frame_rgb, jnp.float32)[None] / 255.0
        if self.rec[0] is None:
            fgr, pha, self.rec = self._fwd_first(self.params, src)
        else:
            fgr, pha, self.rec = self._fwd(self.params, src, self.rec)
        return np.asarray(pha[0, :, :, 0])


class PrecomputedBackend(MattingBackend):
    def __init__(self, mask_dir: str):
        self.mask_dir = mask_dir
        self._current: Optional[str] = None

    def set_frame(self, name: str) -> None:
        self._current = name

    def alpha(self, frame_rgb: np.ndarray) -> np.ndarray:
        import cv2

        path = os.path.join(self.mask_dir, f"{self._current}.png")
        m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        return m.astype(np.float32) / 255.0


class ThresholdBackend(MattingBackend):
    """Chroma-distance threshold vs a reference background frame."""

    def __init__(self, bg_rgb: np.ndarray, thresh: float = 30.0):
        self.bg = bg_rgb.astype(np.float32)
        self.thresh = thresh

    def alpha(self, frame_rgb: np.ndarray) -> np.ndarray:
        d = np.linalg.norm(frame_rgb.astype(np.float32) - self.bg, axis=-1)
        return (d > self.thresh).astype(np.float32)
