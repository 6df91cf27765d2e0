"""Import the reference PyTorch implementation (read-only, CPU) as a test
oracle.

The reference's ``model/op`` package loads CUDA extensions at import time; we
inject CPU substitutes built from the op's mathematical definition (an
independent numpy formulation, below) so the reference model code imports and
runs on CPU-only torch. Nothing from the reference is copied into the
framework — it is only *executed* here to produce golden values.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


def upfirdn2d_np(x: np.ndarray, kernel: np.ndarray, up=(1, 1), down=(1, 1),
                 pad=(0, 0, 0, 0)) -> np.ndarray:
    """Independent definition of upsample-FIR-downsample for [B, C, H, W].

    Steps, from the op's mathematical definition: insert (up-1) zeros after
    every sample, pad (negative pad crops), convolve with the kernel
    (i.e. correlate with the flipped kernel), keep every ``down``-th sample.
    """
    up_x, up_y = up
    down_x, down_y = down
    pad_x0, pad_x1, pad_y0, pad_y1 = pad
    B, C, H, W = x.shape
    kh, kw = kernel.shape

    stuffed = np.zeros((B, C, H * up_y, W * up_x), dtype=x.dtype)
    stuffed[:, :, ::up_y, ::up_x] = x

    padded = np.pad(stuffed, ((0, 0), (0, 0),
                              (max(pad_y0, 0), max(pad_y1, 0)),
                              (max(pad_x0, 0), max(pad_x1, 0))))
    y_lo, x_lo = max(-pad_y0, 0), max(-pad_x0, 0)
    y_hi = padded.shape[2] - max(-pad_y1, 0)
    x_hi = padded.shape[3] - max(-pad_x1, 0)
    padded = padded[:, :, y_lo:y_hi, x_lo:x_hi]

    out_h = padded.shape[2] - kh + 1
    out_w = padded.shape[3] - kw + 1
    kf = kernel[::-1, ::-1]
    out = np.zeros((B, C, out_h, out_w), dtype=np.float64)
    for a in range(kh):
        for b in range(kw):
            out += kf[a, b] * padded[:, :, a:a + out_h, b:b + out_w]
    return out[:, :, ::down_y, ::down_x].astype(x.dtype)


def ref_upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """torch wrapper around :func:`upfirdn2d_np` matching the reference's
    public signature (model/op/upfirdn2d.py:153-169)."""
    if not isinstance(up, (tuple, list)):
        up = (up, up)
    if not isinstance(down, (tuple, list)):
        down = (down, down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    out = upfirdn2d_np(x.detach().numpy().astype(np.float64),
                       kernel.detach().numpy().astype(np.float64),
                       tuple(up), tuple(down), tuple(pad))
    return torch.from_numpy(out.astype(np.float32))


def ref_fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    if bias is not None:
        rest = [1] * (x.ndim - bias.ndim - 1)
        x = x + bias.view(1, bias.shape[0], *rest)
    return F.leaky_relu(x, negative_slope=negative_slope) * scale


class _RefFusedLeakyReLU(torch.nn.Module):
    def __init__(self, channel, bias=True, negative_slope=0.2, scale=2 ** 0.5):
        super().__init__()
        self.bias = torch.nn.Parameter(torch.zeros(channel)) if bias else None
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return ref_fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)


class _Conv2dGradFix(types.ModuleType):
    @staticmethod
    def conv2d(input, weight, bias=None, stride=1, padding=0, dilation=1, groups=1):
        return F.conv2d(input, weight, bias, stride, padding, dilation, groups)

    @staticmethod
    def conv_transpose2d(input, weight, bias=None, stride=1, padding=0,
                         output_padding=0, groups=1, dilation=1):
        return F.conv_transpose2d(input, weight, bias, stride, padding,
                                  output_padding, groups, dilation)

    class no_weight_gradients:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False


_installed = False


def install():
    """Make ``import model.styleUnet`` etc. resolve against /root/reference."""
    global _installed
    if _installed:
        return
    op_mod = types.ModuleType("model.op")
    op_mod.upfirdn2d = ref_upfirdn2d
    op_mod.fused_leaky_relu = ref_fused_leaky_relu
    op_mod.FusedLeakyReLU = _RefFusedLeakyReLU
    op_mod.conv2d_gradfix = _Conv2dGradFix("model.op.conv2d_gradfix")

    model_pkg = types.ModuleType("model")
    model_pkg.__path__ = [f"{REFERENCE_ROOT}/model"]
    sys.modules.setdefault("model", model_pkg)
    sys.modules["model.op"] = op_mod

    # utils/training_util.py imports torchvision (only used for image
    # casting in the training loops, not by the model forward) — stub it
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.ToPILImage = object
        tv.utils = types.ModuleType("torchvision.utils")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.utils"] = tv.utils
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # The reference hardcodes .cuda()/.to('cuda') in module constructors
    # (e.g. model/styleUnet.py:748, model/network/embedder.py:29); torch here
    # is CPU-only, so route those to CPU for oracle execution.
    _orig_to = torch.Tensor.to

    def _to_cpu(self, *args, **kwargs):
        args = tuple(
            "cpu" if (isinstance(a, (str, torch.device)) and "cuda" in str(a))
            else a for a in args
        )
        if "device" in kwargs and kwargs["device"] is not None and \
                "cuda" in str(kwargs["device"]):
            kwargs["device"] = "cpu"
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to_cpu
    torch.Tensor.cuda = lambda self, *a, **k: self
    _installed = True
