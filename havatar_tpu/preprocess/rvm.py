"""Robust Video Matting (MobileNetV3-Large variant) in JAX, NHWC.

The reference pipeline runs RVM as a downloaded TorchScript blob for
background matting (``Bg_Matting``, reference data_preprocessing/
fit_video.py:640-659: ``model(src, *rec, downsample_ratio)`` on a frame
stream, keeping the 4 recurrent states across frames). This module rebuilds
the published RVM architecture (Lin et al., "Robust High-Resolution Video
Matting with Temporal Guidance", WACV 2022; github.com/PeterL1n/
RobustVideoMatting) so that — given converted weights — matting needs no
torch at runtime:

* MobileNetV3-Large encoder (torchvision layout, output stride 16 via
  dilation in the last stage) -> features at strides 2/4/8/16;
* LR-ASPP head (960 -> 128);
* recurrent decoder: ConvGRU-gated bottleneck + 3 upsampling blocks + output
  block, each consuming the avg-pooled source at its scale;
* matting projection (16 -> fgr residual 3 + pha 1);
* deep-guided-filter refiner for downsample_ratio < 1 (LR solve, HR apply).

``convert_torch_rvm`` maps the official ``rvm_mobilenetv3.pth`` state_dict
(BN folded into convs). The structure is validated against an in-repo torch
replica (tests/test_rvm.py); loading the official file itself needs the
downloaded asset, exactly as the reference does.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# primitives (NHWC)
# ---------------------------------------------------------------------------

def hard_swish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def conv2d(x, w, b=None, stride=1, groups=1, dilation=1):
    """x [B,H,W,Cin], w [kh,kw,Cin/groups,Cout]; SAME-style torch padding."""
    kh, kw = w.shape[:2]
    ph = ((kh - 1) // 2) * dilation
    pw = ((kw - 1) // 2) * dilation
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    return out


def avg_pool2(x):
    """AvgPool2d(2, 2, ceil_mode=True, count_include_pad=False)."""
    B, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                              "VALID")
    # count_include_pad=False: divide by the number of REAL pixels per window
    ones = jnp.ones((B, H, W, 1), x.dtype)
    if ph or pw:
        ones = jnp.pad(ones, ((0, 0), (0, ph), (0, pw), (0, 0)))
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    return s / c


def resize_bilinear(x, size: Tuple[int, int]):
    """F.interpolate(mode='bilinear', align_corners=False) — torch does NOT
    antialias on downscale, so antialias must be off here too."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear",
                            antialias=False)


# ---------------------------------------------------------------------------
# MobileNetV3-Large table (torchvision inverted-residual config)
# ---------------------------------------------------------------------------
# (kernel, exp, out, use_se, activation, stride, dilation)
MBV3_LARGE = [
    (3, 16, 16, False, "RE", 1, 1),
    (3, 64, 24, False, "RE", 2, 1),
    (3, 72, 24, False, "RE", 1, 1),
    (5, 72, 40, True, "RE", 2, 1),
    (5, 120, 40, True, "RE", 1, 1),
    (5, 120, 40, True, "RE", 1, 1),
    (3, 240, 80, False, "HS", 2, 1),
    (3, 200, 80, False, "HS", 1, 1),
    (3, 184, 80, False, "HS", 1, 1),
    (3, 184, 80, False, "HS", 1, 1),
    (3, 480, 112, True, "HS", 1, 1),
    (3, 672, 112, True, "HS", 1, 1),
    # RVM: output stride 16 -> last stage stride 1 with dilation 2
    (5, 672, 160, True, "HS", 1, 2),
    (5, 960, 160, True, "HS", 1, 2),
    (5, 960, 160, True, "HS", 1, 2),
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _act(name):
    return hard_swish if name == "HS" else jax.nn.relu


def _inverted_residual(x, p, spec):
    k, exp, out, use_se, act_name, stride, dil = spec
    act = _act(act_name)
    cin = x.shape[-1]
    h = x
    if "expand" in p:
        h = act(conv2d(h, p["expand"]["w"], p["expand"]["b"]))
    h = act(conv2d(h, p["dw"]["w"], p["dw"]["b"], stride=stride,
                   groups=h.shape[-1], dilation=dil))
    if use_se:
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = jax.nn.relu(conv2d(s, p["se_fc1"]["w"], p["se_fc1"]["b"]))
        s = hard_sigmoid(conv2d(s, p["se_fc2"]["w"], p["se_fc2"]["b"]))
        h = h * s
    h = conv2d(h, p["project"]["w"], p["project"]["b"])
    if stride == 1 and cin == out:
        h = h + x
    return h


def encoder_forward(params, x):
    """normalized [B,H,W,3] -> (f1 s2 16ch, f2 s4 24ch, f3 s8 40ch,
    f4 s16 960ch)."""
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    h = hard_swish(conv2d(x, params["stem"]["w"], params["stem"]["b"],
                          stride=2))
    feats = {}
    for i, spec in enumerate(MBV3_LARGE):
        h = _inverted_residual(h, params["blocks"][i], spec)
        if i == 0:
            feats["f1"] = h
        elif i == 2:
            feats["f2"] = h
        elif i == 5:
            feats["f3"] = h
    h = hard_swish(conv2d(h, params["head"]["w"], params["head"]["b"]))
    feats["f4"] = h
    return feats["f1"], feats["f2"], feats["f3"], feats["f4"]


def lraspp_forward(p, x):
    a = jax.nn.relu(conv2d(x, p["aspp1"]["w"], p["aspp1"]["b"]))
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = jax.nn.sigmoid(conv2d(s, p["aspp2"]["w"], p["aspp2"]["b"]))
    return a * s


def conv_gru(p, x, h):
    """RVM ConvGRU: r,z = sigmoid(conv(cat(x,h))); c = tanh(conv(cat(x,r*h)));
    h' = (1-z)*h + z*c."""
    if h is None:
        h = jnp.zeros_like(x)
    rz = jax.nn.sigmoid(conv2d(jnp.concatenate([x, h], -1),
                               p["ih"]["w"], p["ih"]["b"]))
    C = x.shape[-1]
    r, z = rz[..., :C], rz[..., C:]
    c = jnp.tanh(conv2d(jnp.concatenate([x, r * h], -1),
                        p["hh"]["w"], p["hh"]["b"]))
    h = (1.0 - z) * h + z * c
    return h, h


def _gru_half(p, x, r):
    """Split channels in half, GRU the second half (RVM Bottleneck/Upsampling
    blocks)."""
    C = x.shape[-1] // 2
    a, b = x[..., :C], x[..., C:]
    b, r = conv_gru(p, b, r)
    return jnp.concatenate([a, b], -1), r


def decoder_forward(p, src_sm, f1, f2, f3, f4, rec):
    r1, r2, r3, r4 = rec
    s1 = avg_pool2(src_sm)
    s2 = avg_pool2(s1)
    s3 = avg_pool2(s2)

    # decode4: BottleneckBlock(128)
    x, r4 = _gru_half(p["decode4"]["gru"], f4, r4)

    def up_block(bp, x, f, s, r):
        x = resize_bilinear(x, (s.shape[1], s.shape[2]))
        x = jnp.concatenate([x, f, s], -1)
        x = jax.nn.relu(conv2d(x, bp["conv"]["w"], bp["conv"]["b"]))
        return _gru_half(bp["gru"], x, r)

    x, r3 = up_block(p["decode3"], x, f3, s3, r3)
    x, r2 = up_block(p["decode2"], x, f2, s2, r2)
    x, r1 = up_block(p["decode1"], x, f1, s1, r1)

    # decode0: OutputBlock
    x = resize_bilinear(x, (src_sm.shape[1], src_sm.shape[2]))
    x = jnp.concatenate([x, src_sm], -1)
    x = jax.nn.relu(conv2d(x, p["decode0"]["conv0"]["w"],
                           p["decode0"]["conv0"]["b"]))
    x = jax.nn.relu(conv2d(x, p["decode0"]["conv1"]["w"],
                           p["decode0"]["conv1"]["b"]))
    return x, (r1, r2, r3, r4)


def refiner_forward(p, fine_src, base_src, base_fgr, base_pha, base_hid):
    """Deep guided filter: solve A,b at low res, apply at high res
    (RVM deep_guided_filter.py)."""
    def with_lum(s):
        return jnp.concatenate([s, jnp.mean(s, -1, keepdims=True)], -1)

    fine_x = with_lum(fine_src)
    base_x = with_lum(base_src)
    base_y = jnp.concatenate([base_fgr, base_pha], -1)

    def box(v):
        return conv2d(v, p["box_filter"]["w"], None, groups=v.shape[-1])

    mean_x = box(base_x)
    mean_y = box(base_y)
    cov_xy = box(base_x * base_y) - mean_x * mean_y
    var_x = box(base_x * base_x) - mean_x * mean_x

    A = jnp.concatenate([cov_xy, var_x, base_hid], -1)
    A = jax.nn.relu(conv2d(A, p["conv0"]["w"], p["conv0"]["b"]))
    A = jax.nn.relu(conv2d(A, p["conv1"]["w"], p["conv1"]["b"]))
    A = conv2d(A, p["conv2"]["w"], p["conv2"]["b"])
    b = mean_y - A * mean_x

    hw = (fine_src.shape[1], fine_src.shape[2])
    A = resize_bilinear(A, hw)
    b = resize_bilinear(b, hw)
    out = A * fine_x + b
    return out[..., :3], out[..., 3:4]


def rvm_forward(params: Dict[str, Any], src: jnp.ndarray,
                rec: Sequence[Optional[jnp.ndarray]] = (None,) * 4,
                downsample_ratio: float = 1.0):
    """src [B,H,W,3] in [0,1] -> (fgr [B,H,W,3], pha [B,H,W,1], rec').

    Mirrors MattingNetwork.forward (RVM model.py): optional downsample,
    encoder -> LR-ASPP -> recurrent decoder -> projection; guided-filter
    refinement back to full res when downsample_ratio != 1.
    """
    if downsample_ratio != 1.0:
        h = int(round(src.shape[1] * downsample_ratio))
        w = int(round(src.shape[2] * downsample_ratio))
        src_sm = resize_bilinear(src, (h, w))
    else:
        src_sm = src

    f1, f2, f3, f4 = encoder_forward(params["backbone"], src_sm)
    f4 = lraspp_forward(params["aspp"], f4)
    hid, rec = decoder_forward(params["decoder"], src_sm, f1, f2, f3, f4,
                               tuple(rec))
    out = conv2d(hid, params["project_mat"]["w"], params["project_mat"]["b"])
    fgr_residual, pha = out[..., :3], out[..., 3:4]

    if downsample_ratio != 1.0:
        fgr_residual, pha = refiner_forward(
            params["refiner"], src, src_sm, fgr_residual, pha, hid)

    fgr = jnp.clip(fgr_residual + src, 0.0, 1.0)
    pha = jnp.clip(pha, 0.0, 1.0)
    return fgr, pha, rec


# ---------------------------------------------------------------------------
# torch state_dict conversion (official rvm_mobilenetv3 naming)
# ---------------------------------------------------------------------------

def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _fold_bn(w_oihw, bn_w, bn_b, bn_m, bn_v, eps=1e-5):
    """conv(+BN) -> conv(w', b') with NHWC 'HWIO' weights."""
    scale = bn_w / np.sqrt(bn_v + eps)
    w = w_oihw * scale[:, None, None, None]
    b = bn_b - bn_m * scale
    return np.transpose(w, (2, 3, 1, 0)), b


def _conv_bn(sd, conv_key, bn_key):
    return dict(zip("wb", _fold_bn(
        _np(sd[f"{conv_key}.weight"]),
        _np(sd[f"{bn_key}.weight"]), _np(sd[f"{bn_key}.bias"]),
        _np(sd[f"{bn_key}.running_mean"]), _np(sd[f"{bn_key}.running_var"]))))


def _conv(sd, key, bias=True):
    w = np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0))
    b = _np(sd[f"{key}.bias"]) if bias and f"{key}.bias" in sd else None
    return {"w": w, "b": b}


def convert_torch_rvm(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Official ``rvm_mobilenetv3`` state_dict -> BN-folded NHWC pytree."""
    sd = {k: _np(v) for k, v in sd.items()}
    P: Dict[str, Any] = {}

    bb = "backbone.features"
    P["backbone"] = {
        "stem": _conv_bn(sd, f"{bb}.0.0", f"{bb}.0.1"),
        "head": _conv_bn(sd, f"{bb}.16.0", f"{bb}.16.1"),
        "blocks": [],
    }
    for i, spec in enumerate(MBV3_LARGE):
        k, exp, out, use_se, act, stride, dil = spec
        pre = f"{bb}.{i + 1}.block"
        blk: Dict[str, Any] = {}
        j = 0
        cin = 16 if i == 0 else MBV3_LARGE[i - 1][2]
        if exp != cin:
            blk["expand"] = _conv_bn(sd, f"{pre}.{j}.0", f"{pre}.{j}.1")
            j += 1
        blk["dw"] = _conv_bn(sd, f"{pre}.{j}.0", f"{pre}.{j}.1")
        j += 1
        if use_se:
            blk["se_fc1"] = _conv(sd, f"{pre}.{j}.fc1")
            blk["se_fc2"] = _conv(sd, f"{pre}.{j}.fc2")
            j += 1
        blk["project"] = _conv_bn(sd, f"{pre}.{j}.0", f"{pre}.{j}.1")
        P["backbone"]["blocks"].append(blk)

    P["aspp"] = {
        "aspp1": _conv_bn(sd, "aspp.aspp1.0", "aspp.aspp1.1"),
        "aspp2": _conv(sd, "aspp.aspp2.1"),
    }

    def gru(pre):
        return {"ih": _conv(sd, f"{pre}.ih.0"), "hh": _conv(sd, f"{pre}.hh.0")}

    dec = {"decode4": {"gru": gru("decoder.decode4.gru")}}
    for name in ("decode3", "decode2", "decode1"):
        dec[name] = {
            "conv": _conv_bn(sd, f"decoder.{name}.conv.0",
                             f"decoder.{name}.conv.1"),
            "gru": gru(f"decoder.{name}.gru"),
        }
    dec["decode0"] = {
        "conv0": _conv_bn(sd, "decoder.decode0.conv.0",
                          "decoder.decode0.conv.1"),
        "conv1": _conv_bn(sd, "decoder.decode0.conv.3",
                          "decoder.decode0.conv.4"),
    }
    P["decoder"] = dec
    P["project_mat"] = _conv(sd, "project_mat.conv")

    if "refiner.box_filter.weight" in sd:
        P["refiner"] = {
            "box_filter": _conv(sd, "refiner.box_filter", bias=False),
            "conv0": _conv_bn(sd, "refiner.conv.0", "refiner.conv.1"),
            "conv1": _conv_bn(sd, "refiner.conv.3", "refiner.conv.4"),
            "conv2": _conv(sd, "refiner.conv.6"),
        }
    return P


def load_rvm_weights(path: str) -> Dict[str, Any]:
    """rvm_mobilenetv3.pth (torch state_dict or TorchScript archive) ->
    pytree."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    except Exception:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    return convert_torch_rvm(sd)
