"""JAX OpenSeeFace landmark model: MobileNetV3-UNet heatmap heads + decode.

The reference's preprocessing uses OpenSeeFace's ONNX landmark models for
face presence/crop (OpenSeeFace/tracker.py:498-560), decoded by
``Tracker.landmarks`` (tracker.py:731-761); the repo also ships a torch port
blueprint (OpenSeeFace/models_pytorch/model.py:10-283, ``lm_model3.pth`` in
tracker_pytorch.py:537). This module is a TPU-native rebuild of those
landmark heads:

* the MobileNetV3 backbone (geffnet arch defs, model.py:10-100) with the
  two UNetUp decode stages and the grouped depthwise head
  (model.py:232-283), as pure-JAX NHWC inference functions over a
  BN-FOLDED weight pytree — inference needs no BatchNorm state, so every
  conv+BN pair is folded into one conv+bias at conversion time;
* a converter from the torch-port state_dict layout (geffnet param names)
  — given an ``lm_model{N}.pth`` (or an .npz of the same tensors),
  preprocessing runs with zero non-JAX ML dependencies;
* the exact heatmap -> 66-landmark decode (argmax + logit offset,
  spec: tracker.py:731-761), landmarks returned in the tracker's
  (y, x, conf) layout.

Model types (tracker.py:498-560): 0 = small 0.5, 1 = small 1.0,
2 = large 0.75, 3 = large 1.0; input 224², output heatmaps 28².
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# MobileNetV3 arch tables (transcribed from the geffnet arch_def strings in
# models_pytorch/model.py:27-50 / :73-96; non-"minimal" variants).
# Each block: (type, kernel, stride, exp_ratio, out_ch, has_se, act)
# ---------------------------------------------------------------------------

_SMALL = [
    [("ds", 3, 2, 1.0, 16, True, "relu")],
    [("ir", 3, 2, 4.5, 24, False, "relu"),
     ("ir", 3, 1, 3.67, 24, False, "relu")],
    [("ir", 5, 2, 4.0, 40, True, "hswish"),
     ("ir", 5, 1, 6.0, 40, True, "hswish"),
     ("ir", 5, 1, 6.0, 40, True, "hswish")],
    [("ir", 5, 1, 3.0, 48, True, "hswish"),
     ("ir", 5, 1, 3.0, 48, True, "hswish")],
    [("ir", 5, 2, 6.0, 96, True, "hswish"),
     ("ir", 5, 1, 6.0, 96, True, "hswish"),
     ("ir", 5, 1, 6.0, 96, True, "hswish")],
    [("cn", 1, 1, 1.0, 576, False, "hswish")],
]

_LARGE = [
    [("ds", 3, 1, 1.0, 16, False, "relu")],
    [("ir", 3, 2, 4.0, 24, False, "relu"),
     ("ir", 3, 1, 3.0, 24, False, "relu")],
    [("ir", 5, 2, 3.0, 40, True, "relu"),
     ("ir", 5, 1, 3.0, 40, True, "relu"),
     ("ir", 5, 1, 3.0, 40, True, "relu")],
    [("ir", 3, 2, 6.0, 80, False, "hswish"),
     ("ir", 3, 1, 2.5, 80, False, "hswish"),
     ("ir", 3, 1, 2.3, 80, False, "hswish"),
     ("ir", 3, 1, 2.3, 80, False, "hswish")],
    [("ir", 3, 1, 6.0, 112, True, "hswish"),
     ("ir", 3, 1, 6.0, 112, True, "hswish")],
    [("ir", 5, 2, 6.0, 160, True, "hswish"),
     ("ir", 5, 1, 6.0, 160, True, "hswish"),
     ("ir", 5, 1, 6.0, 160, True, "hswish")],
    [("cn", 1, 1, 1.0, 960, False, "hswish")],
]

#: model_type -> (variant table, channel multiplier, skip-stage indices
#: (r2_i, r3_i), head residual channels base (r2, r3), backbone final ch)
LM_MODELS = {
    0: ("small", 0.5),
    1: ("small", 1.0),
    2: ("large", 0.75),
    3: ("large", 1.0),
}


def round_channels(ch: float, multiplier: float = 1.0, divisor: int = 8) -> int:
    """geffnet round_channels / make_divisible."""
    if not multiplier:
        return int(ch)
    ch *= multiplier
    new_ch = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new_ch < 0.9 * ch:
        new_ch += divisor
    return new_ch


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def lm_arch(model_type: int):
    variant, cm = LM_MODELS[model_type]
    table = _SMALL if variant == "small" else _LARGE
    r2_i, r3_i = (1, 2) if variant == "small" else (2, 4)
    return table, cm, r2_i, r3_i


# ---------------------------------------------------------------------------
# Inference primitives (NHWC, BN already folded into conv bias)
# ---------------------------------------------------------------------------

def hard_swish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


_ACT = {"relu": jax.nn.relu, "hswish": hard_swish, "relu6": relu6,
        None: lambda x: x}


def conv2d(x, w, b=None, stride=1, groups=1):
    """torch-Conv2d semantics: explicit k//2 padding; w is [kh, kw, in/g, out]."""
    k = w.shape[0]
    pad = k // 2
    out = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if b is not None:
        out = out + b
    return out


def se_block(x, p):
    """geffnet SqueezeExcite: avgpool -> 1x1 reduce (+relu) -> 1x1 expand
    (+hard_sigmoid gate)."""
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = jax.nn.relu(conv2d(s, p["reduce_w"], p["reduce_b"]))
    s = hard_sigmoid(conv2d(s, p["expand_w"], p["expand_b"]))
    return x * s


def _block(x, p, spec):
    btype, k, stride, _, _, has_se, act_name = spec
    act = _ACT[act_name]
    if btype == "cn":
        return act(conv2d(x, p["conv_w"], p["conv_b"], stride=stride))
    if btype == "ds":
        h = act(conv2d(x, p["dw_w"], p["dw_b"], stride=stride,
                       groups=x.shape[-1]))
        if has_se:
            h = se_block(h, p["se"])
        h = conv2d(h, p["pw_w"], p["pw_b"])
        if stride == 1 and h.shape[-1] == x.shape[-1]:
            h = h + x
        return h
    # inverted residual
    h = act(conv2d(x, p["pw_w"], p["pw_b"]))
    h = act(conv2d(h, p["dw_w"], p["dw_b"], stride=stride,
                   groups=h.shape[-1]))
    if has_se:
        h = se_block(h, p["se"])
    h = conv2d(h, p["pwl_w"], p["pwl_b"])
    if stride == 1 and h.shape[-1] == x.shape[-1]:
        h = h + x
    return h


def upsample_align_corners(x, size: Tuple[int, int]):
    """Bilinear upsample with torch align_corners=True semantics."""
    from havatar_tpu.ops.grid_sample import grid_sample_2d

    B, H, W, C = x.shape
    oh, ow = size
    if H == 1 and W == 1:
        # degenerate source (the gaze net's 1² bottleneck): every output
        # pixel is the single source value
        return jnp.broadcast_to(x, (B, oh, ow, C))
    ys = jnp.linspace(-1.0, 1.0, oh)
    xs = jnp.linspace(-1.0, 1.0, ow)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([gx.ravel(), gy.ravel()], -1)[None]
    coords = jnp.broadcast_to(coords, (B, oh * ow, 2))
    out = grid_sample_2d(x, coords, padding_mode="border")
    return out.reshape(B, oh, ow, C)


def ds_head(x, p, groups_pw: int):
    """DSConv2d old=0 (model.py:117-127): dw3x3 -> relu6 -> grouped pw 1x1
    -> relu6 (BN folded)."""
    h = relu6(conv2d(x, p["dw_w"], p["dw_b"], groups=x.shape[-1]))
    h = relu6(conv2d(h, p["pw_w"], p["pw_b"], groups=groups_pw))
    return h


def unet_up(x, skip, p, size: Tuple[int, int]):
    """UNetUp (model.py:132-141): upsample(align_corners) -> concat(skip, x)
    -> DSConv2d(kpl=1, groups=1)."""
    x = upsample_align_corners(x, size)
    return ds_head(jnp.concatenate([skip, x], axis=-1), p, groups_pw=1)


def apply_landmark_net(params: Dict[str, Any], x: jnp.ndarray,
                       model_type: int = 3) -> jnp.ndarray:
    """[B, 224, 224, 3] preprocessed input -> [B, 28, 28, 198] heatmaps
    (66 logit maps ++ 66 x-offset maps ++ 66 y-offset maps).

    Forward spec: OpenSeeFaceLandmarks._forward_impl (model.py:251-266).
    """
    table, cm, r2_i, r3_i = lm_arch(model_type)
    act = hard_swish
    h = act(conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2))
    skips = {}
    for si, stage in enumerate(table):
        for bi, spec in enumerate(stage):
            h = _block(h, params["blocks"][f"{si}_{bi}"], spec)
        if si == r2_i:
            skips["r2"] = h
        if si == r3_i:
            skips["r3"] = h
    h = unet_up(h, skips["r3"], params["up1"], (14, 14))
    h = unet_up(h, skips["r2"], params["up2"], (28, 28))
    h = ds_head(h, params["group"], groups_pw=3)
    return h


# ---------------------------------------------------------------------------
# Face detection net (OpenSeeFaceDetect, model.py:177-222): same backbone at
# channel_multiplier=0.1, THREE UNetUp stages to 56², "old=1" DSConv2d heads
# (dw -> BN -> pw -> BN -> relu6: one activation at the END), plus a 3x3
# maxpool whose equality with the raw map implements peak NMS.
# ---------------------------------------------------------------------------

def ds_head_old1(x, p, groups_pw: int):
    h = conv2d(x, p["dw_w"], p["dw_b"], groups=x.shape[-1])
    return relu6(conv2d(h, p["pw_w"], p["pw_b"], groups=groups_pw))


def unet_up_old1(x, skip, p, size: Tuple[int, int]):
    x = upsample_align_corners(x, size)
    return ds_head_old1(jnp.concatenate([skip, x], axis=-1), p, groups_pw=1)


def detect_arch(size: str = "large", cm: float = 0.1):
    table = _SMALL if size == "small" else _LARGE
    r1_i, r2_i, r3_i = (0, 1, 2) if size == "small" else (1, 2, 4)
    return table, cm, r1_i, r2_i, r3_i


def apply_detection_net(params: Dict[str, Any], x: jnp.ndarray,
                        size: str = "large", cm: float = 0.1):
    """[B, 224, 224, 3] -> (maps [B, 56, 56, 2], maxpool [B, 56, 56, 2]).

    Forward spec: OpenSeeFaceDetect._forward_impl (model.py:201-219).
    """
    table, cm, r1_i, r2_i, r3_i = detect_arch(size, cm)
    h = hard_swish(conv2d(x, params["stem"]["w"], params["stem"]["b"],
                          stride=2))
    skips = {}
    for si, stage in enumerate(table):
        for bi, spec in enumerate(stage):
            h = _block(h, params["blocks"][f"{si}_{bi}"], spec)
        if si == r1_i:
            skips["r1"] = h
        if si == r2_i:
            skips["r2"] = h
        if si == r3_i:
            skips["r3"] = h
    h = unet_up_old1(h, skips["r3"], params["up1"], (14, 14))
    h = unet_up_old1(h, skips["r2"], params["up2"], (28, 28))
    h = unet_up_old1(h, skips["r1"], params["up3"], (56, 56))
    h = ds_head_old1(h, params["group"], groups_pw=2)
    mp = lax.reduce_window(h, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
                           [(0, 0), (1, 1), (1, 1), (0, 0)])
    return h, mp


def decode_detections(maps: np.ndarray, maxpool: np.ndarray,
                      frame_hw: Tuple[int, int], max_faces: int = 1,
                      threshold: float = 0.6) -> np.ndarray:
    """(x, y, w, h) face boxes in frame pixels
    (spec: tracker.py:705-729)."""
    out = np.asarray(maps).transpose(2, 0, 1).copy()    # [2, 56, 56]
    mp = np.asarray(maxpool).transpose(2, 0, 1)
    out[0, out[0] != mp[0]] = 0                          # peak NMS
    order = np.flip(np.argsort(out[0].flatten()))
    results = []
    for det in order[:max_faces]:
        y, x = det // 56, det % 56
        c = out[0, y, x]
        if c < threshold:
            break
        r = out[1, y, x] * 112.0
        results.append((x * 4 - r, y * 4 - r, 2 * r, 2 * r))
    results = np.array(results, np.float32).reshape(-1, 4)
    if results.shape[0] > 0:
        results[:, [0, 2]] *= frame_hw[1] / 224.0
        results[:, [1, 3]] *= frame_hw[0] / 224.0
    return results


def _ds_head_old1_params(sd, prefix):
    """DSConv2d old=1 Sequential: 0=dw conv, 1=BN, 2=pw conv, 3=BN."""
    dw_w, dw_b = _fold_bn(np.asarray(sd[f"{prefix}.0.weight"]),
                          _bn(sd, f"{prefix}.1"))
    pw_w, pw_b = _fold_bn(np.asarray(sd[f"{prefix}.2.weight"]),
                          _bn(sd, f"{prefix}.3"))
    return {"dw_w": dw_w, "dw_b": dw_b, "pw_w": pw_w, "pw_b": pw_b}


def convert_torch_detection_model(state_dict, size: str = "large",
                                  cm: float = 0.1) -> Dict[str, Any]:
    """torch-port OpenSeeFaceDetect state_dict (detection.pth,
    tracker_pytorch.py:568) -> BN-folded pytree."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    table, cm, _, _, _ = detect_arch(size, cm)
    params: Dict[str, Any] = {}
    w, b = _fold_bn(sd["conv_stem.weight"], _bn(sd, "bn1"))
    params["stem"] = {"w": w, "b": b}
    blocks: Dict[str, Any] = {}
    for si, stage in enumerate(table):
        for bi, spec in enumerate(stage):
            blocks[f"{si}_{bi}"] = _convert_block(sd, f"blocks.{si}.{bi}", spec)
    params["blocks"] = blocks
    params["up1"] = _ds_head_old1_params(sd, "up1.conv.conv")
    params["up2"] = _ds_head_old1_params(sd, "up2.conv.conv")
    params["up3"] = _ds_head_old1_params(sd, "up3.conv.conv")
    params["group"] = _ds_head_old1_params(sd, "group.conv")
    return params


# ---------------------------------------------------------------------------
# Gaze/eye net (OpenSeeFaceGaze, model.py:144-175): MobileNetV3-SMALL
# backbone on 32² eye crops, THREE UNetUp stages back to 8², "old=2" DSConv2d
# heads (dw -> pw, biases, NO activation), grouped 3-channel output
# (conf / x-offset / y-offset heatmaps at 8²).
# ---------------------------------------------------------------------------

def ds_head_old2(x, p, groups_pw: int):
    """DSConv2d old=2 (model.py:106-110): dw3x3 (+bias) -> grouped pw 1x1
    (+bias), no BN, no activation."""
    h = conv2d(x, p["dw_w"], p["dw_b"], groups=x.shape[-1])
    return conv2d(h, p["pw_w"], p["pw_b"], groups=groups_pw)


def unet_up_old2(x, skip, p, size: Tuple[int, int]):
    x = upsample_align_corners(x, size)
    return ds_head_old2(jnp.concatenate([skip, x], axis=-1), p, groups_pw=1)


def apply_gaze_net(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """[B, 32, 32, 3] preprocessed eye crops -> [B, 8, 8, 3] maps
    (confidence ++ x-offset ++ y-offset logits).

    Forward spec: OpenSeeFaceGaze._forward_impl (model.py:154-172): taps
    after stages 0 (16ch, 8²), 1 (24ch, 4²), 3 (48ch, 2²); head 576ch 1².
    """
    table = _SMALL
    h = hard_swish(conv2d(x, params["stem"]["w"], params["stem"]["b"],
                          stride=2))
    skips = {}
    for si, stage in enumerate(table):
        for bi, spec in enumerate(stage):
            h = _block(h, params["blocks"][f"{si}_{bi}"], spec)
        if si == 0:
            skips["r1"] = h
        if si == 1:
            skips["r2"] = h
        if si == 3:
            skips["r3"] = h
    h = unet_up_old2(h, skips["r3"], params["up1"], (2, 2))
    h = unet_up_old2(h, skips["r2"], params["up2"], (4, 4))
    h = unet_up_old2(h, skips["r1"], params["up3"], (8, 8))
    return ds_head_old2(h, params["group"], groups_pw=3)


def _ds_head_old2_params(sd, prefix):
    """DSConv2d old=2 Sequential: 0=dw conv (+bias), 1=pw conv (+bias)."""
    dw_w, dw_b = _plain(np.asarray(sd[f"{prefix}.0.weight"]),
                        np.asarray(sd[f"{prefix}.0.bias"]))
    pw_w, pw_b = _plain(np.asarray(sd[f"{prefix}.1.weight"]),
                        np.asarray(sd[f"{prefix}.1.bias"]))
    return {"dw_w": dw_w, "dw_b": dw_b, "pw_w": pw_w, "pw_b": pw_b}


def convert_torch_gaze_model(state_dict) -> Dict[str, Any]:
    """torch-port OpenSeeFaceGaze state_dict (geffnet layout,
    models_pytorch/model.py:144-153) -> BN-folded pytree."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    w, b = _fold_bn(sd["conv_stem.weight"], _bn(sd, "bn1"))
    params["stem"] = {"w": w, "b": b}
    blocks: Dict[str, Any] = {}
    for si, stage in enumerate(_SMALL):
        for bi, spec in enumerate(stage):
            blocks[f"{si}_{bi}"] = _convert_block(sd, f"blocks.{si}.{bi}",
                                                  spec)
    params["blocks"] = blocks
    params["up1"] = _ds_head_old2_params(sd, "up1.conv.conv")
    params["up2"] = _ds_head_old2_params(sd, "up2.conv.conv")
    params["up3"] = _ds_head_old2_params(sd, "up3.conv.conv")
    params["group"] = _ds_head_old2_params(sd, "group.conv")
    return params


# ---------------------------------------------------------------------------
# Heatmap decode (exact transcription target: tracker.py:731-761)
# ---------------------------------------------------------------------------

def logit_arr(p, factor: float = 16.0):
    p = np.clip(p, 1e-7, 1.0 - 1e-7)
    return np.log(p / (1.0 - p)) / factor


def decode_landmarks(hm_nhwc: np.ndarray,
                     crop_info=(0.0, 0.0, 1.0, 1.0),
                     res: float = 224.0, logit_factor: float = 16.0):
    """[28, 28, 198] heatmaps -> (avg_conf, [66, 3] landmarks in the
    tracker's (y, x, conf) layout). ``crop_info`` = (crop_x1, crop_y1,
    scale_x, scale_y) of the face crop in the source frame."""
    crop_x1, crop_y1, scale_x, scale_y = crop_info
    out_res_i = hm_nhwc.shape[0]
    out_res = float(out_res_i - 1)
    c0 = hm_nhwc.shape[-1] // 3
    tensor = np.asarray(hm_nhwc).transpose(2, 0, 1)  # [198, H, W]
    r = res - 1.0
    t_main = tensor[0:c0].reshape(c0, out_res_i * out_res_i)
    t_m = t_main.argmax(1)
    indices = np.expand_dims(t_m, 1)
    t_conf = np.take_along_axis(t_main, indices, 1).reshape(c0)
    t_off_x = np.take_along_axis(
        tensor[c0:2 * c0].reshape(c0, -1), indices, 1).reshape(c0)
    t_off_y = np.take_along_axis(
        tensor[2 * c0:3 * c0].reshape(c0, -1), indices, 1).reshape(c0)
    t_off_x = r * logit_arr(t_off_x, logit_factor)
    t_off_y = r * logit_arr(t_off_y, logit_factor)
    t_x = crop_y1 + scale_y * (r * np.floor(t_m / out_res_i) / out_res + t_off_x)
    t_y = crop_x1 + scale_x * (r * np.floor(np.mod(t_m, out_res_i)) / out_res + t_off_y)
    lms = np.stack([t_x, t_y, t_conf], 1)
    lms[np.isnan(lms).any(axis=1)] = np.array([0.0, 0.0, 0.0], np.float32)
    return float(np.mean(t_conf)), lms


def preprocess_crop(frame_rgb: np.ndarray, res: int = 224) -> np.ndarray:
    """uint8 RGB crop -> [1, res, res, 3] normalized float input
    (spec: tracker.py:563-570,860-866 — x * 1/(std*255) - mean/std)."""
    import cv2

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    scale = 1.0 / (std * 255.0)
    shift = -mean / std
    im = cv2.resize(frame_rgb, (res, res),
                    interpolation=cv2.INTER_LINEAR).astype(np.float32)
    im = im * scale + shift
    return im[None]


# ---------------------------------------------------------------------------
# Weight conversion: torch-port state_dict (geffnet names) -> folded pytree
# ---------------------------------------------------------------------------

def _fold_bn(w_oihw: np.ndarray, bn: Dict[str, np.ndarray],
             conv_bias: Optional[np.ndarray] = None, eps: float = 1e-5):
    """Fold BatchNorm(gamma, beta, mean, var) into conv weight+bias.
    w is torch [O, I/g, kh, kw]; returns ([kh, kw, I/g, O], [O])."""
    gamma, beta = bn["weight"], bn["bias"]
    mean, var = bn["running_mean"], bn["running_var"]
    scale = gamma / np.sqrt(var + eps)
    w = w_oihw * scale[:, None, None, None]
    b = beta - mean * scale
    if conv_bias is not None:
        b = b + conv_bias * scale
    return w.transpose(2, 3, 1, 0).astype(np.float32), b.astype(np.float32)


def _plain(w_oihw: np.ndarray, b: Optional[np.ndarray]):
    w = w_oihw.transpose(2, 3, 1, 0).astype(np.float32)
    return w, (None if b is None else b.astype(np.float32))


def _se(sd, prefix):
    rw, rb = _plain(sd[f"{prefix}.conv_reduce.weight"],
                    sd[f"{prefix}.conv_reduce.bias"])
    ew, eb = _plain(sd[f"{prefix}.conv_expand.weight"],
                    sd[f"{prefix}.conv_expand.bias"])
    return {"reduce_w": rw, "reduce_b": rb, "expand_w": ew, "expand_b": eb}


def _bn(sd, prefix):
    return {k: np.asarray(sd[f"{prefix}.{k}"]) for k in
            ("weight", "bias", "running_mean", "running_var")}


def _ds_head_params(sd, prefix):
    """DSConv2d old=0 Sequential: 0=dw conv, 1=BN, 3=pw conv, 4=BN."""
    dw_w, dw_b = _fold_bn(np.asarray(sd[f"{prefix}.0.weight"]),
                          _bn(sd, f"{prefix}.1"))
    pw_w, pw_b = _fold_bn(np.asarray(sd[f"{prefix}.3.weight"]),
                          _bn(sd, f"{prefix}.4"))
    return {"dw_w": dw_w, "dw_b": dw_b, "pw_w": pw_w, "pw_b": pw_b}


def _convert_block(sd, pre: str, spec) -> Dict[str, Any]:
    btype, _, _, _, _, has_se, _ = spec
    p: Dict[str, Any] = {}
    if btype == "cn":
        p["conv_w"], p["conv_b"] = _fold_bn(
            sd[f"{pre}.conv.weight"], _bn(sd, f"{pre}.bn1"))
    elif btype == "ds":
        p["dw_w"], p["dw_b"] = _fold_bn(
            sd[f"{pre}.conv_dw.weight"], _bn(sd, f"{pre}.bn1"))
        if has_se:
            p["se"] = _se(sd, f"{pre}.se")
        p["pw_w"], p["pw_b"] = _fold_bn(
            sd[f"{pre}.conv_pw.weight"], _bn(sd, f"{pre}.bn2"))
    else:
        p["pw_w"], p["pw_b"] = _fold_bn(
            sd[f"{pre}.conv_pw.weight"], _bn(sd, f"{pre}.bn1"))
        p["dw_w"], p["dw_b"] = _fold_bn(
            sd[f"{pre}.conv_dw.weight"], _bn(sd, f"{pre}.bn2"))
        if has_se:
            p["se"] = _se(sd, f"{pre}.se")
        p["pwl_w"], p["pwl_b"] = _fold_bn(
            sd[f"{pre}.conv_pwl.weight"], _bn(sd, f"{pre}.bn3"))
    return p


def convert_torch_landmark_model(state_dict, model_type: int = 3) -> Dict[str, Any]:
    """torch-port state_dict (models_pytorch layout, e.g. lm_model3.pth,
    tracker_pytorch.py:537) -> BN-folded NHWC pytree for
    :func:`apply_landmark_net`."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    table, cm, _, _ = lm_arch(model_type)

    params: Dict[str, Any] = {}
    w, b = _fold_bn(sd["conv_stem.weight"], _bn(sd, "bn1"))
    params["stem"] = {"w": w, "b": b}

    blocks: Dict[str, Any] = {}
    for si, stage in enumerate(table):
        for bi, spec in enumerate(stage):
            blocks[f"{si}_{bi}"] = _convert_block(sd, f"blocks.{si}.{bi}",
                                                  spec)
    params["blocks"] = blocks
    params["up1"] = _ds_head_params(sd, "up1.conv.conv")
    params["up2"] = _ds_head_params(sd, "up2.conv.conv")
    params["group"] = _ds_head_params(sd, "group.conv")
    return params


def load_landmark_weights(path: str, model_type: int = 3) -> Dict[str, Any]:
    """Load from a torch .pth state_dict or an .npz of the same tensors."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            sd = {k: z[k] for k in z.files}
    else:
        import torch

        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return convert_torch_landmark_model(sd, model_type)


# ---------------------------------------------------------------------------
# Random init (for tests / shape checks, mirrors the converted layout)
# ---------------------------------------------------------------------------

def init_landmark_params(rng: np.random.RandomState,
                         model_type: int = 3) -> Dict[str, Any]:
    table, cm, r2_i, r3_i = lm_arch(model_type)

    def cv(kh, kw, cin, cout):
        return (rng.randn(kh, kw, cin, cout).astype(np.float32)
                * (1.0 / math.sqrt(kh * kw * cin)),
                rng.randn(cout).astype(np.float32) * 0.01)

    stem = round_channels(16, cm)
    params: Dict[str, Any] = {}
    w, b = cv(3, 3, 3, stem)
    params["stem"] = {"w": w, "b": b}
    blocks: Dict[str, Any] = {}
    cin = stem
    stage_out: List[int] = []
    for si, stage in enumerate(table):
        for bi, spec in enumerate(stage):
            btype, k, stride, e, c, has_se, _ = spec
            cout = round_channels(c, cm)
            p: Dict[str, Any] = {}
            if btype == "cn":
                p["conv_w"], p["conv_b"] = cv(k, k, cin, cout)
            elif btype == "ds":
                p["dw_w"], p["dw_b"] = cv(k, k, 1, cin)
                if has_se:
                    rd = make_divisible(cin * 0.25)
                    rw, rb = cv(1, 1, cin, rd)
                    ew, eb = cv(1, 1, rd, cin)
                    p["se"] = {"reduce_w": rw, "reduce_b": rb,
                               "expand_w": ew, "expand_b": eb}
                p["pw_w"], p["pw_b"] = cv(1, 1, cin, cout)
            else:
                mid = make_divisible(cin * e)
                p["pw_w"], p["pw_b"] = cv(1, 1, cin, mid)
                p["dw_w"], p["dw_b"] = cv(k, k, 1, mid)
                if has_se:
                    rd = make_divisible(mid * 0.25)
                    rw, rb = cv(1, 1, mid, rd)
                    ew, eb = cv(1, 1, rd, mid)
                    p["se"] = {"reduce_w": rw, "reduce_b": rb,
                               "expand_w": ew, "expand_b": eb}
                p["pwl_w"], p["pwl_b"] = cv(1, 1, mid, cout)
            blocks[f"{si}_{bi}"] = p
            cin = cout
        stage_out.append(cin)
    params["blocks"] = blocks

    r3_ch, r2_ch = stage_out[r3_i], stage_out[r2_i]

    def head(cin_h, cout_h, kpl):
        dw_w, dw_b = cv(3, 3, 1, cin_h * kpl)
        pw_w, pw_b = cv(1, 1, cin_h * kpl, cout_h)
        return {"dw_w": dw_w, "dw_b": dw_b, "pw_w": pw_w, "pw_b": pw_b}

    params["up1"] = head(cin + r3_ch, 256, 1)
    params["up2"] = head(256 + r2_ch, 198, 1)
    # group head: grouped pw (groups=3)
    g = head(198, 198, 4)
    g["pw_w"] = (rng.randn(1, 1, 198 * 4 // 3, 198).astype(np.float32)
                 * (1.0 / math.sqrt(198 * 4 // 3)))
    g["pw_b"] = rng.randn(198).astype(np.float32) * 0.01
    params["group"] = g
    return params
