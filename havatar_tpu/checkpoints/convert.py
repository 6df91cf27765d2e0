"""Convert reference PyTorch checkpoints into havatar_tpu flax param pytrees.

Covers the three checkpoint layouts the reference produces
(SURVEY.md §5 "Checkpoint / resume"):
  * stage-1: {iter, optimizer_state_dict, loss, psnr, trainer_state_dict}
    (train_avatar.py:303-315)
  * stage-2: {iter, nerf_optimizer, g_optim, d_optim, nerf_render, g, d,
    g_ema, latent_codes} (train_avatarHD.py:347-377)
  * the pretrained img_translation.ckpt {g, d, g_ema}

Weight-layout rules:
  torch Linear [out, in]            -> flax [in, out]
  torch Conv2d OIHW                  -> flax HWIO
  torch Conv3d OIDHW                 -> flax DHWIO
  ModulatedConv2d [1, out, in, k, k] -> [k, k, in, out]
  ConstantInput [1, C, s, s]         -> [1, s, s, C]
  ToRGB bias [1, C, 1, 1]            -> [1, 1, 1, C]
  EqualLinear weights stay divided by lr_mul (both sides store them that way,
  reference model/styleUnet.py:134).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"weight": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv_hwio(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _modconv(sd: Mapping, prefix: str) -> Dict[str, Any]:
    w = _np(sd[f"{prefix}.weight"])[0]  # [out, in, k, k]
    return {
        "weight": w.transpose(2, 3, 1, 0),
        "modulation": _linear(sd, f"{prefix}.modulation"),
    }


def _conv_layer(sd: Mapping, prefix: str, downsample: bool,
                activate: bool = True) -> Dict[str, Any]:
    """torch ConvLayer is Sequential([Blur], EqualConv2d, [FusedLeakyReLU])."""
    idx = 1 if downsample else 0
    out: Dict[str, Any] = {"conv": {"weight": _conv_hwio(sd[f"{prefix}.{idx}.weight"])}}
    if activate:
        key = f"{prefix}.{idx + 1}.bias"
        if key in sd:
            out["act_bias"] = _np(sd[key])
    else:
        key = f"{prefix}.{idx}.bias"
        if key in sd:
            out["conv"]["bias"] = _np(sd[key])
    return out


def _conv_block(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "conv1": _conv_layer(sd, f"{prefix}.conv1", downsample=False),
        "conv2": _conv_layer(sd, f"{prefix}.conv2", downsample=True),
    }


def _from_rgb(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {"conv": _conv_layer(sd, f"{prefix}.conv", downsample=False)}


def _styled_conv(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "noise": {"weight": _np(sd[f"{prefix}.noise.weight"])},
        "act_bias": _np(sd[f"{prefix}.activate.bias"]),
    }


def _to_rgb(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "bias": _np(sd[f"{prefix}.bias"]).transpose(0, 2, 3, 1),
    }


def _style_mlp(sd: Mapping, prefix: str, n_mlp: int) -> Dict[str, Any]:
    # torch Sequential: [PixelNorm, EqualLinear x n_mlp] -> fc{i} = index i+1
    return {f"fc{i}": _linear(sd, f"{prefix}.{i + 1}") for i in range(n_mlp)}


def convert_plane_generator(sd: Mapping, prefix: str = "",
                            out_size: int = 128, middle_size: int = 16,
                            inp_size: int = 256, n_mlp: int = 4) -> Dict[str, Any]:
    """StyleGAN_zxc (no_skip, cond-encoder variant) -> PlaneGenerator params."""
    p = (prefix + ".") if prefix else ""
    log_size = int(math.log2(out_size))
    mid_log = int(math.log2(middle_size))
    n_enc = len(range(int(math.log2(inp_size)) - 2, mid_log, -1))
    n_up = log_size - mid_log

    out: Dict[str, Any] = {
        "style": _style_mlp(sd, f"{p}style", n_mlp),
        "conv_in": _conv_layer(sd, f"{p}conv_in", downsample=True),
        "input": {"input": _np(sd[f"{p}input.input"]).transpose(0, 2, 3, 1)},
        "conv_first": _styled_conv(sd, f"{p}conv1"),
        "conv_out": _conv_layer(sd, f"{p}conv_out", downsample=False),
    }
    for i in range(n_enc):
        out[f"from_rgb{i}"] = _from_rgb(sd, f"{p}from_rgbs.{i}")
        out[f"cond_conv{i}"] = _conv_block(sd, f"{p}cond_convs.{i}")
    # comb_convs: only the ones the forward pass actually uses get flax params
    n_comb = n_enc + 1
    used = {n_comb - (i // 2) for i in range(3, 2 * n_comb + 2, 2)
            if n_comb - (i // 2) >= 0 and (i - 1) // 2 < n_up}
    for j in range(n_comb):
        if j in used:
            out[f"comb_conv{j}"] = _conv_layer(sd, f"{p}comb_convs.{j}",
                                               downsample=False)
    for i in range(2 * n_up):
        out[f"conv{i}"] = _styled_conv(sd, f"{p}convs.{i}")
    return out


def convert_two_head_generator(sd: Mapping, prefix: str = "",
                               out_size: int = 128, middle_size: int = 8,
                               split_size: int = 32, inp_size: int = 256,
                               n_mlp: int = 4) -> Dict[str, Any]:
    """StyleGAN_zxc_twoHead (model/styleUnet.py:881-1187) ->
    TwoHeadPlaneGenerator params. The reference's never-called per-head
    FromRGB pyramids are skipped (no flax counterpart)."""
    p = (prefix + ".") if prefix else ""
    log_size = int(math.log2(out_size))
    mid_log = int(math.log2(middle_size))
    split_log = int(math.log2(split_size))
    n_enc = len(range(int(math.log2(inp_size)) - 2, split_log - 1, -1))
    n_trunk_up = split_log - mid_log
    n_head_up = log_size - split_log

    out: Dict[str, Any] = {
        "style": _style_mlp(sd, f"{p}style", n_mlp),
        "input": {"input": _np(sd[f"{p}input.input"]).transpose(0, 2, 3, 1)},
        "conv_first": _styled_conv(sd, f"{p}conv1"),
    }
    for i in range(2 * n_trunk_up):
        out[f"conv{i}"] = _styled_conv(sd, f"{p}convs.{i}")
    n_comb = n_enc + 1
    used = {n_comb - 1 - s for s in range(n_head_up)}
    for k, sfx in enumerate(("", "1")):
        out[f"conv_in{k}"] = _conv_layer(sd, f"{p}conv_in{sfx}",
                                         downsample=True)
        for si in range(n_enc):
            out[f"cond_conv{k}_{si}"] = _conv_block(
                sd, f"{p}cond_convs{sfx}.{si}")
        for ci in used:
            out[f"comb_conv{k}_{ci}"] = _conv_layer(
                sd, f"{p}comb_convs{sfx}.{ci}", downsample=False)
        for i in range(2 * n_head_up):
            out[f"head{k}_conv{i}"] = _styled_conv(sd, f"{p}convs_head{sfx}.{i}")
        out[f"conv_out{k}"] = _conv_layer(sd, f"{p}conv_out{sfx}",
                                          downsample=False)
    return out


def convert_styleunet(sd: Mapping, prefix: str = "", out_size: int = 512,
                      inp_size: int = 128, middle_size: int = 8,
                      n_mlp: int = 4) -> Dict[str, Any]:
    """SWGAN_unet -> StyleUNetSR params."""
    p = (prefix + ".") if prefix else ""
    log_size = int(math.log2(out_size)) - 1
    mid_log = int(math.log2(middle_size))
    n_enc = len(range(int(math.log2(inp_size)) - 2, mid_log - 1, -1))
    n_up = log_size - mid_log

    out: Dict[str, Any] = {
        "style": _style_mlp(sd, f"{p}style", n_mlp),
        "conv_in": _conv_layer(sd, f"{p}conv_in", downsample=True),
    }
    for i in range(n_enc):
        out[f"from_rgb{i}"] = _from_rgb(sd, f"{p}from_rgbs.{i}")
        out[f"cond_conv{i}"] = _conv_block(sd, f"{p}cond_convs.{i}")
    for j in range(n_enc + 1):
        out[f"comb_conv{j}"] = _conv_layer(sd, f"{p}comb_convs.{j}",
                                           downsample=False)
    for i in range(2 * n_up):
        out[f"conv{i}"] = _styled_conv(sd, f"{p}convs.{i}")
    for s in range(n_up):
        out[f"to_rgb{s}"] = _to_rgb(sd, f"{p}to_rgbs.{s}")
    return out


def convert_discriminator(sd: Mapping, prefix: str = "",
                          size: int = 512,
                          c_dim: Optional[int] = None) -> Dict[str, Any]:
    """``c_dim=None`` auto-detects the pose-conditional projection head
    from the state dict (``mapping.*`` present iff the reference built it
    with c_dim>0, model/styleUnet.py:514-533)."""
    p = (prefix + ".") if prefix else ""
    if c_dim is None:
        c_dim = 1 if f"{p}mapping.0.weight" in sd else 0
    log_size = int(math.log2(size)) - 1
    n_blocks = len(range(log_size, 2, -1))
    out: Dict[str, Any] = {}
    for i in range(n_blocks):
        out[f"from_rgb{i}"] = _from_rgb(sd, f"{p}from_rgbs.{i}")
        out[f"conv{i}"] = _conv_block(sd, f"{p}convs.{i}")
    out["from_rgb_final"] = _from_rgb(sd, f"{p}from_rgbs.{n_blocks}")
    out["final_conv"] = _conv_layer(sd, f"{p}final_conv", downsample=False)
    out["final_linear0"] = _linear(sd, f"{p}final_linear.0")
    out["final_linear1"] = _linear(sd, f"{p}final_linear.1")
    if c_dim > 0:
        # pose-conditional projection head (model/styleUnet.py:514-533)
        for i in range(4):
            out[f"mapping{i}"] = _linear(sd, f"{p}mapping.{i}")
    return out


def convert_volume_decoder(sd: Mapping, prefix: str,
                           final_res: int = 64) -> Dict[str, Dict[str, Any]]:
    """VolumeDecoder -> (params, buffers)."""
    p = (prefix + ".") if prefix else ""
    params: Dict[str, Any] = {}
    num_layers = int(math.log2(final_res))
    for i in range(num_layers):
        w = _np(sd[f"{p}filters.{i}.up.1.weight"])  # [out, in, kd, kh, kw]
        params[f"up{i}_weight"] = w.transpose(2, 3, 4, 1, 0)
        params[f"up{i}_bias"] = _np(sd[f"{p}filters.{i}.up.1.bias"])
    w = _np(sd[f"{p}final_conv.weight"])
    params["final_weight"] = w.transpose(2, 3, 4, 1, 0)
    params["final_bias"] = _np(sd[f"{p}final_conv.bias"])
    buffers = {"init_lc": _np(sd[f"{p}init_lc"]).transpose(0, 2, 3, 4, 1)}
    return {"params": params, "buffers": buffers}


def _n_indexed(sd: Mapping, prefix: str) -> int:
    """Highest integer submodule index under ``prefix.{i}.*`` plus one
    (0 when none) — recovers torch ModuleList lengths from a state dict."""
    n = -1
    pre = prefix + "."
    for k in sd:
        if k.startswith(pre):
            head = k[len(pre):].split(".", 1)[0]
            if head.isdigit():
                n = max(n, int(head))
    return n + 1


def _plane_geom(sd: Mapping, gen: str) -> Dict[str, int]:
    """StyleGAN_zxc geometry from its state-dict keys: middle size from the
    constant input, out_size from the upsampling conv count, inp_size from
    the condition-encoder depth (model/styleUnet.py construction)."""
    middle = int(_np(sd[f"{gen}.input.input"]).shape[-1])
    n_up = _n_indexed(sd, f"{gen}.convs") // 2
    n_enc = _n_indexed(sd, f"{gen}.cond_convs")
    n_mlp = _n_indexed(sd, f"{gen}.style") - 1      # style.0 is PixelNorm
    return {"out_size": middle << n_up, "middle_size": middle,
            "inp_size": 1 << (n_enc + int(math.log2(middle)) + 2),
            "n_mlp": n_mlp}


def _two_head_geom(sd: Mapping, gen: str) -> Dict[str, int]:
    """StyleGAN_zxc_twoHead geometry: trunk convs end at split_size, the
    per-plane ``convs_head`` pyramids continue to out_size."""
    middle = int(_np(sd[f"{gen}.input.input"]).shape[-1])
    split = middle << (_n_indexed(sd, f"{gen}.convs") // 2)
    out_size = split << (_n_indexed(sd, f"{gen}.convs_head") // 2)
    n_enc = _n_indexed(sd, f"{gen}.cond_convs")
    n_mlp = _n_indexed(sd, f"{gen}.style") - 1
    return {"out_size": out_size, "middle_size": middle,
            "split_size": split,
            "inp_size": 1 << (n_enc + int(math.log2(split)) + 1),
            "n_mlp": n_mlp}


def convert_nerf_field(sd: Mapping, prefix: str = "model_coarse",
                       enc_mode: Optional[str] = None) -> Dict[str, Any]:
    """``enc_mode=None`` auto-detects the reference's encoder variant from
    the state-dict keys (model/nerf_model.py:27-41): 'split' builds
    XY_gen + YZ_gen, 'two_head' a single StyleGAN_zxc_twoHead (its
    per-plane heads appear as ``convs_head`` keys), 'shared_backbone' a
    single double-width StyleGAN_zxc. Generator geometry (plane res,
    middle/split sizes, condition resolution) is likewise recovered from
    the keys, so non-default triplane_res checkpoints convert correctly."""
    p = (prefix + ".") if prefix else ""
    if enc_mode is None:
        enc_mode = detect_nerf_enc_mode(sd, prefix)
    if enc_mode == "split":
        gens = {g: convert_plane_generator(sd, f"{p}{g}",
                                           **_plane_geom(sd, f"{p}{g}"))
                for g in ("XY_gen", "YZ_gen")}
    elif enc_mode == "two_head":
        gens = {"XY_gen": convert_two_head_generator(
            sd, f"{p}XY_gen", **_two_head_geom(sd, f"{p}XY_gen"))}
    elif enc_mode == "shared_backbone":
        gens = {"XY_gen": convert_plane_generator(
            sd, f"{p}XY_gen", **_plane_geom(sd, f"{p}XY_gen"))}
    else:
        raise ValueError(f"unknown enc_mode {enc_mode!r}")
    return {
        **gens,
        "layer0": _kernel(_linear(sd, f"{p}layers_xyz.0")),
        "layer1": _kernel(_linear(sd, f"{p}layers_xyz.1")),
        "fc_alpha": _kernel(_linear(sd, f"{p}fc_alpha")),
        "fc_rgbFeat": _kernel(_linear(sd, f"{p}fc_rgbFeat")),
        "fc_rgb": _kernel(_linear(sd, f"{p}fc_rgb")),
    }


def detect_nerf_enc_mode(sd: Mapping, prefix: str = "model_coarse") -> str:
    """The enc_mode a reference state dict was trained with (see
    convert_nerf_field); exposed so loaders can build the matching
    DoublePlaneNeRFField."""
    p = (prefix + ".") if prefix else ""
    if any(k.startswith(f"{p}YZ_gen.") for k in sd):
        return "split"
    if any(k.startswith(f"{p}XY_gen.convs_head.") for k in sd):
        return "two_head"
    return "shared_backbone"


def _kernel(lin: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """EqualLinear-style dict -> flax Dense naming (kernel/bias)."""
    out = {"kernel": lin["weight"]}
    if "bias" in lin:
        out["bias"] = lin["bias"]
    return out


def convert_renderer(sd: Mapping, prefix: str = "") -> Dict[str, Any]:
    """Reference Trainer state_dict -> AvatarRenderer variables + latent codes.

    Returns {"params": ..., "buffers": ..., "latent_codes": np or None,
    "enc_mode": detected variant} — loaders use ``enc_mode`` to build (or
    check) the matching DoublePlaneNeRFField instead of trusting the
    config to agree with the checkpoint.
    """
    p = (prefix + ".") if prefix else ""
    vd = convert_volume_decoder(sd, f"{p}headpose_skin_net.canonical_Wvolume")
    enc_mode = detect_nerf_enc_mode(sd, f"{p}model_coarse")
    variables = {
        "params": {
            "field": convert_nerf_field(sd, f"{p}model_coarse",
                                        enc_mode=enc_mode),
            "skinning": {"canonical_volume": vd["params"]},
        },
        "buffers": {
            "skinning": {"canonical_volume": vd["buffers"]},
        },
    }
    latent = sd.get(f"{p}latent_codes", None)
    return {
        "variables": variables,
        "latent_codes": _np(latent) if latent is not None else None,
        "enc_mode": enc_mode,
    }


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_stage1_checkpoint(path: str) -> Dict[str, Any]:
    ckpt = load_torch_checkpoint(path)
    out = convert_renderer(ckpt["trainer_state_dict"])
    out["iter"] = int(ckpt.get("iter", -1))
    return out


def convert_stage2_checkpoint(path: str) -> Dict[str, Any]:
    ckpt = load_torch_checkpoint(path)
    out = convert_renderer(ckpt["nerf_render"])
    if ckpt.get("latent_codes") is not None:
        out["latent_codes"] = _np(ckpt["latent_codes"])
    out["g"] = {"params": convert_styleunet(ckpt["g"])} if "g" in ckpt else None
    out["d"] = {"params": convert_discriminator(ckpt["d"])} if "d" in ckpt else None
    out["g_ema"] = {"params": convert_styleunet(ckpt["g_ema"])} if "g_ema" in ckpt else None
    out["iter"] = int(ckpt.get("iter", -1))
    return out
