"""Condition-plane generator and StyleUNet super-resolution generator.

Behavioral specs:
* ``PlaneGenerator`` == reference ``StyleGAN_zxc`` (model/styleUnet.py:631-878)
  in its default operating point: conditioning-image encoder + StyleGAN2
  synthesis trunk with encoder-feature injection, ``zero_latent=False,
  zero_noise=True, no_skip=True`` (instantiated at model/nerf_model.py:39-42).
  The 'two_head' variant is ``TwoHeadPlaneGenerator`` below; 'shared_backbone'
  reuses ``PlaneGenerator`` with doubled out_ch (see DoublePlaneNeRFField —
  the reference's own shared-backbone construction at model/nerf_model.py:33
  omits ``no_skip=True`` and would mis-shape the plane split; we implement
  the intended semantics).
* ``StyleUNetSR`` == reference ``SWGAN_unet`` (model/styleUnet.py:1190-1415):
  U-Net encoder over the NeRF feature image + wavelet-domain StyleGAN2
  decoder, final inverse Haar to 2x the last feature resolution.

Everything is NHWC, jit-friendly (static shapes, python loops over a static
layer list), and RNG-explicit: noise is deterministic unless an rng is given.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from havatar_tpu.models.blocks import (
    ConstantInput,
    ConvBlock,
    ConvLayer,
    EqualLinear,
    FromRGB,
    StyledConv,
    ToRGB,
    pixel_norm,
)
from havatar_tpu.ops import inverse_haar_transform


def channel_map(channel_multiplier: int = 2) -> Dict[int, int]:
    """StyleGAN2 per-resolution channel widths (model/styleUnet.py:654-664)."""
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class StyleMLP(nn.Module):
    """PixelNorm + n_mlp EqualLinear(fused_lrelu, lr_mul) mapping network."""

    in_dim: int
    hidden_dim: int
    n_mlp: int
    lr_mul: float = 0.01

    @nn.compact
    def __call__(self, z):
        x = pixel_norm(z)
        for i in range(self.n_mlp):
            x = EqualLinear(
                self.hidden_dim, lr_mul=self.lr_mul,
                activation="fused_lrelu", name=f"fc{i}",
            )(x)
        return x


class PlaneGenerator(nn.Module):
    """Conditioned StyleGAN feature-plane generator (see module docstring).

    Call: (styles [B, style_dim], cond_img [B, inp_size, inp_size, inp_ch])
      -> feature plane [B, out_size, out_size, out_ch].
    """

    out_ch: int
    out_size: int = 128
    style_dim: int = 44          # z input dim (latent 32 + pose 12)
    mlp_dim: int = 32            # w space dim (reference mlp_dim default)
    n_mlp: int = 4
    middle_size: int = 16
    inp_size: int = 256
    inp_ch: int = 7
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    zero_noise: bool = True
    no_skip: bool = True
    compute_dtype: str = "float32"   # "bfloat16" for MXU-speed inference

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size))

    @property
    def middle_log_size(self) -> int:
        return int(math.log2(self.middle_size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - (self.middle_log_size * 2 - 1) + 1

    @nn.compact
    def __call__(self, styles, cond_img, noise_rng: Optional[jax.Array] = None):
        ch = channel_map(self.channel_multiplier)
        B = cond_img.shape[0]
        cdt = jnp.dtype(self.compute_dtype)
        styles = styles.astype(cdt)
        cond_img = cond_img.astype(cdt)

        w = StyleMLP(self.style_dim, self.mlp_dim, self.n_mlp,
                     self.lr_mlp, name="style")(styles)
        latent = jnp.tile(w[:, None, :], (1, self.n_latent, 1))

        # ---- conditioning-image encoder (model/styleUnet.py:671-685,834-844)
        enc_stages = list(range(int(math.log2(self.inp_size)) - 2,
                                self.middle_log_size, -1))
        in_channel = ch[self.inp_size // 2]
        cond_img_cur = cond_img
        cond_out = ConvLayer(in_channel, 3, downsample=True, name="conv_in")(cond_img_cur)
        cond_list = [cond_out]
        comb_channels = [in_channel]
        for si, i in enumerate(enc_stages):
            out_channel = ch[2**i]
            cond_img_cur, cond_out = FromRGB(
                in_channel, downsample=True, use_wt=False, name=f"from_rgb{si}",
            )(cond_img_cur, cond_out)
            cond_out = ConvBlock(in_channel, out_channel, name=f"cond_conv{si}")(cond_out)
            cond_list.append(cond_out)
            comb_channels.append(out_channel)
            in_channel = out_channel

        # ---- synthesis trunk (model/styleUnet.py:692-731, 845-873)
        num_up = self.log_size - self.middle_log_size
        num_layers = num_up * 2 + 1

        out = ConstantInput(ch[self.middle_size], size=self.middle_size,
                            name="input")(B).astype(cdt)
        rngs = (
            list(jax.random.split(noise_rng, num_layers))
            if (noise_rng is not None and not self.zero_noise) else [None] * num_layers
        )
        out = StyledConv(ch[self.middle_size], ch[self.middle_size], 3,
                         name="conv_first")(out, latent[:, 0], rng=rngs[0])

        skip = None
        if not self.no_skip:
            skip = ToRGB(ch[self.middle_size], out_channel=self.out_ch * 4,
                         upsample=False, use_wt=False, name="to_rgb1")(out, latent[:, 1])

        in_channel = ch[self.middle_size]
        i = 1
        for stage, res_log in enumerate(range(self.middle_log_size + 1, self.log_size + 1)):
            out_channel = ch[2**res_log]
            if 1 < i <= (2 * len(cond_list) + 1):
                inj = cond_list[-(i // 2)]
                out = jnp.concatenate([out, inj], axis=-1)
                ci = len(comb_channels) - (i // 2)
                out = ConvLayer(comb_channels[ci], 3, name=f"comb_conv{ci}")(out)
            out = StyledConv(in_channel, out_channel, 3, upsample=True,
                             name=f"conv{2 * stage}")(out, latent[:, i], rng=rngs[2 * stage + 1])
            out = StyledConv(out_channel, out_channel, 3,
                             name=f"conv{2 * stage + 1}")(out, latent[:, i + 1], rng=rngs[2 * stage + 2])
            if not self.no_skip:
                skip = ToRGB(out_channel, out_channel=self.out_ch * 4,
                             use_wt=False, name=f"to_rgb{stage}")(out, latent[:, i + 2], skip)
            i += 2
            in_channel = out_channel

        # planes stay in the compute dtype: the consumer (triplane sampling)
        # is gather-bandwidth-bound, so bf16 planes halve its HBM traffic
        if self.no_skip:
            return ConvLayer(self.out_ch, 1, name="conv_out")(out)
        return skip


class TwoHeadPlaneGenerator(nn.Module):
    """Two-head condition-plane generator: one latent-driven synthesis trunk
    up to ``split_size``, then two condition-encoder-injected heads that each
    upsample to ``out_size`` — producing BOTH feature planes from shared
    low-resolution structure.

    Behavioral spec: reference ``StyleGAN_zxc_twoHead``
    (model/styleUnet.py:881-1187) at its nerf_model.py:36-37 operating point
    (``middle_size=8, split_size=32, zero_latent=False, zero_noise=True,
    no_skip=True``). Two reference quirks intentionally NOT rebuilt: the
    per-head FromRGB pyramids are constructed but never called (their forward
    use is commented out, model/styleUnet.py:1129/1164), and ``zero_noise``'s
    first entry is ``torch.randn`` rather than zeros (:1031) — inert either
    way because NoiseInjection weights start at 0; this module is
    deterministic-noise like ``PlaneGenerator``.

    Call: (styles [B, style_dim], cond_front [B, S, S, inp_ch[0]],
           cond_side [B, S, S, inp_ch[1]])
      -> (plane0, plane1), each [B, out_size, out_size, out_ch].
    """

    out_ch: int
    out_size: int = 128
    style_dim: int = 44
    mlp_dim: int = 32
    n_mlp: int = 4
    middle_size: int = 8
    split_size: int = 32
    inp_size: int = 256
    inp_ch: Sequence[int] = (7, 13)
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    compute_dtype: str = "float32"

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size))

    @property
    def middle_log_size(self) -> int:
        return int(math.log2(self.middle_size))

    @property
    def split_log_size(self) -> int:
        return int(math.log2(self.split_size))

    @property
    def n_latents(self) -> List[int]:
        """Per-section w counts: [trunk, head0, head1]
        (model/styleUnet.py:1015-1016)."""
        n_head = self.log_size * 2 - self.split_log_size * 2
        return [self.split_log_size * 2 - self.middle_log_size * 2 + 1,
                n_head, n_head]

    @nn.compact
    def __call__(self, styles, cond_front, cond_side):
        # misconfiguration guard: at out_size <= split_size the head loops
        # are empty, both planes collapse to a 1x1 conv of the shared trunk
        # and the condition images are silently ignored; likewise the
        # injecting encoder needs at least one stage above split_size
        assert self.out_size > self.split_size, (
            f"TwoHeadPlaneGenerator: out_size ({self.out_size}) must exceed "
            f"split_size ({self.split_size}) or the per-plane heads are "
            f"empty and the condition images have no effect")
        assert self.inp_size // 2 >= self.split_size, (
            f"TwoHeadPlaneGenerator: inp_size ({self.inp_size}) must be >= "
            f"2*split_size ({2 * self.split_size}) for a non-empty condition "
            f"encoder")
        ch = channel_map(self.channel_multiplier)
        B = cond_front.shape[0]
        cdt = jnp.dtype(self.compute_dtype)
        styles = styles.astype(cdt)
        conds = [cond_front.astype(cdt), cond_side.astype(cdt)]

        w = StyleMLP(self.style_dim, self.mlp_dim, self.n_mlp,
                     self.lr_mlp, name="style")(styles)
        n0, n_head, _ = self.n_latents
        latent = jnp.tile(w[:, None, :], (1, n0 + 2 * n_head, 1))

        # ---- shared trunk: middle_size -> split_size (styleUnet.py:1105-1120)
        out = ConstantInput(ch[self.middle_size], size=self.middle_size,
                            name="input")(B).astype(cdt)
        out = StyledConv(ch[self.middle_size], ch[self.middle_size], 3,
                         name="conv_first")(out, latent[:, 0])
        in_channel = ch[self.middle_size]
        i = 1
        for stage, res_log in enumerate(
                range(self.middle_log_size + 1, self.split_log_size + 1)):
            out_channel = ch[2**res_log]
            out = StyledConv(in_channel, out_channel, 3, upsample=True,
                             name=f"conv{2 * stage}")(out, latent[:, i])
            out = StyledConv(out_channel, out_channel, 3,
                             name=f"conv{2 * stage + 1}")(out, latent[:, i + 1])
            i += 2
            in_channel = out_channel
        trunk_out, trunk_channel = out, in_channel

        # ---- two condition encoders + synthesis heads
        enc_stages = list(range(int(math.log2(self.inp_size)) - 2,
                                self.split_log_size - 1, -1))
        planes = []
        for k in range(2):
            # encoder (styleUnet.py:927-951; FromRGB pyramid unused, see
            # docstring): strided conv-in then ConvBlock downsampling chain
            in_channel = ch[self.inp_size // 2]
            cond_out = ConvLayer(in_channel, 3, downsample=True,
                                 name=f"conv_in{k}")(conds[k])
            cond_list = [cond_out]
            comb_channels = [in_channel]
            for si, res_log in enumerate(enc_stages):
                out_channel = ch[2**res_log]
                cond_out = ConvBlock(in_channel, out_channel,
                                     name=f"cond_conv{k}_{si}")(cond_out)
                cond_list.append(cond_out)
                comb_channels.append(out_channel)
                in_channel = out_channel

            # head: split_size -> out_size with encoder-feature injection
            # BEFORE each upsample pair (styleUnet.py:1134-1146)
            out, in_channel = trunk_out, trunk_channel
            base = n0 + k * n_head
            i = 0
            for stage, res_log in enumerate(
                    range(self.split_log_size + 1, self.log_size + 1)):
                out_channel = ch[2**res_log]
                ci = len(comb_channels) - 1 - (i // 2)
                out = jnp.concatenate([out, cond_list[ci]], axis=-1)
                out = ConvLayer(comb_channels[ci], 3,
                                name=f"comb_conv{k}_{ci}")(out)
                out = StyledConv(comb_channels[ci], out_channel, 3,
                                 upsample=True, name=f"head{k}_conv{2 * stage}",
                                 )(out, latent[:, base + i])
                out = StyledConv(out_channel, out_channel, 3,
                                 name=f"head{k}_conv{2 * stage + 1}",
                                 )(out, latent[:, base + i + 1])
                i += 2
                in_channel = out_channel
            planes.append(ConvLayer(self.out_ch, 1, name=f"conv_out{k}")(out))
        return planes[0], planes[1]


class StyleUNetSR(nn.Module):
    """StyleUNet super-resolution generator (see module docstring).

    Call: (styles [B, style_dim] or list of 1-2 for mixing,
           cond_img [B, inp_size, inp_size, inp_ch])
      -> [B, out_size, out_size, out_ch].
    """

    inp_size: int = 128
    inp_ch: int = 64
    out_ch: int = 3
    out_size: int = 512
    style_dim: int = 64
    n_mlp: int = 4
    middle_size: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    compute_dtype: str = "float32"   # "bfloat16" for MXU-speed inference

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size)) - 1

    @property
    def middle_log_size(self) -> int:
        return int(math.log2(self.middle_size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - (self.middle_log_size * 2 - 1) + 1

    @nn.compact
    def __call__(
        self,
        styles,
        cond_img,
        noise_rng: Optional[jax.Array] = None,
        input_is_latent: bool = False,
        inject_index: Optional[int] = None,
    ):
        ch = channel_map(self.channel_multiplier)
        B = cond_img.shape[0]
        cdt = jnp.dtype(self.compute_dtype)
        cond_img = cond_img.astype(cdt)
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        styles = [s.astype(cdt) for s in styles]

        style_mlp = StyleMLP(self.style_dim, self.style_dim, self.n_mlp,
                             self.lr_mlp, name="style")
        if not input_is_latent:
            styles = [style_mlp(s) for s in styles]

        if len(styles) < 2:
            latent = jnp.tile(styles[0][:, None, :], (1, self.n_latent, 1))
        else:
            # inject_index may be a traced array (style mixing under jit)
            idx = self.n_latent // 2 if inject_index is None else inject_index
            pos = jnp.arange(self.n_latent)[None, :, None]
            latent = jnp.where(pos < idx, styles[0][:, None, :],
                               styles[1][:, None, :])

        # ---- U-Net encoder (model/styleUnet.py:1238-1253, 1379-1388)
        enc_stages = list(range(int(math.log2(self.inp_size)) - 2,
                                self.middle_log_size - 1, -1))
        in_channel = ch[self.inp_size // 2]
        comb_channels = [in_channel]
        cond_img_cur = cond_img
        cond_out = ConvLayer(in_channel, 3, downsample=True, name="conv_in")(cond_img_cur)
        cond_list = [cond_out]
        for si, i in enumerate(enc_stages):
            out_channel = ch[2**i]
            cond_img_cur, cond_out = FromRGB(
                in_channel, downsample=True, use_wt=False, name=f"from_rgb{si}",
            )(cond_img_cur, cond_out)
            cond_out = ConvBlock(in_channel, out_channel, name=f"cond_conv{si}")(cond_out)
            cond_list.append(cond_out)
            comb_channels.append(out_channel)
            in_channel = out_channel

        n_comb = len(comb_channels)

        # ---- wavelet decoder (model/styleUnet.py:1273-1296, 1393-1409)
        num_layers = (self.log_size - self.middle_log_size) * 2
        rngs = (
            list(jax.random.split(noise_rng, num_layers))
            if noise_rng is not None else [None] * num_layers
        )

        in_channel = ch[self.middle_size]
        skip = None
        out = None
        i = 0
        for stage, res_log in enumerate(range(self.middle_log_size + 1, self.log_size + 1)):
            out_channel = ch[2**res_log]
            if i == 0:
                out = ConvLayer(comb_channels[-1], 3,
                                name=f"comb_conv{n_comb - 1}")(cond_list[-1])
            elif i < 2 * n_comb:
                ci = n_comb - 1 - (i // 2)
                out = jnp.concatenate([out, cond_list[ci]], axis=-1)
                out = ConvLayer(comb_channels[ci], 3, name=f"comb_conv{ci}")(out)
            out = StyledConv(in_channel, out_channel, 3, upsample=True,
                             name=f"conv{2 * stage}")(out, latent[:, i], rng=rngs[2 * stage])
            out = StyledConv(out_channel, out_channel, 3,
                             name=f"conv{2 * stage + 1}")(out, latent[:, i + 1], rng=rngs[2 * stage + 1])
            skip = ToRGB(out_channel, out_channel=self.out_ch * 4,
                         name=f"to_rgb{stage}")(out, latent[:, i + 2], skip)
            i += 2
            in_channel = out_channel

        return inverse_haar_transform(skip.astype(jnp.float32))
