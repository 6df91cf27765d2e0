"""Model cores (layer L2): StyleGAN blocks, plane generators, NeRF field,
skinning field, SR generator, discriminator, and the avatar renderer."""

from havatar_tpu.models.blocks import (
    ConstantInput,
    ConvBlock,
    ConvLayer,
    EqualConv2d,
    EqualLinear,
    FromRGB,
    ModulatedConv2d,
    NoiseInjection,
    StyledConv,
    ToRGB,
    minibatch_stddev,
    pixel_norm,
)
from havatar_tpu.models.generators import (
    PlaneGenerator,
    StyleMLP,
    StyleUNetSR,
    TwoHeadPlaneGenerator,
    channel_map,
)
from havatar_tpu.models.discriminator import WaveletDiscriminator
from havatar_tpu.models.nerf_field import DoublePlaneNeRFField
from havatar_tpu.models.skinning import (
    SkinningField,
    VolumeDecoder,
    fix_canonical_volume,
    make_volume_pts,
)
from havatar_tpu.models.renderer import AvatarRenderer, latent_code_loss
