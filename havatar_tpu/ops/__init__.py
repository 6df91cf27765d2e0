"""TPU-native numerics ops (layer L0/L1 of the framework)."""

from havatar_tpu.ops.upfirdn2d import (
    upfirdn2d,
    make_kernel,
    upsample2d,
    downsample2d,
    blur,
    haar_transform,
    inverse_haar_transform,
)
from havatar_tpu.ops.fused_act import fused_leaky_relu
from havatar_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_2d_quad,
    grid_sample_3d,
    sample_from_triplane,
    sample_image_features,
)
from havatar_tpu.ops.boxwarp import BoxWarp, BoxWarpLegacy, get_box_warp_param
from havatar_tpu.ops.embedding import positional_encoding, posenc_dim
from havatar_tpu.ops.sh import eval_sh
from havatar_tpu.ops.volume_render import (
    cumprod_exclusive,
    volume_render_radiance_field,
    sample_pdf,
)
from havatar_tpu.ops.rays import (
    get_rays,
    get_rays_np,
    head_world_aabb,
    intrinsics_to_K,
    make_ray_importance_sampling_map,
    perspective_project,
    project_multiview,
    ray_aabb_near_far,
    tighten_ray_near_far,
)
