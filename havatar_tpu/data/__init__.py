"""Data layer (L3): JSON-split dataset + host-side ray/condition pipeline."""

from havatar_tpu.data.dataset import (
    AvatarDataset,
    Loader,
    infinite,
    inv_head_transform,
    load_render_cond,
)
from havatar_tpu.data.prefetch import device_prefetch
