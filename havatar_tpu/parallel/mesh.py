"""Device mesh construction and sharding rules.

The reference's only parallelism is vestigial torch.distributed scaffolding
(dataloader/dist_util.py, never initialized) plus serial ray chunking
(model/nerf_trainer.py:66-71). Here parallelism is first-class SPMD:

* one `jax.sharding.Mesh`, default a single ``data`` axis over all chips
  (v5e-8), extensible to ('dcn', 'data') for multi-slice without touching
  model code;
* training shards the frame/batch axis (data parallel — gradient psum is
  inserted by the compiler);
* inference shards the RAY axis of a frame across the mesh — the TPU-native
  replacement for the reference's serial 4096-ray chunks. Plane generation is
  replicated (it is per-frame, cheap); the ray march is embarrassingly
  parallel over rays, so the only collective is the final gather, which rides
  ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/frame) axis."""
    return NamedSharding(mesh, P(axis))


def ray_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the ray axis of [B, R, ...] tensors."""
    return NamedSharding(mesh, P(None, axis))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a host pytree on the mesh, sharded along the leading axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


#: batch keys carrying a [B, R, ...] ray axis — safe to shard on axis 1 when
#: the frame axis doesn't divide the mesh (conv-bearing image tensors are
#: NOT listed: sharding their spatial axes would force halo exchanges)
RAY_AXIS_KEYS = ("mv_rays", "gt_color")


def auto_batch_shardings(mesh: Mesh, example: dict, axis: str = "data",
                         ray_keys=RAY_AXIS_KEYS) -> dict:
    """Per-key NamedShardings for a training batch.

    Shards the leading (frame) axis when it divides the mesh; otherwise
    falls back to the ray axis (axis 1) for ``ray_keys`` — the TPU-native
    version of the reference's serial ray chunking — and replicates the
    rest. This keeps the reference operating point (batch 2) sharded on a
    v5e-8 while scaling to true data-parallel when batch % n_devices == 0.
    """
    n = int(np.prod([mesh.shape[a] for a in (axis if isinstance(axis, tuple)
                                             else (axis,))]))
    out = {}
    for k, v in example.items():
        shape = getattr(v, "shape", ())
        if len(shape) >= 1 and shape[0] % n == 0 and shape[0] > 0:
            out[k] = NamedSharding(mesh, P(axis))
        elif (k in ray_keys and len(shape) >= 2 and shape[1] % n == 0):
            out[k] = NamedSharding(mesh, P(None, axis))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


def pad_to_multiple(x, multiple: int, axis: int):
    """Pad an axis up to a multiple (static shapes for even sharding)."""
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(np.asarray(x), pad), size
