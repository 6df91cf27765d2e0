"""Collective/communication helpers over ICI/DCN.

Mirrors the API surface of the reference's torch.distributed shim
(dataloader/dist_util.py:6-133 — get_rank, get_world_size, synchronize,
all_gather, reduce_sum, reduce_loss_dict, gather_grad) with JAX-native
semantics:

* inside pjit/shard_map: ``psum``/``pmean``/``all_gather`` over a named mesh
  axis (XLA lowers these to ICI collectives);
* at the host level: ``jax.process_index``/``jax.process_count`` and
  ``multihost_utils`` for cross-host sync. Barriers are implicit in SPMD —
  ``synchronize`` exists for host-side phases (checkpoint writes etc.).

gradient all-reduce never appears explicitly: data-parallel pjit inserts it.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def initialize(**kwargs) -> None:
    """Multi-host init (no-op on a single process). Safe to call always."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    try:
        if kwargs:
            jax.distributed.initialize(**kwargs)
    except Exception:
        pass


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Host-level barrier (spec analogue: dist_util.synchronize)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("havatar_tpu.sync")


# ---- in-program collectives (use inside shard_map/pjit bodies) -----------

def reduce_sum(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    return jax.lax.psum(x, axis_name)


def reduce_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    return jax.lax.pmean(x, axis_name)


def all_gather(x: jnp.ndarray, axis_name: str = "data", axis: int = 0) -> jnp.ndarray:
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def reduce_loss_dict(losses: Dict[str, jnp.ndarray],
                     axis_name: str = "data") -> Dict[str, jnp.ndarray]:
    """Mean-reduce every loss across the mesh axis
    (spec analogue: dist_util.reduce_loss_dict:111-133)."""
    return {k: jax.lax.pmean(v, axis_name) for k, v in losses.items()}


# ---- host-level gathers ----------------------------------------------------

def process_allgather(x: Any):
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)
