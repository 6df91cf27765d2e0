"""Partial pytree loading (spec analogue: ``load_partial_state_dict``,
reference utils/training_util.py:124-139 — load every matching key, skip
mismatches/exclusions; used to load a trainer minus latent_codes at
inference, avatarHD_reenactment.py:141)."""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import jax
import numpy as np


def merge_partial(target: Any, source: Any,
                  except_paths: Iterable[str] = ()) -> Tuple[Any, list, list]:
    """Copy leaves from ``source`` into ``target`` wherever the path exists
    and the shape matches. Returns (merged, loaded_paths, skipped_paths)."""
    except_paths = tuple(except_paths)
    flat_t = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(target)[0]}
    flat_s = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(source)[0]}

    loaded, skipped = [], []
    out = dict(flat_t)
    for k, v in flat_t.items():
        if any(e in k for e in except_paths):
            skipped.append(k)
            continue
        if k in flat_s and np.shape(flat_s[k]) == np.shape(v):
            out[k] = flat_s[k]
            loaded.append(k)
        else:
            skipped.append(k)

    treedef = jax.tree_util.tree_structure(target)
    keys = [jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(target)[0]]
    merged = jax.tree_util.tree_unflatten(treedef, [out[k] for k in keys])
    return merged, loaded, skipped
