"""Orbax checkpointing of the full train state.

Replaces the reference's `torch.save(state_dict)` files
(ref image_reid_train.py:111,186,259,328,478,555) AND the separate
center-loss `center_ckpt.pt` (ref losses/center_losses.py:38-39) — here the
loss state (centers + DCC luts + XBM) is part of the one checkpointed pytree,
so continual-phase resume (ref :30-36) needs no side files.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, state: Any, step: Optional[int] = None) -> str:
    """Save a pytree (e.g. ReIDTrainState arrays) to `path` (abs or rel)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    # only array leaves; static fields (apply_fn/tx) are reconstructed by
    # create_train_state on restore.
    arrays = jax.tree_util.tree_map(np.asarray, _array_leaves(state))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, arrays, force=True)
    return path


def _key_tokens(kp) -> tuple:
    """Normalize a tree keypath to structure-agnostic string tokens.

    flax-struct / NamedTuple targets flatten as GetAttrKey entries
    (`.params[...]`) while orbax restores nested dicts (`['params'][...]`);
    comparing raw `keystr` output never matches. Token tuples compare equal
    regardless of the container kind."""
    toks = []
    for entry in kp:
        name = getattr(entry, "name", None)
        if name is None:
            name = getattr(entry, "key", None)
        if name is None:
            name = getattr(entry, "idx", None)
        toks.append(str(name))
    return tuple(toks)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore array leaves into `target`'s structure (strict=False spirit:
    missing/mismatched leaves keep the target's value, like the reference's
    `load_state_dict(strict=False)` at image_reid_train.py:45)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)

    tgt_arrays = _array_leaves(target)
    flat_tgt, treedef = jax.tree_util.tree_flatten_with_path(tgt_arrays)
    res_by_key = {_key_tokens(kp): v for kp, v in
                  jax.tree_util.tree_flatten_with_path(restored)[0]}
    merged, n_key_hit, n_restored = [], 0, 0
    for kp, v in flat_tgt:
        r = res_by_key.get(_key_tokens(kp))
        if r is not None:
            n_key_hit += 1
        if r is not None and np.shape(r) == np.shape(v):
            n_restored += 1
            merged.append(jax.numpy.asarray(r, dtype=v.dtype)
                          if hasattr(v, "dtype") else r)
        else:
            merged.append(v)  # strict=False: keep target on miss/mismatch
    if flat_tgt and n_key_hit == 0:
        raise ValueError(
            f"restore_checkpoint({path}): no checkpoint leaf matched the "
            f"target structure ({len(flat_tgt)} target leaves) — refusing to "
            "silently return fresh-init values")
    if len(flat_tgt) > 1 and n_restored == 0:
        # a single-leaf mismatch is the legitimate classifier-resize recovery
        # (ref image_reid_inference.py:220-233); a whole model of key hits
        # with zero shape matches means the checkpoint was written for a
        # different configuration (e.g. width/base/num_classes).
        raise ValueError(
            f"restore_checkpoint({path}): {n_key_hit} leaves matched by key "
            "but EVERY shape mismatched — wrong model configuration; "
            "refusing to silently return fresh-init values")
    arrays = jax.tree_util.tree_unflatten(treedef, merged)
    return _merge_arrays(target, arrays)


def _array_leaves(state: Any) -> Any:
    """Drop non-array leaves (callables, optimizers) from a pytree."""
    def keep(x):
        return x if isinstance(x, (np.ndarray, jax.Array, int, float)) or \
            hasattr(x, "shape") else None
    return jax.tree_util.tree_map(keep, state)


def _merge_arrays(target: Any, arrays: Any) -> Any:
    def pick(t, a):
        return t if a is None else a
    return jax.tree_util.tree_map(pick, target, arrays,
                                  is_leaf=lambda x: x is None)
