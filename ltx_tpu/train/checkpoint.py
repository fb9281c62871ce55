"""Training checkpoint save/resume — adapters + optimizer state.

Mirrors the inference side's resume story (SURVEY §5.4: weight cache +
DenoiseCheckpoint) for training runs: the frozen base is reproducible from
the weight cache, so a checkpoint stores only the TRAINABLE leaves and the
optax state (adapter-sized in LoRA-only mode), plus the step counter.

Format: one .npz of flattened key paths (pure numpy — no framework pickle,
loadable anywhere). Restore is template-shaped: the caller provides the
live (trainable, opt_state) pytrees (from init_train_state) and gets the
same structures with stored values — structure mismatches raise.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np


def _flatten(tree, prefix: str):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        out[prefix + jax.tree_util.keystr(path)] = np.asarray(leaf)
    return out


def _restore(tree, store: dict, prefix: str):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    new = []
    for path, leaf in leaves:
        key = prefix + jax.tree_util.keystr(path)
        if key not in store:
            raise KeyError(
                f"checkpoint missing {key!r} — template structure does not "
                "match the saved run (same TrainConfig/rank/targets?)")
        val = store[key]
        if tuple(val.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint {key!r} shape {val.shape} != template "
                f"{np.shape(leaf)}")
        new.append(jax.numpy.asarray(val, dtype=leaf.dtype)
                   if hasattr(leaf, "dtype") else type(leaf)(val))
    return jax.tree_util.tree_unflatten(treedef, new)


def save_train_checkpoint(path, trainable, opt_state, step: int) -> int:
    """Write trainable + opt_state + step to `path` (.npz). Returns the
    number of stored arrays.

    Atomic: writes a pid-unique temp file then os.replace, so a crash
    mid-write (or a concurrent writer on shared storage) never leaves a
    truncated .npz at `path`.
    """
    import os

    store = {"__step__": np.asarray(step, np.int64)}
    store.update(_flatten(trainable, "t"))
    store.update(_flatten(opt_state, "o"))
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **store)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return len(store)


def load_train_checkpoint(path, trainable, opt_state) -> Tuple[Any, Any, int]:
    """-> (trainable, opt_state, step) with stored values in the templates'
    structure (templates from init_train_state on the same config)."""
    with np.load(path) as z:
        store = {k: z[k] for k in z.files}
    step = int(store.pop("__step__"))
    return (_restore(trainable, store, "t"),
            _restore(opt_state, store, "o"), step)
