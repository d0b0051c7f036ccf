"""Training-state checkpointing (orbax-backed, npz fallback).

SURVEY.md §5 checkpoint/resume: the reference persists no model state
(there are no models); here trainer params + optimizer state + step
counters checkpoint atomically so embedder/reranker/LM training can
resume. Index snapshots live in index/snapshot.py; this module covers the
jax pytrees that npz flattening handles poorly (optax states with nested
namedtuples).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except ImportError:  # pragma: no cover
        return None


class TrainCheckpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ocp = _orbax()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, step: int, state: Dict[str, Any]) -> str:
        """state: pytree dict, e.g. {"params": ..., "opt_state": ...}."""
        path = self._path(step)
        if self._ocp is not None:
            ckpt = self._ocp.PyTreeCheckpointer()
            ckpt.save(path, jax.device_get(state), force=True)
        else:  # flat-npz fallback
            leaves, treedef = jax.tree_util.tree_flatten(
                jax.device_get(state))
            np.savez_compressed(
                path + ".npz",
                __treedef__=np.frombuffer(
                    repr(treedef).encode(), dtype=np.uint8),
                **{f"leaf_{i}": np.asarray(l)
                   for i, l in enumerate(leaves)})
        return path

    def restore(self, step: Optional[int] = None,
                like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Restore the given (or latest) step. ``like`` provides the tree
        structure for the npz fallback."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self.directory}")
        path = self._path(step)
        if self._ocp is not None and os.path.isdir(path):
            ckpt = self._ocp.PyTreeCheckpointer()
            if like is None:
                return ckpt.restore(path)
            # Without a target, orbax returns namedtuples (optax opt_state)
            # as plain dicts and tx.update breaks after resume — hand it
            # the caller's structure.
            return ckpt.restore(path, item=jax.device_get(like))
        assert like is not None, "npz fallback needs `like` structure"
        with np.load(path + ".npz") as z:
            leaves = [z[f"leaf_{i}"]
                      for i in range(len(z.files) - 1)]
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                steps.append(int(name[5:13]))
        return max(steps) if steps else None
