"""Index snapshot/restore.

The reference's durability is the Postgres server (SURVEY.md §5
checkpoint/resume: "index shards + centroids + learned weights checkpointed
via orbax-style arrays"). Here every index exposes ``state_dict()`` /
``from_state_dict()`` and this module persists those as compressed .npz +
JSON metadata under a snapshot directory — cheap, dependency-free, and
byte-stable for tests.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_state(path: str, name: str, state: dict) -> str:
    """Persist one component's state dict. Arrays -> .npz, scalars -> json."""
    os.makedirs(path, exist_ok=True)
    arrays, meta = {}, {}
    for key, val in state.items():
        if isinstance(val, np.ndarray):
            arrays[key] = val
        else:
            meta[key] = val
    np.savez_compressed(os.path.join(path, f"{name}.npz"), **arrays)
    with open(os.path.join(path, f"{name}.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    return path


def load_state(path: str, name: str) -> dict:
    with open(os.path.join(path, f"{name}.json")) as f:
        state = json.load(f)
    with np.load(os.path.join(path, f"{name}.npz"), allow_pickle=False) as z:
        for key in z.files:
            state[key] = z[key]
    return state


def exists(path: str, name: str) -> bool:
    return (os.path.exists(os.path.join(path, f"{name}.json"))
            and os.path.exists(os.path.join(path, f"{name}.npz")))
