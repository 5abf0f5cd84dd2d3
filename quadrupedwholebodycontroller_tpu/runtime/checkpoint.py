"""Checkpoint / resume for long scenario sweeps (SURVEY.md §5).

The reference is stateless across runs (rosbags are logs, not checkpoints);
for long batched sweeps we serialize the full rollout carry — sim state, WBC
carry (including QP hotstart memory), planner state, held reference — as a
flat npz keyed by the pytree structure, so a sweep can resume bit-exactly.
"""
from __future__ import annotations

import json

import jax
import numpy as np


def save_pytree(path: str, tree, meta: dict | None = None):
    leaves, treedef = jax.tree.flatten(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    if meta:
        payload["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path, **payload)


def load_pytree(path: str, like):
    """Restore a checkpoint into the structure of `like` (same treedef)."""
    leaves_like, treedef = jax.tree.flatten(like)
    with np.load(path) as f:
        saved_def = bytes(f["__treedef__"]).decode()
        if saved_def != str(treedef):
            raise ValueError(
                "checkpoint treedef mismatch:\n saved: "
                f"{saved_def}\n expected: {treedef}"
            )
        leaves = [f[f"leaf_{i}"] for i in range(len(leaves_like))]
    import jax.numpy as jnp

    leaves = [
        jnp.asarray(l, dtype=ll.dtype) for l, ll in zip(leaves, leaves_like)
    ]
    return jax.tree.unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    with np.load(path) as f:
        if "__meta__" not in f:
            return {}
        return json.loads(bytes(f["__meta__"]).decode())
