"""Stream-state checkpointing — the streaming analog of train-state
checkpoint/resume (SURVEY.md §5: the reference has none; its only persistent
state is config.yaml).

Serializes any state pytree (StabilizerState, ChainState, batched
multi-stream states, model params) to a single .npz with the tree structure
stored alongside, so a live stream can be snapshotted, migrated to another
host/chip, and resumed bit-exactly (verified by
tests/test_core.py::test_state_roundtrip via Stabilizer.state_dict and
test_utils.py::TestCheckpoint for the file round-trip).
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_state(state, path: str) -> None:
    """Write a state pytree to ``path`` (.npz + treedef json)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, template):
    """Load a pytree saved by save_state into ``template``'s structure.

    The template (e.g. a freshly-initialized state) supplies the treedef;
    leaf count and shapes must match the saved snapshot.
    """
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    n = len(leaves_t)
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    for i, (a, b) in enumerate(zip(leaves, leaves_t)):
        if hasattr(b, "shape") and tuple(a.shape) != tuple(b.shape):
            raise ValueError(
                f"leaf {i}: snapshot shape {a.shape} != template {b.shape}")
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves])
