"""Checkpoint / resume for streaming receiver state.

The reference has no checkpointing (SURVEY §5.4) but its state is small and
explicit; in this framework the complete streaming state is one pytree, so
checkpointing is serialization.  Format: npz of flattened leaves + treedef
repr check — dependency-free, works for any ReceiverState (mono/stereo/RDS,
any batch shape).
"""

from __future__ import annotations

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize a receiver-state pytree to an .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.array(str(treedef))
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_state(path: str, like) -> object:
    """Restore a pytree saved by save_state.  `like` provides the structure
    (e.g. rx.init_state(batch_shape)); shapes are validated leaf-by-leaf."""
    with np.load(path, allow_pickle=False) as data:
        leaves_like, treedef = jax.tree.flatten(like)
        if "__treedef__" in data:
            saved_td = str(data["__treedef__"])
            if saved_td != str(treedef):
                raise ValueError(
                    "checkpoint structure mismatch:\n"
                    f"  saved:    {saved_td}\n"
                    f"  expected: {treedef}")
        n = len(leaves_like)
        saved = [data[f"leaf_{i}"] for i in range(n)]
        for i, (s, l) in enumerate(zip(saved, leaves_like)):
            if s.shape != np.asarray(l).shape:
                raise ValueError(
                    f"leaf {i}: saved shape {s.shape} != expected "
                    f"{np.asarray(l).shape}")
        return jax.tree.unflatten(treedef, saved)
