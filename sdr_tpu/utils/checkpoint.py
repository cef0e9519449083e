"""Checkpoint / resume for streaming receiver state.

The reference has no checkpointing (SURVEY §5.4) but its state is small and
explicit; in this framework the complete streaming state is one pytree, so
checkpointing is serialization.  Format (v2): npz of flattened leaves plus a
*structural* manifest — one key-path string and dtype per leaf, derived from
`jax.tree_util.tree_flatten_with_path` — and a format-version field.

Cross-version safety: key paths are built from the pytree's own field names
(dict keys / dataclass fields / sequence indices), which are part of this
package's state definition, NOT of JAX's treedef repr (which is an unstable
debugging string that may change between JAX versions).  A v2 checkpoint
therefore validates identically across JAX upgrades as long as the state
*definition* is unchanged.  v1 checkpoints (which stored `str(treedef)`) are
still loadable: the repr check is skipped and validation falls back to leaf
count + shape checks.
"""

from __future__ import annotations

import jax
import numpy as np

FORMAT_VERSION = 2


def _leaf_paths(tree) -> list[str]:
    """Stable per-leaf key-path strings for a pytree (structure manifest)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(path) for path, _ in flat]


def save_state(path: str, state) -> None:
    """Serialize a receiver-state pytree to an .npz file.

    bfloat16 leaves (the fast engines' materialization dtype) are stored
    as their uint16 bit patterns — numpy's npz would otherwise write them
    as opaque void records — with the true dtype recorded in the
    manifest for the load-side view back."""
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    paths = [jax.tree_util.keystr(p) for p, _ in flat]
    leaves = [np.asarray(l) for _, l in flat]
    dtypes = [str(l.dtype) for l in leaves]
    leaves = [l.view(np.uint16) if l.dtype.kind == "V" or
              str(l.dtype) == "bfloat16" else l for l in leaves]
    arrays = {f"leaf_{i}": l for i, l in enumerate(leaves)}
    arrays["__format_version__"] = np.array(FORMAT_VERSION)
    arrays["__paths__"] = np.array(paths)
    arrays["__dtypes__"] = np.array(dtypes)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_state(path: str, like) -> object:
    """Restore a pytree saved by save_state.  `like` provides the structure
    (e.g. rx.init_state(batch_shape)); key paths, shapes and dtypes are
    validated leaf-by-leaf against it."""
    with np.load(path, allow_pickle=False) as data:
        leaves_like, treedef = jax.tree.flatten(like)
        n = len(leaves_like)
        if "__paths__" in data:  # v2: structural manifest
            saved_paths = [str(p) for p in data["__paths__"]]
            want_paths = _leaf_paths(like)
            if saved_paths != want_paths:
                missing = [p for p in want_paths if p not in saved_paths]
                extra = [p for p in saved_paths if p not in want_paths]
                raise ValueError(
                    "checkpoint structure mismatch:\n"
                    f"  leaves only in checkpoint: {extra}\n"
                    f"  leaves only in expected state: {missing}"
                    if (missing or extra) else
                    "checkpoint structure mismatch: same leaf set, "
                    f"different order:\n  saved:    {saved_paths}\n"
                    f"  expected: {want_paths}")
        # v1 checkpoints carried str(treedef); that repr is not stable across
        # JAX versions, so it is deliberately NOT compared — shape checks below
        # still gate the load.
        saved = [data[f"leaf_{i}"] for i in range(n)]
        if f"leaf_{n}" in data:
            raise ValueError(
                f"checkpoint has more than the expected {n} leaves")
        if "__dtypes__" in data:
            # restore bfloat16 leaves from their stored uint16 bit patterns
            import ml_dtypes
            dts = [str(d) for d in data["__dtypes__"]]
            saved = [s.view(ml_dtypes.bfloat16)
                     if d == "bfloat16" and s.dtype == np.uint16 else s
                     for s, d in zip(saved, dts)]
        for i, (s, l) in enumerate(zip(saved, leaves_like)):
            if s.shape != np.asarray(l).shape:
                raise ValueError(
                    f"leaf {i}: saved shape {s.shape} != expected "
                    f"{np.asarray(l).shape}")
        return jax.tree.unflatten(treedef, saved)
