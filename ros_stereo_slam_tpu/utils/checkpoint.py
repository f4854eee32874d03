"""Checkpoint / resume of the full SLAM state (SURVEY.md §5).

The reference can only SAVE artifacts at exit (pose graph ``poseGraph.g2o``,
``map.ply``, canvases — ``include/poseGraph.h:140-179``,
``src/rosFuncs.cpp:63-67``) and cannot resume.  Here the complete state —
the device-side carry pytree (track, keyframes, pyramids, PRNG key, BA
window), trajectory, pose-graph measurements and the BoW database — is
serialized to a single ``.npz`` and restored exactly, so a run can stop
and continue mid-sequence.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _npz_safe(leaf) -> np.ndarray:
    """np.savez cannot round-trip ml_dtypes (bfloat16 reloads as raw '|V2'
    void); store those as float32 — an exact upcast — and let load_pytree
    cast back to the template leaf's dtype."""
    a = np.asarray(leaf)
    if a.dtype.kind == "V" or str(a.dtype) == "bfloat16":
        return a.astype(np.float32)
    return a


def save_pytree(path: str, tree, meta: dict | None = None) -> None:
    """Serialize an arbitrary array pytree + JSON metadata to .npz."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrs = {f"leaf_{i}": _npz_safe(l) for i, l in enumerate(leaves)}
    arrs["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )  # structure fingerprint for validation only
    arrs["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrs)


def load_pytree(path: str, like):
    """Restore a pytree saved by :func:`save_pytree` into the structure of
    `like` (shape/dtype template).  Returns (tree, meta)."""
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"].tobytes()).decode() or "{}")
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        arr = z[f"leaf_{i}"]
        tmpl = leaves_like[i]
        if hasattr(tmpl, "shape") and tuple(tmpl.shape) != tuple(arr.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {tmpl.shape}"
            )
        leaves.append(
            jnp.asarray(arr, dtype=tmpl.dtype)
            if isinstance(tmpl, jnp.ndarray) else arr
        )
    saved_def = bytes(z["__treedef__"].tobytes()).decode()
    if saved_def != str(treedef):
        raise ValueError("checkpoint structure does not match template")
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
