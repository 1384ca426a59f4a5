"""Checkpoint / resume for progressive renders and inverse-rendering runs.

The reference has no checkpointing (SURVEY §5); its resumable state is the
progressive accumulator (weighted radiance + weight sums persisting across
frames, ``reconstruction.cl:45-57``).  Here that state — plus sampler
bookkeeping and optimizer state for inverse rendering — saves and restores
via orbax when available, with an npz fallback, so long renders and
multi-host jobs survive restarts (standard JAX practice).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..film.accumulate import Accumulator


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in leaves:
        key = prefix + "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_accumulator(path: str, accum: Accumulator, extra: dict | None = None):
    """Save render state as npz (portable, no deps)."""
    data = {
        "weighted": np.asarray(accum.weighted),
        "weight": np.asarray(accum.weight),
        "frame": np.asarray(accum.frame),
    }
    for k, v in (extra or {}).items():
        data["extra_" + k] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **data)
    os.replace(tmp, path)  # atomic swap-in


def load_accumulator(path: str) -> tuple[Accumulator, dict]:
    z = np.load(path)
    accum = Accumulator(
        weighted=jnp.asarray(z["weighted"]),
        weight=jnp.asarray(z["weight"]),
        frame=jnp.asarray(z["frame"]),
    )
    extra = {
        k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
    }
    return accum, extra


def save_pytree(path: str, tree: Any):
    """Generic pytree save: orbax if available, else npz of flattened leaves."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), tree, force=True)
        ckpt.wait_until_finished()
        return "orbax"
    except Exception:
        np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                            **_flatten(tree))
        return "npz"


def restore_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_pytree (orbax dir or npz)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(os.path.abspath(path), like)
    npz = path if path.endswith(".npz") else path + ".npz"
    z = np.load(npz)
    flat = _flatten(like)
    keys = list(flat.keys())
    leaves, treedef = jax.tree_util.tree_flatten(like)
    assert len(keys) == len(leaves)
    restored = [jnp.asarray(z[k]) for k in keys]
    return jax.tree_util.tree_unflatten(treedef, restored)
