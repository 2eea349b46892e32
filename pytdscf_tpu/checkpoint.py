"""Wavefunction checkpoint / resume.

Replaces the reference's dill-pickle wavefunction backups
(``/root/reference/pytdscf/simulator_cls.py:577-589``) with an
orbax-based pytree checkpointer (sharded-array-aware, the right tool for
multi-chip states), falling back to pickle when orbax is unavailable.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_wavefunction(
    payload: dict[str, Any], path: str, backend: str = "auto"
) -> str:
    """Save a wavefunction payload; returns the path actually written.

    ``payload`` is a pytree of numpy/jax arrays (e.g. ``{"cores": ...}``).
    ``backend``: "orbax", "pickle" or "auto".
    """
    ocp = _orbax() if backend in ("auto", "orbax") else None
    if backend == "orbax" and ocp is None:
        raise RuntimeError("orbax.checkpoint is not available")
    if ocp is not None and backend in ("auto", "orbax"):
        target = os.path.abspath(path.removesuffix(".pkl") + ".ckpt")
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(target, payload, force=True)
        return target
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_wavefunction(path: str) -> dict[str, Any]:
    """Load a payload written by :func:`save_wavefunction` (either format)."""
    if path.endswith(".ckpt") or os.path.isdir(path):
        ocp = _orbax()
        if ocp is None:
            raise RuntimeError("orbax.checkpoint is required to read .ckpt")
        ckptr = ocp.PyTreeCheckpointer()
        out = ckptr.restore(path)
        return _listify(out)
    with open(path, "rb") as f:
        return pickle.load(f)


def _listify(tree):
    """Orbax restores lists as dicts {'0': ..}; normalise back to lists."""
    if isinstance(tree, dict):
        keys = list(tree.keys())
        if keys and all(k.isdigit() for k in map(str, keys)):
            return [
                _listify(tree[k])
                for k in sorted(keys, key=lambda s: int(s))
            ]
        return {k: _listify(v) for k, v in tree.items()}
    return tree


def resolve_checkpoint(path_base: str) -> str | None:
    """Find an existing checkpoint for a base path (either format)."""
    for cand in (path_base, path_base.removesuffix(".pkl") + ".ckpt"):
        if os.path.exists(cand):
            return cand
    return None
