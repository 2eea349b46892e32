"""Device-mesh helpers.

The TPU replacement for the reference's MPI topology discovery
(``/root/reference/pytdscf/_const_cls.py:255-276``): a
``jax.sharding.Mesh`` over the local (or distributed) device set, with named
axes — ``"dp"`` for trajectory/ensemble batching, ``"chain"`` for real-space
partitioning of the MPS site chain (the reference's ``_mps_parallel``
analog).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: dict[str, int] | int,
    devices: list | None = None,
) -> Mesh:
    """Build a mesh: ``make_mesh(4)`` → 1-D ``("dp",)`` of 4 devices, or
    ``make_mesh({"dp": 2, "chain": 4})`` for a 2-D mesh."""
    if isinstance(axis_sizes, int):
        axis_sizes = {"dp": axis_sizes}
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes[n] for n in names)
    n = int(np.prod(shape))
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for "
            "virtual CPU devices)"
        )
    return Mesh(np.asarray(devices[:n]).reshape(shape), names)
