"""Read exported reduced densities.

API parity with the reference's netCDF reader
(``/root/reference/pytdscf/util/read_nc.py``); our export format is HDF5
(same ``rho_{key}_{istate}`` variable naming).
"""

from __future__ import annotations

import h5py
import numpy as np


def read_nc(
    path: str, keys: list[tuple[int, ...]], istate: int = 0
) -> dict[tuple[int, ...], np.ndarray]:
    """Return ``{key: array(steps, dims…)}`` of complex reduced densities."""
    out: dict[tuple[int, ...], np.ndarray] = {}
    with h5py.File(path, "r") as f:
        for key in keys:
            out[key] = np.asarray(f[f"rho_{key}_{istate}"])
        out["time"] = np.asarray(f["time"])
    return out
