"""Native (C++) primitive-integral kernels, loaded via ctypes.

The shared library is built on demand from ``primints.cpp`` (g++, -O3); if
no compiler is available the package silently falls back to the pure
numpy implementation in :mod:`pytdscf_tpu.basis.op_matrix`.  Entry points
mirror the reference's pybind11 module
(``/root/reference/pytdscf/basis/_primints.cpp:73-166``):

* :func:`ovi_HO_FBR` — ⟨HO_m(ω,a)|HO_k(ω′,a′)⟩
* :func:`poly_HO_FBR` — ⟨HO_m|q̂^n|HO_k⟩
* :func:`deriv_HO_FBR` — ⟨HO_m|d/dq or d²/dq²|HO_k⟩
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "primints.cpp")
_LIB = os.path.join(_HERE, "libprimints.so")

_lib: ctypes.CDLL | None = None
_load_error: str | None = None


def build(force: bool = False) -> str:
    """Compile the shared library (idempotent). Returns its path."""
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++20",
            _SRC, "-o", _LIB,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL | None:
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        build()
        lib = ctypes.CDLL(_LIB)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.ho_overlap.argtypes = [
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, dp,
        ]
        lib.ho_poly.argtypes = [
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, dp,
        ]
        lib.ho_deriv.argtypes = [
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, dp,
        ]
        _lib = lib
    except Exception as exc:  # no compiler / load failure → numpy fallback
        _load_error = str(exc)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _out(nl: int, nr: int) -> np.ndarray:
    return np.zeros((nl, nr), dtype=np.float64)


def ovi_HO_FBR(wl, al, nl, wr, ar, nr) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native primints unavailable: {_load_error}")
    out = _out(nl, nr)
    lib.ho_overlap(
        wl, al, nl, wr, ar, nr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def poly_HO_FBR(wl, al, nl, wr, ar, nr, power) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native primints unavailable: {_load_error}")
    out = _out(nl, nr)
    lib.ho_poly(
        wl, al, nl, wr, ar, nr, power,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def deriv_HO_FBR(wl, al, nl, wr, ar, nr, order) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native primints unavailable: {_load_error}")
    out = _out(nl, nr)
    lib.ho_deriv(
        wl, al, nl, wr, ar, nr, order,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
