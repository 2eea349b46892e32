"""Data shim: see pytdscf_tpu/potentials/_tables.py (reference
pytdscf/potentials/c6h8_potential.py)."""
from pytdscf_tpu.potentials._tables import load as _load

globals().update(_load("c6h8_potential"))
del _load
