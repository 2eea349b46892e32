"""Data shim: see pytdscf_tpu/potentials/_tables.py (reference
pytdscf/potentials/c8h10_local_potential.py)."""
from pytdscf_tpu.potentials._tables import load as _load

globals().update(_load("c8h10_local_potential"))
del _load
