"""Primitive basis package: DVR families, Fock-like bases, FBR primitives."""

from pytdscf_tpu.basis.abc import DVRPrimitivesMixin
from pytdscf_tpu.basis.boson import Boson, Exciton
from pytdscf_tpu.basis.exponential import Exponential
from pytdscf_tpu.basis.ho import HarmonicOscillator, PrimBas_HO
from pytdscf_tpu.basis.sin import Sine

__all__ = [
    "DVRPrimitivesMixin",
    "HarmonicOscillator",
    "PrimBas_HO",
    "Sine",
    "Exponential",
    "Boson",
    "Exciton",
]
