"""Utilities: reduced-density reader, format converters."""

from pytdscf_tpu.util.read_nc import read_nc

__all__ = ["read_nc"]
