"""Built-in model builders (benchmark and regression systems)."""

from pytdscf_tpu.models.holstein import singlet_fission_chain
from pytdscf_tpu.models.pyrazine import pyrazine_qvc

__all__ = ["singlet_fission_chain", "pyrazine_qvc"]
