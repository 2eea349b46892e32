"""Operator layer: tensor operators, MPO algebra, Hamiltonians."""

from pytdscf_tpu.operators.hamiltonian import (
    HamiltonianMixin,
    TensorHamiltonian,
)
from pytdscf_tpu.operators.tensor_op import TensorOperator

__all__ = ["HamiltonianMixin", "TensorHamiltonian", "TensorOperator"]
