"""pytdscf_tpu — TPU-native tensor-train (MPS/MPO) quantum dynamics.

A ground-up JAX/XLA rebuild of the capabilities of QCLovers/PyTDSCF:
MPS wavepacket dynamics with MPO / sum-of-products Hamiltonians propagated
by projector-splitting 1-site TDVP with on-device short-iterative
Lanczos/Arnoldi exponentials; relaxation, dipole operation and real-time
propagation; DVR/FBR bases; Liouville-space MPDO dynamics; multi-chip
sharding via jax.sharding instead of MPI.
"""

import jax

# Double precision is required for the reference's 1e-9-level regression
# literals (the reference enables x64 at import as well: __init__.py:36).
jax.config.update("jax_enable_x64", True)
# TPU matmuls default to bfloat16 passes (~4e-3 relative error), which the
# TDVP environment-block recursion amplifies into overflow in complex64
# runs; force full f32 accumulation everywhere (no-op on CPU f64).
jax.config.update("jax_default_matmul_precision", "highest")

from pytdscf_tpu import spectra, units  # noqa: E402
from pytdscf_tpu.basis import (  # noqa: E402
    Boson,
    Exciton,
    Exponential,
    HarmonicOscillator,
    PrimBas_HO,
    Sine,
)
from pytdscf_tpu.config import Config  # noqa: E402
from pytdscf_tpu.model import BasInfo, Model  # noqa: E402
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian  # noqa: E402
from pytdscf_tpu.operators.tensor_op import TensorOperator  # noqa: E402
from pytdscf_tpu.simulator import Simulator  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "BasInfo",
    "Boson",
    "Config",
    "Exciton",
    "Exponential",
    "HarmonicOscillator",
    "Model",
    "PrimBas_HO",
    "Simulator",
    "Sine",
    "TensorHamiltonian",
    "TensorOperator",
    "spectra",
    "units",
]
