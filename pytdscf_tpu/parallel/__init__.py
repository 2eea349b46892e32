"""Multi-device execution: mesh helpers and sharded TDVP programs."""

from pytdscf_tpu.parallel.mesh import make_mesh
from pytdscf_tpu.parallel.batched import (
    batched_tdvp_step,
    batched_energy,
    batched_sse_propagate,
)

__all__ = [
    "make_mesh",
    "batched_tdvp_step",
    "batched_energy",
    "batched_sse_propagate",
]
