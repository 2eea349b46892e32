"""Data-parallel (ensemble) TDVP over a device mesh.

Shards a batch of trajectories (e.g. initial-condition ensembles, sampled
thermal states, parameter scans) across the ``"dp"`` mesh axis via
``shard_map``; each device runs the full traceable TDVP step
(:func:`pytdscf_tpu.mps.functional.tdvp_step`) on its local shard and
observables are reduced with ``psum`` collectives over ICI — no host
round-trips.  This is the ensemble-parallel axis the reference does not have
(its only parallelism is MPI real-space chain splitting,
``/root/reference/pytdscf/_mps_parallel.py``); chain partitioning lives in
``pytdscf_tpu.parallel.chain``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from pytdscf_tpu.mps import functional as F

Cores = tuple[jax.Array, ...]


def batched_tdvp_step(
    mesh: Mesh,
    bcores: Cores,
    Ws: Cores,
    scale,
    thresh: float = 1.0e-08,
    max_krylov: int = 20,
    axis: str = "dp",
) -> tuple[Cores, jax.Array]:
    """One TDVP step on a sharded trajectory batch.

    ``bcores[p]`` has shape ``(B, l, n, r)`` with the batch axis sharded over
    ``axis``; the MPO ``Ws`` is replicated.  Returns the updated batch and
    the batch-mean energy (a cross-device ``psum`` reduction).
    """
    nbatch = bcores[0].shape[0]

    def local(bcores, Ws):
        def one(cores):
            new = F.tdvp_step(
                cores, Ws, scale, thresh=thresh, max_krylov=max_krylov
            )
            return new, F.energy(new, Ws)

        new, energies = jax.vmap(one)(bcores)
        e_sum = jax.lax.psum(jnp.sum(energies.real), axis)
        return new, e_sum / nbatch

    spec_b = tuple(P(axis) for _ in bcores)
    spec_w = tuple(P() for _ in Ws)
    fn = _shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_b, spec_w),
        out_specs=(spec_b, P()),
        check_vma=False,
    )
    return jax.jit(fn)(bcores, Ws)


def batched_energy(
    mesh: Mesh, bcores: Cores, Ws: Cores, axis: str = "dp"
) -> jax.Array:
    """Batch-mean energy of a sharded ensemble."""
    nbatch = bcores[0].shape[0]

    def local(bcores, Ws):
        energies = jax.vmap(lambda cs: F.energy(cs, Ws))(bcores)
        return jax.lax.psum(jnp.sum(energies.real), axis) / nbatch

    fn = _shard_map(
        local,
        mesh=mesh,
        in_specs=(tuple(P(axis) for _ in bcores), tuple(P() for _ in Ws)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(bcores, Ws)
