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

Programs are built once per (mesh, chain-length, schedule) configuration and
cached — ``scale`` (the step exponent) rides in as a traced argument, so
repeat calls (new dt, new batch contents) hit the jit cache instead of
retracing the whole scan.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

import numpy as np

from pytdscf_tpu.mps import device_io as dio
from pytdscf_tpu.mps import functional as F

Cores = tuple[jax.Array, ...]


def _as_scale(scale, dtype) -> jax.Array:
    """Host scalar → device complex scalar, TPU-safely.

    Eagerly uploading a bare complex host scalar (``jnp.asarray(0.5j)`` /
    an ``np.complex64`` jit argument) is UNIMPLEMENTED on this TPU
    backend; route through the real-pair transport instead.
    """
    if isinstance(scale, jax.Array):
        return scale
    return dio.put(np.asarray(scale), dtype)


@lru_cache(maxsize=None)
def _step_program(
    mesh: Mesh, ncores: int, thresh: float, max_krylov: int, axis: str
):
    def local(bcores, Ws, scale):
        def one(cores):
            new = F.tdvp_step(
                cores, Ws, scale, thresh=thresh, max_krylov=max_krylov
            )
            return new, F.energy(new, Ws)

        new, energies = jax.vmap(one)(bcores)
        return new, jax.lax.psum(jnp.sum(energies.real), axis)

    spec_b = tuple(P(axis) for _ in range(ncores))
    spec_w = tuple(P() for _ in range(ncores))
    fn = _shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_b, spec_w, P()),
        out_specs=(spec_b, P()),
        check_vma=False,
    )
    return jax.jit(fn)


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
    prog = _step_program(mesh, len(bcores), thresh, max_krylov, axis)
    new, e_sum = prog(bcores, Ws, _as_scale(scale, bcores[0].dtype))
    return new, e_sum / bcores[0].shape[0]


@lru_cache(maxsize=None)
def _sse_program(
    mesh: Mesh,
    ncores: int,
    nsteps: int,
    rdm_site: int,
    thresh: float,
    max_krylov: int,
    axis: str,
):
    def local(bcores, Ws, scale):
        def one(cores):
            return F.tdvp_step(
                cores, Ws, scale, thresh=thresh, max_krylov=max_krylov,
                conserve_norm=False, arnoldi=True,
            )

        def body(carry, _):
            new = jax.vmap(one)(carry)
            rdm = jax.vmap(lambda cs: F.site_rdm(cs, rdm_site))(new)
            return new, jnp.sum(rdm, axis=0)

        new_b, rdms = jax.lax.scan(body, bcores, None, length=nsteps)
        return new_b, jax.lax.psum(rdms, axis)

    spec_b = tuple(P(axis) for _ in range(ncores))
    spec_w = tuple(P() for _ in range(ncores))
    fn = _shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_b, spec_w, P()),
        out_specs=(spec_b, P()),
        check_vma=False,
    )
    return jax.jit(fn)


def batched_sse_propagate(
    mesh: Mesh,
    bcores: Cores,
    Ws: Cores,
    scale,
    nsteps: int,
    rdm_site: int,
    thresh: float = 1.0e-08,
    max_krylov: int = 20,
    axis: str = "dp",
) -> tuple[Cores, jax.Array]:
    """SSE / wavefunction-trajectory ensemble: ``nsteps`` of non-Hermitian
    (Arnoldi, norm-decaying) TDVP on a dp-sharded trajectory batch, with
    the ensemble-SUMMED one-site reduced density collected after every
    step — ONE scan-compiled shard_map program, zero host syncs.

    The reference's SSE workflow loops trajectories serially through full
    simulator runs (``docs/notebook/radicalpair-sse.ipynb``); here the
    whole ensemble advances in lock-step through batched MXU matmuls, and
    devices only talk at the final ``psum`` of the RDM accumulator.

    ``scale`` is the HALF-step factor (−i·dt/2); ``bcores[p]`` has shape
    ``(B, l, n, r)`` with ``B`` sharded over ``axis``.  Returns the final
    batch and a ``(nsteps, d, d)`` array of Σ_traj ρ_traj (divide by the
    GLOBAL trajectory count for the ensemble average; with a CAP the
    per-trajectory trace is the survival probability, so ρ is
    deliberately NOT renormalised per trajectory).
    """
    prog = _sse_program(
        mesh, len(bcores), nsteps, rdm_site, thresh, max_krylov, axis
    )
    return prog(bcores, Ws, _as_scale(scale, bcores[0].dtype))


@lru_cache(maxsize=None)
def _energy_program(mesh: Mesh, ncores: int, axis: str):
    def local(bcores, Ws):
        energies = jax.vmap(lambda cs: F.energy(cs, Ws))(bcores)
        return jax.lax.psum(jnp.sum(energies.real), axis)

    fn = _shard_map(
        local,
        mesh=mesh,
        in_specs=(
            tuple(P(axis) for _ in range(ncores)),
            tuple(P() for _ in range(ncores)),
        ),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def batched_energy(
    mesh: Mesh, bcores: Cores, Ws: Cores, axis: str = "dp"
) -> jax.Array:
    """Batch-mean energy of a sharded ensemble."""
    prog = _energy_program(mesh, len(bcores), axis)
    return prog(bcores, Ws) / bcores[0].shape[0]
