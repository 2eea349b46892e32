"""Bond-dimension (χ) tensor parallelism: the TDVP state sharded over a mesh.

The chain-parallel engines (``parallel/pitdvp.py``, ``parallel/spmd_pitdvp.py``)
split *sites* across devices — the analog of the reference's MPI axis
(``/root/reference/pytdscf/_mps_parallel.py``).  This module adds the axis the
reference does not have and SURVEY.md §7 planned ("optional bond-axis sharding
for χ>2048"): the *bond* dimension χ — the memory- and FLOP-carrying axis — is
sharded over a 1-D ``"tp"`` mesh, so every site update runs distributed.

Why it matters: at χ=4096 a radical-pair MPDO (14 sites, d=4, MPO w=8,
complex64) stores ~1.07 GB per environment block and ~0.54 GB per core —
≈ 22 GB of resident state, over a v5e chip's 15.75 GB HBM before a single
transient.  Sharded over 8 chips the per-device state is ~2.8 GB and the
(χ,d,w,χ) matvec transients shard with it; χ=4096 becomes runnable, beyond
both the single-chip ceiling (χ=2048 measured, BASELINE.md) and the
reference's published "bond dimension > 1000" claim (README.md:90-96).

Approach — GSPMD, not hand-written collectives: the engine state (MPS cores,
cached environment blocks) is placed with :class:`~jax.sharding.NamedSharding`
over the mesh; the *unmodified* jitted site-step programs (``mps/tdvp.py``)
are then recompiled by XLA's SPMD partitioner, which inserts the all-gathers /
reduce-scatters where the einsum chain needs them.  Numerics are identical to
the serial engine up to floating-point reduction order (validated to ~1e-12
in complex128 by ``tests/test_bond_tp.py``).  This is the idiomatic
"pick a mesh, annotate shardings, let XLA insert collectives" recipe — the
per-site collectives ride ICI on real hardware.

Sharding layout (P = size of the ``"tp"`` axis):

* MPS core ``(l, n, r)``  → sharded on the LEFT bond ``l`` when divisible
  by P, else on ``r``, else replicated (edge-ramp cores are tiny).  The
  left bond is the leading axis, so the flattened Krylov vector is a
  contiguous shard — the whole Krylov ``while_loop`` then carries
  χ-sharded rows.
* env block ``(χ_bra, w, χ_ket)`` → sharded on ``χ_ket``.
* fused MPO cores ``(w, d, d, w')`` → replicated (they are small).
* Krylov/site transients are PINNED with ``with_sharding_constraint`` in
  the ``*_tp`` chain kernels (``mps/kernels.py``) — bare propagation
  through the 4-operand einsums replicates the (χ,w,d,χ) chain tensors
  (measured 19 GiB/device at χ=4096 — ``scripts/bond_tp_memcheck.py``);
  with the constraints each contraction is local or ends in one
  reduce-scatter, and the consumed-side env all-gather is loop-invariant.

Any :class:`~pytdscf_tpu.mps.tdvp.TDVPEngine` feature (Arnoldi/Liouville
MPDO, relaxed Krylov, observables, checkpointing) works unchanged — the
subclass only pins array placement.  Composition with the chain axis is
possible in principle (2-D ``("chain", "tp")`` mesh) but not wired here.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytdscf_tpu.mps.tdvp import TDVPEngine

__all__ = ["BondTPEngine", "tp_spec", "state_bytes_per_device"]


def tp_spec(shape, nshard: int, axis: str, *, bond_axes=None,
            prefer: str = "right") -> P:
    """PartitionSpec sharding the first divisible bond axis of ``shape``.

    ``bond_axes`` restricts which positions are eligible (e.g. ``(0, 2)``
    for an ``(l, n, r)`` core — the physical axis is never sharded).
    ``prefer`` picks the scan direction: ``"right"`` for env blocks
    (ket axis sharded — the reduce-scatter target of the χ-sharded
    renorm kernels), ``"left"`` for cores (left bond sharded, so the
    flattened Krylov vector is a CONTIGUOUS shard — the layout the
    sharded site-step chain in ``mps/kernels.py`` heff/keff/renorm
    ``*_tp`` kernels is built around).
    """
    if bond_axes is None:
        bond_axes = tuple(range(len(shape)))
    spec = [None] * len(shape)
    for ax in sorted(bond_axes, reverse=prefer == "right"):
        if shape[ax] % nshard == 0 and shape[ax] >= nshard > 1:
            spec[ax] = axis
            break
    return P(*spec)


class BondTPEngine(TDVPEngine):
    """TDVP engine whose state lives χ-sharded over a 1-D device mesh.

    Drop-in subclass: construct with the same ``(cores, hamiltonian,
    config)`` plus the mesh.  Every stored array is (re)placed with a
    :func:`tp_spec` sharding at init and re-pinned after each
    :meth:`propagate` (a no-op transfer when XLA's output shardings
    already match, corrective when propagation drifted).
    """

    def __init__(self, cores, hamiltonian, config, mesh: Mesh,
                 axis: str = "tp"):
        if axis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
        self.mesh = mesh
        self.nshard = mesh.shape[axis]
        super().__init__(cores, hamiltonian, config)
        # static args of the site-step programs: select the χ-sharded
        # chain kernels (constrained intermediates — without them GSPMD
        # replicates the (χ,w,d,χ) transients; scripts/bond_tp_memcheck.py)
        self.tp_mesh = mesh
        self.tp_axis = axis
        if config.adaptive and not config.adaptive_masked:
            raise NotImplementedError(
                "bond-TP requires static shapes: use adaptive_masked=True "
                "(fixed-cap masked a1TDVP) instead of the retracing "
                "adaptive sweep"
            )
        self._pin_state()

    # ------------------------------------------------------------ pinning
    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _reshard_fn(sh: NamedSharding):
        # jitted identity instead of eager jax.device_put: on the axon TPU
        # backend eager dispatches / transfers of complex buffers can fail
        # (see mps/device_io.py) — inside XLA the reshard is just a
        # collective of the decomposed real pairs.  Cached per sharding so
        # repeated pins hit the jit cache instead of retracing.
        return jax.jit(lambda y: y, out_shardings=sh)

    def _reshard(self, x: jax.Array, sh: NamedSharding) -> jax.Array:
        return BondTPEngine._reshard_fn(sh)(x)

    def _pin(self, x: jax.Array, bond_axes, prefer: str = "right") -> jax.Array:
        sh = NamedSharding(
            self.mesh,
            tp_spec(x.shape, self.nshard, self.tp_axis, bond_axes=bond_axes,
                    prefer=prefer),
        )
        if x.sharding == sh:  # already placed; skip the dispatch
            return x
        return self._reshard(x, sh)

    def _pin_state(self) -> None:
        """(Re)place cores, MPO cores and any cached envs on the mesh."""
        rep = NamedSharding(self.mesh, P())
        for i in range(self.nstate):
            for p in range(self.nsite):
                self.cores[i][p] = self._pin(
                    self.cores[i][p], (0, 2), prefer="left"
                )
        self.W = {
            pair: tuple(
                w if w.sharding == rep else self._reshard(w, rep)
                for w in Ws
            )
            for pair, Ws in self.W.items()
        }
        if self.env_stack is not None:
            self.env_stack = [
                (
                    tuple(self._pin(b, (0, 2)) for b in blocks),
                    logs,
                )
                for blocks, logs in self.env_stack
            ]

    # ------------------------------------------------------------- sweeps
    def propagate(self, *args, **kwargs):
        out = super().propagate(*args, **kwargs)
        self._pin_state()
        return out

    def apply_operator_fit(self, *args, **kwargs):
        out = super().apply_operator_fit(*args, **kwargs)
        self._pin_state()
        return out

    def canonicalize(self) -> None:
        super().canonicalize()
        self._pin_state()

    def right_canonicalize(self) -> None:
        super().right_canonicalize()
        self._pin_state()


def state_bytes_per_device(engine: TDVPEngine) -> tuple[int, int]:
    """(total bytes, max per-device bytes) of the engine's resident state.

    Counts cores and cached environment blocks — the HBM-capacity check
    behind the χ>2048 sizing in the module docstring.  For a serial
    engine both numbers coincide; for :class:`BondTPEngine` the second
    is ≈ total/P when the bonds divide the mesh.
    """
    arrays: list[jax.Array] = [
        c for state in engine.cores for c in state
    ]
    if engine.env_stack is not None:
        for blocks, _logs in engine.env_stack:
            arrays.extend(blocks)
    total = 0
    per_dev: dict = {}
    for a in arrays:
        total += a.nbytes
        for s in a.addressable_shards:
            per_dev[s.device] = per_dev.get(s.device, 0) + s.data.nbytes
    return total, max(per_dev.values()) if per_dev else 0
