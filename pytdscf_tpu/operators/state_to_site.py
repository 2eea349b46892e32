"""Electronic-state → physical-site conversion for parallel sweeps.

Multi-state superblock MPS (per-state core lists + per-pair MPO blocks)
cannot be chain-parallelised stably: the per-state boundary factors σ_i of
a weak state sit at its noise floor, and the double-centre σ⁺ contraction
amplifies any cross-state amplitude injected DURING a sweep phase by
(injection)/σ_min — unbounded as the state's amplitude → 0 (measured here:
a [1, 0]-weight exciton dimer loses 9 orders of transferred population in
one step, then NaNs).  The reference reaches the same conclusion: its MPI
parallel MPS raises ``NotImplementedError`` for ``len(superblock_states)
!= 1`` (``/root/reference/pytdscf/_mps_parallel.py:98-100``) and its MPI
nonadiabatic tests instead model the electronic manifold as an ``Exciton``
basis SITE in a single-state MPS
(``/root/reference/tests/test_mpi_exiciton_propagate.py:31-33``).

This module automates that: it converts a multi-state problem into the
exactly equivalent single-state one —

* wavefunction:  Ψ = Σ_e |e⟩ ⊗ Ψ_e  becomes one MPS over
  ``[elec] + sites`` with direct-sum bond spaces (block e of every bond
  carries state e's channels),
* operator:      H = Σ_{ij} |i⟩⟨j| ⊗ H_ij  becomes one MPO whose first
  core routes electronic transitions into per-pair bond channels and
  whose site cores are the block-diagonal direct sum of the pair MPOs,

— after which the single-state parallel engines apply, with bond spectra
that genuinely grade the state (amplitude transfer between electronic
states is ordinary through-chain dynamics of the electronic site, not a
cross-MPS injection).  Populations come back as the electronic site's
reduced density matrix.
"""

from __future__ import annotations

import numpy as np

from pytdscf_tpu.operators import mpo_algebra as alg


def _np(c) -> np.ndarray:
    """Host numpy view of a (possibly device) array."""
    if isinstance(c, np.ndarray):
        return c
    import jax

    return np.asarray(jax.device_get(c))


# ------------------------------------------------------------------ MPO
class PreFusedHamiltonian:
    """Single-state Hamiltonian adapter around already-fused MPO cores.

    Quacks like the ``fused_mpo``-providing Hamiltonian classes for the
    engines (which only ever call ``fused_mpo(phys_dims)``)."""

    def __init__(self, cores: list[np.ndarray]):
        self.cores = [np.asarray(c, dtype=np.complex128) for c in cores]
        self.nstate = 1
        self.ndof = len(cores)

    def fused_mpo(self, phys_dims, cutoff: float = 1.0e-13):
        if len(phys_dims) != len(self.cores):
            raise ValueError(
                f"{len(phys_dims)} phys dims for {len(self.cores)} cores"
            )
        for p, (d, c) in enumerate(zip(phys_dims, self.cores)):
            if c.shape[1] != d:
                raise ValueError(
                    f"site {p}: phys dim {d} != MPO dim {c.shape[1]}"
                )
        return [[self.cores]]


def electronic_site_mpo(
    fused,
    nstate: int,
    *,
    pad_sites: int = 0,
    phys_pad: int | None = None,
    cutoff: float = 1.0e-13,
) -> PreFusedHamiltonian:
    """Fused per-pair MPO blocks → one single-state MPO over [elec]+sites.

    ``fused``: the ``hamiltonian.fused_mpo(phys)`` result ([i][j] → core
    list or None).  The electronic site (dimension ``nstate``) is placed
    at position 0; its core routes |i⟩⟨j| into the pair's bond-channel
    block.  ``pad_sites`` appends that many trivial dimension-1 sites
    (for segment-count divisibility); ``phys_pad`` zero-pads every
    physical axis to a uniform dimension (for the uniform-shape SPMD
    engine — zero MPO channels leave padded amplitude untouched)."""
    pairs = [
        (i, j)
        for i in range(nstate)
        for j in range(nstate)
        if fused[i][j] is not None
    ]
    if not pairs:
        raise ValueError("no nonzero blocks in fused MPO")
    blocks = {
        pair: [alg.as_dense_core(np.asarray(c)) for c in fused[pair[0]][pair[1]]]
        for pair in pairs
    }
    nsite = len(blocks[pairs[0]])
    # electronic core: route (i, j) into the pair's channel
    E = np.zeros((1, nstate, nstate, len(pairs)), dtype=np.complex128)
    for q, (i, j) in enumerate(pairs):
        E[0, i, j, q] = 1.0
    cores = [E]
    for p in range(nsite):
        ls = [blocks[pair][p].shape[0] for pair in pairs]
        rs = [blocks[pair][p].shape[-1] for pair in pairs]
        n = blocks[pairs[0]][p].shape[1]
        if p == nsite - 1:
            # collapse the per-pair right boundaries (all 1) by summing
            new = np.zeros((sum(ls), n, n, 1), dtype=np.complex128)
            off = 0
            for pair, l in zip(pairs, ls):
                new[off : off + l] += blocks[pair][p]
                off += l
        else:
            new = np.zeros((sum(ls), n, n, sum(rs)), dtype=np.complex128)
            lo = ro = 0
            for pair, l, r in zip(pairs, ls, rs):
                new[lo : lo + l, :, :, ro : ro + r] = blocks[pair][p]
                lo += l
                ro += r
        cores.append(new)
    for _ in range(pad_sites):
        cores.append(np.ones((1, 1, 1, 1), dtype=np.complex128))
    cores = alg.mpo_balance(alg.mpo_compress(cores, cutoff))
    if phys_pad is not None:
        cores = [
            np.pad(
                c,
                (
                    (0, 0),
                    (0, phys_pad - c.shape[1]),
                    (0, phys_pad - c.shape[2]),
                    (0, 0),
                ),
            )
            for c in cores
        ]
    return PreFusedHamiltonian(cores)


# ------------------------------------------------------------------ MPS
def electronic_site_chain(
    states,
    *,
    pad_sites: int = 0,
    phys_pad: int | None = None,
) -> list[np.ndarray]:
    """Per-state core lists → one single-state MPS over [elec]+sites.

    Direct-sum bond spaces: bond block e carries state e's channels, the
    electronic core selects the block.  Exactly represents
    Σ_e |e⟩ ⊗ Ψ_e with bond dimensions Σ_e χ_e."""
    nstate = len(states)
    nsite = len(states[0])
    sts = [[_np(c).astype(np.complex128) for c in st] for st in states]
    E = np.zeros((1, nstate, nstate), dtype=np.complex128)
    for e in range(nstate):
        E[0, e, e] = 1.0
    cores = [E]
    for p in range(nsite):
        ls = [st[p].shape[0] for st in sts]
        rs = [st[p].shape[2] for st in sts]
        n = sts[0][p].shape[1]
        if p == 0:
            # left bonds are all 1: rows are the electronic block index
            new = np.zeros((nstate, n, sum(rs)), dtype=np.complex128)
            ro = 0
            for e, st in enumerate(sts):
                new[e, :, ro : ro + rs[e]] = st[p][0]
                ro += rs[e]
        elif p == nsite - 1:
            new = np.zeros((sum(ls), n, 1), dtype=np.complex128)
            lo = 0
            for e, st in enumerate(sts):
                new[lo : lo + ls[e]] = st[p]
                lo += ls[e]
        else:
            new = np.zeros((sum(ls), n, sum(rs)), dtype=np.complex128)
            lo = ro = 0
            for e, st in enumerate(sts):
                new[lo : lo + ls[e], :, ro : ro + rs[e]] = st[p]
                lo += ls[e]
                ro += rs[e]
        cores.append(new)
    for _ in range(pad_sites):
        cores.append(np.ones((1, 1, 1), dtype=np.complex128))
    if phys_pad is not None:
        cores = [
            np.pad(c, ((0, 0), (0, phys_pad - c.shape[1]), (0, 0)))
            for c in cores
        ]
    return cores


def chain_to_states(
    cores,
    nstate: int,
    *,
    pad_sites: int = 0,
    phys_dims: list[int] | None = None,
) -> list[list[np.ndarray]]:
    """Inverse map: [elec]+sites chain → per-state core lists.

    After propagation the gauge mixes the direct-sum blocks, so state e's
    component is the elec index-e slice of the (rotated) electronic core
    absorbed into the first site — per-state cores share the converted
    chain's bond dimensions.  Trailing pad sites are contracted away;
    ``phys_dims`` restores pre-``phys_pad`` physical dimensions."""
    cs = [_np(c).astype(np.complex128) for c in cores]
    E, sites = cs[0], cs[1:]
    if pad_sites:
        body, pads = sites[:-pad_sites], sites[-pad_sites:]
        M = np.eye(pads[0].shape[0], dtype=np.complex128)
        for p in pads:
            M = M @ p[:, 0, :]
        body = list(body)
        body[-1] = np.einsum("lnr,rk->lnk", body[-1], M)
        sites = body
    if phys_dims is not None:
        E = E[:, : phys_dims[0]]
        sites = [
            c[:, :d, :] for c, d in zip(sites, phys_dims[1:], strict=True)
        ]
    out = []
    for e in range(E.shape[1]):
        first = np.einsum("c,cnr->nr", E[0, e], sites[0])[None]
        out.append([first] + [c.copy() for c in sites[1:]])
    return out
