"""Chain-axis (real-space) parallelism: sharded transfer-matrix sweeps.

The TPU-native replacement for the reference's distributed observables
(``/root/reference/pytdscf/_mps_parallel.py:855-1471`` — pipelined MPI
point-to-point partial contractions for ovlp/norm/expectation/RDMs): the
site chain is sharded over a ``"chain"`` mesh axis, each device contracts
its contiguous segment into a dense transfer operator with big MXU matmuls,
and segments are combined with one ``all_gather`` over ICI — turning the
reference's O(N) latency-bound rank pipeline into an
O(N/P) compute + O(log P) communication program.

The same machinery yields per-segment boundary environments
(:func:`segment_boundaries`), the building block for the chain-parallel
TDVP sweep.

Layout: cores stacked as ``(nsite, D, n, D)`` with the site axis sharded;
edge bonds are zero-padded to the uniform bond D (exact — padding carries
no amplitude).  MPO cores stacked as ``(nsite, w, n, n, w)``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.6
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

PREC = jax.lax.Precision.HIGHEST


# ------------------------------------------------------------- packing
def pad_cores(cores: list[np.ndarray], D: int) -> np.ndarray:
    """Stack ragged (l, n, r) cores into (nsite, D, n, D), zero-padded."""
    n = cores[0].shape[1]
    out = np.zeros((len(cores), D, n, D), dtype=np.complex128)
    for p, c in enumerate(cores):
        l, nn, r = c.shape
        if nn != n:
            raise ValueError("pad_cores requires a uniform physical dim")
        out[p, :l, :, :r] = c
    return out


def pad_mpo(Ws: list[np.ndarray], w: int) -> np.ndarray:
    """Stack ragged (a, n, n, b) MPO cores into (nsite, w, n, n, w)."""
    n = Ws[0].shape[1]
    out = np.zeros((len(Ws), w, n, n, w), dtype=np.complex128)
    for p, c in enumerate(Ws):
        a, n1, n2, b = c.shape
        out[p, :a, :, :, :b] = c
    return out


def _fold_segments(mats: jnp.ndarray) -> jnp.ndarray:
    """Ordered product of per-device partial transfer matrices (P, d, d)."""

    def body(carry, m):
        return carry @ m, None

    eye = jnp.eye(mats.shape[-1], dtype=mats.dtype)
    out, _ = jax.lax.scan(body, eye, mats)
    return out


# ---------------------------------------------------------- observables
def chain_norm_sq(
    mesh: Mesh, cores: jnp.ndarray, axis: str = "chain"
) -> jnp.ndarray:
    """⟨Ψ|Ψ⟩ with the site axis sharded over ``axis``.

    Each device scans its local sites into one (D², D²) transfer operator;
    the P partials are all-gathered and folded in order.
    """
    D = cores.shape[1]

    def local(cseg):
        def site_transfer(carry, c):
            # T[(l m),(r p)] = Σ_n c[l,n,r]·c*[m,n,p]; fold into carry
            t = jnp.einsum(
                "lnr,mnp->lmrp", c, c.conj(), precision=PREC
            ).reshape(D * D, D * D)
            return carry @ t, None

        eye = jnp.eye(D * D, dtype=cseg.dtype)
        m_loc, _ = jax.lax.scan(site_transfer, eye, cseg)
        mats = jax.lax.all_gather(m_loc, axis)  # (P, D², D²)
        full = _fold_segments(mats)
        # edge bonds live in the (0, 0) padded slot
        return full[0, 0].real

    fn = _shard_map(
        local, mesh=mesh, in_specs=(P(axis),), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(cores)


def chain_expectation(
    mesh: Mesh,
    cores: jnp.ndarray,
    Ws: jnp.ndarray,
    axis: str = "chain",
) -> jnp.ndarray:
    """⟨Ψ|H|Ψ⟩ with sites sharded: (D·w·D)² transfer products per device."""
    D = cores.shape[1]
    w = Ws.shape[1]

    def local(cseg, wseg):
        dim = D * w * D

        def site_transfer(carry, cw):
            c, W = cw
            t = jnp.einsum(
                "lnr,anmb,qmp->laqrbp", c.conj(), W, c, precision=PREC
            ).reshape(dim, dim)
            return carry @ t, None

        eye = jnp.eye(dim, dtype=cseg.dtype)
        m_loc, _ = jax.lax.scan(site_transfer, eye, (cseg, wseg))
        mats = jax.lax.all_gather(m_loc, axis)
        full = _fold_segments(mats)
        return full[0, 0]

    fn = _shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)(cores, Ws)


def segment_boundaries(
    mesh: Mesh,
    cores: jnp.ndarray,
    Ws: jnp.ndarray,
    axis: str = "chain",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Left/right boundary environment blocks of every segment.

    Returns ``(Lb, Rb)`` of shape (P, D, w, D) — the Hamiltonian
    environment seen by each device's segment from the rest of the chain
    (exclusive prefix/suffix products of the segment transfer operators).
    These seed the per-segment sweeps of the chain-parallel TDVP.
    """
    D = cores.shape[1]
    w = Ws.shape[1]
    dim = D * w * D

    def local(cseg, wseg):
        def site_transfer(carry, cw):
            c, W = cw
            t = jnp.einsum(
                "lnr,anmb,qmp->laqrbp", c.conj(), W, c, precision=PREC
            ).reshape(dim, dim)
            return carry @ t, None

        eye = jnp.eye(dim, dtype=cseg.dtype)
        m_loc, _ = jax.lax.scan(site_transfer, eye, (cseg, wseg))
        mats = jax.lax.all_gather(m_loc, axis)  # (P, dim, dim)
        idx = jax.lax.axis_index(axis)
        nseg = mats.shape[0]

        # exclusive prefix product (row vector from the left edge)
        left_vec = jnp.zeros((dim,), dtype=cseg.dtype).at[0].set(1.0)

        def pref(carry, k):
            vec = carry
            take = k < idx
            new = jnp.where(take, vec @ mats[k], vec)
            return new, None

        left_vec, _ = jax.lax.scan(pref, left_vec, jnp.arange(nseg))

        # exclusive suffix product (column vector from the right edge)
        right_vec = jnp.zeros((dim,), dtype=cseg.dtype).at[0].set(1.0)

        def suff(carry, k_rev):
            vec = carry
            take = k_rev > idx
            new = jnp.where(take, mats[k_rev] @ vec, vec)
            return new, None

        right_vec, _ = jax.lax.scan(
            suff, right_vec, jnp.arange(nseg - 1, -1, -1)
        )
        Lb = left_vec.reshape(D, w, D)
        Rb = right_vec.reshape(D, w, D)
        return Lb[None], Rb[None]

    fn = _shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)), check_vma=False,
    )
    return jax.jit(fn)(cores, Ws)
