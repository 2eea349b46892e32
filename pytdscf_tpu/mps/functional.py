"""Purely functional, fully traceable TDVP step (single electronic state).

Unlike :class:`~pytdscf_tpu.mps.tdvp.TDVPEngine` (which dispatches one fused
XLA computation per site and keeps Python-side environment stacks), this
module expresses an ENTIRE projector-splitting TDVP time step — forward +
backward half-sweeps over all sites — as one traceable function of the core
tensors.  It is the building block for

* multi-chip execution (``shard_map`` over a device mesh: batched
  trajectories on a data axis, chain segments on a sequence axis), and
* whole-step ``jax.jit`` compilation where dispatch latency would otherwise
  dominate (many small sites).

Reference semantics: ``/root/reference/pytdscf/_mps_cls.py:452-1170`` (one
step = two half-sweeps of dt/2; per site exp(−i·dt/2·H_eff), QR gauge move,
backward exp(+i·dt/2·K_eff) on the bond).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytdscf_tpu.mps import kernels as K
from pytdscf_tpu.mps.integrator import krylov_expm

Cores = tuple[jax.Array, ...]


def _site_expm(
    mv_shape, L, W, R, psi, scale, thresh, max_dim, conserve_norm, arnoldi
):
    def mv(vec):
        return K.heff_apply(L, W, R, vec.reshape(mv_shape)).ravel()

    out = krylov_expm(
        mv, psi.ravel(), scale, thresh, max_dim=max_dim,
        conserve_norm=conserve_norm, arnoldi=arnoldi,
    )
    return out.reshape(mv_shape)


def _bond_expm(L, R, sig, scale, thresh, max_dim, conserve_norm, arnoldi):
    shape = sig.shape

    def mv(vec):
        return K.keff_apply(L, R, vec.reshape(shape)).ravel()

    out = krylov_expm(
        mv, sig.ravel(), scale, thresh, max_dim=max_dim,
        conserve_norm=conserve_norm, arnoldi=arnoldi,
    )
    return out.reshape(shape)


def right_env_stack(cores: Cores, Ws: Cores) -> list[jax.Array]:
    """Environment blocks R(p) for p = 0..N−1 (R(N−1) trivial)."""
    nsite = len(cores)
    blocks = [None] * nsite
    blk = jnp.ones((1, 1, 1), dtype=cores[0].dtype)
    blocks[nsite - 1] = blk
    for p in range(nsite - 1, 0, -1):
        blk = K.renorm_block_right(blk, cores[p], Ws[p], cores[p])
        blocks[p - 1] = blk
    return blocks


def tdvp_step(
    cores: Cores,
    Ws: Cores,
    scale: jax.Array,
    thresh: float = 1.0e-08,
    max_krylov: int = 20,
    conserve_norm: bool = True,
    arnoldi: bool = False,
    splitting: str = "lt2",
) -> Cores:
    """One full TDVP step on a right-canonical MPS (Psi at site 0).

    ``scale`` is the HALF-step exponent factor (−i·dt/2 for real time).
    ``arnoldi=True`` selects the non-Hermitian Krylov variant (complex
    absorbing potentials / Liouvillians; pair with
    ``conserve_norm=False`` so the norm decay is physical).
    ``splitting`` composes the symmetric step to 4th order
    ("suzuki4"/"yoshida4", see :func:`pytdscf_tpu.mps.tdvp.splitting_coeffs`).
    Returns cores in the same gauge.  Fully traceable (no host sync).
    """
    from pytdscf_tpu.mps.tdvp import splitting_coeffs

    coeffs = splitting_coeffs(splitting)
    if len(coeffs) > 1:
        for w in coeffs:
            cores = tdvp_step(
                cores, Ws, scale * w, thresh=thresh,
                max_krylov=max_krylov, conserve_norm=conserve_norm,
                arnoldi=arnoldi,
            )
        return cores
    nsite = len(cores)
    cores = list(cores)

    for forward in (True, False):
        if forward:
            env = right_env_stack(tuple(cores), Ws)
            order = range(nsite)
        else:
            env = left_env_stack(tuple(cores), Ws)
            order = range(nsite - 1, -1, -1)
        sys_blk = jnp.ones((1, 1, 1), dtype=cores[0].dtype)
        for p in order:
            L, R = (sys_blk, env[p]) if forward else (env[p], sys_blk)
            psi = _site_expm(
                cores[p].shape, L, Ws[p], R, cores[p], scale,
                thresh, max_krylov, conserve_norm, arnoldi,
            )
            last = p == (nsite - 1 if forward else 0)
            if last:
                cores[p] = psi
                break
            if forward:
                a, sig = K.qr_right(psi)
                cores[p] = a
                sys_blk = K.renorm_block_left(sys_blk, a, Ws[p], a)
                sig = _bond_expm(
                    sys_blk, env[p], sig, -scale, thresh, max_krylov,
                    conserve_norm, arnoldi,
                )
                cores[p + 1] = K.absorb_right(sig, cores[p + 1])
            else:
                sig, b = K.lq_left(psi)
                cores[p] = b
                sys_blk = K.renorm_block_right(sys_blk, b, Ws[p], b)
                sig = _bond_expm(
                    env[p], sys_blk, sig, -scale, thresh, max_krylov,
                    conserve_norm, arnoldi,
                )
                cores[p - 1] = K.absorb_left(cores[p - 1], sig)
    return tuple(cores)


def left_env_stack(cores: Cores, Ws: Cores) -> list[jax.Array]:
    """Environment blocks L(p) for p = 0..N−1 (L(0) trivial)."""
    nsite = len(cores)
    blocks = [None] * nsite
    blk = jnp.ones((1, 1, 1), dtype=cores[0].dtype)
    blocks[0] = blk
    for p in range(nsite - 1):
        blk = K.renorm_block_left(blk, cores[p], Ws[p], cores[p])
        blocks[p + 1] = blk
    return blocks


def energy(cores: Cores, Ws: Cores) -> jax.Array:
    """⟨Ψ|H|Ψ⟩ with Psi at site 0 (traceable)."""
    R = right_env_stack(cores, Ws)[0]
    triv = jnp.ones((1, 1, 1), dtype=cores[0].dtype)
    sig = K.heff_apply(triv, Ws[0], R, cores[0])
    return jnp.vdot(cores[0], sig)


def norm_sq(cores: Cores) -> jax.Array:
    """⟨Ψ|Ψ⟩ by plain overlap transfer (no gauge assumption; traceable).

    For CAP / non-Hermitian dynamics this is the survival probability
    (reference SSE workflow, ``docs/notebook/radicalpair-sse.ipynb``)."""
    S = jnp.ones((1, 1), dtype=cores[0].dtype)
    for c in cores:
        S = jnp.einsum("ab,anc,bnd->cd", S, c.conj(), c)
    return S[0, 0].real


def site_rdm(cores: Cores, p: int) -> jax.Array:
    """One-site reduced density ρ[m, n] = Tr_rest |Ψ⟩⟨Ψ| at site ``p``.

    ``ρ[m, n] = Σ ψ_m ψ*_n`` (row = ket index).  Contracts plain overlap
    transfer chains from both chain ends, so it holds in ANY gauge and
    for non-normalised states (CAP dynamics: Tr ρ = survival
    probability).  Traceable — the building block for batched/ensemble
    observables (reference analog: per-trajectory
    ``get_reduced_densities``,
    ``/root/reference/pytdscf/_mps_cls.py:1628``)."""
    S = jnp.ones((1, 1), dtype=cores[0].dtype)
    for q in range(p):
        c = cores[q]
        S = jnp.einsum("ab,anc,bnd->cd", S, c.conj(), c)
    T = jnp.ones((1, 1), dtype=cores[0].dtype)
    for q in range(len(cores) - 1, p, -1):
        c = cores[q]
        T = jnp.einsum("cd,anc,bnd->ab", T, c.conj(), c)
    c = cores[p]
    return jnp.einsum("ab,anc,bmd,cd->mn", S, c.conj(), c, T)
