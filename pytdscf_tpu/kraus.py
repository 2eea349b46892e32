"""Lindblad dissipators → Kraus channels and their MPS/MPDO application.

Functional parity with ``/root/reference/pytdscf/kraus.py``:
``lindblad_to_kraus`` converts jump operators {L_j} to a Kraus set {B_q}
via the Choi matrix of exp(D·dt) (same PRL 116, 237201 construction), and
the contraction helpers apply a channel to vectorised-density-matrix MPS
cores.  Applying Σ_q B_q ⊗ B_q* to one site is algebraically identical to
applying the dense supergate, so the single-site path contracts the
supergate directly (one einsum on device); the Kraus factorisation is kept
for channel analysis and for the two-site path where the Kraus rank bounds
the bond growth before SVD truncation.
"""

from __future__ import annotations

from math import isqrt
from typing import Literal

import numpy as np
from scipy.linalg import expm


def lindblad_dissipator(Lops: list[np.ndarray]) -> np.ndarray:
    """D = Σ_j [L⊗L* − ½(L†L⊗I + I⊗LᵀL*)] (row-major vectorisation)."""
    d = Lops[0].shape[0]
    eye = np.eye(d)
    D = np.zeros((d * d, d * d), dtype=complex)
    for L in Lops:
        if L.ndim != 2 or L.shape[0] != L.shape[1]:
            raise ValueError(f"jump operator must be square, got {L.shape}")
        Ldag = L.conj().T
        D += np.kron(L, L.conj()) - 0.5 * (
            np.kron(Ldag @ L, eye) + np.kron(eye, L.T @ L.conj())
        )
    if np.allclose(D.imag, 0.0):
        D = D.real.astype(float)
    return D


def supergate_to_kraus(G: np.ndarray, tol: float = 1.0e-14) -> np.ndarray:
    """Factor a supergate G = Σ_q B_q ⊗ B_q* via its Choi matrix.

    Returns the stacked Kraus tensor ``B[q, d, d]`` keeping Choi eigenvalues
    above ``tol`` RELATIVE to the largest one.  The reconstruction residual
    is validated against a tolerance scaled to ‖G‖ (a hard absolute assert
    here would crash on numerically valid channels whose dropped
    eigenvalues sit near the cutoff for larger d or dt).
    """
    d = isqrt(G.shape[0])
    S4 = G.reshape(d, d, d, d)  # S[(α β),(μ ν)] row-major
    # Choi: J[(α μ),(β ν)] = S[α,β,μ,ν] with row-major vec convention
    J = np.transpose(S4, (0, 2, 1, 3)).reshape(d * d, d * d)
    J = (J + J.conj().T) / 2
    w, V = np.linalg.eigh(J)
    w_max = max(float(w[-1].real), 1e-300)
    kraus = [
        np.sqrt(lam.real) * v.reshape(d, d)
        for lam, v in zip(w, V.T)
        if lam.real > tol * w_max
    ]
    B = np.stack(kraus, axis=0)
    recon = sum(np.kron(b, b.conj()) for b in B)
    g_norm = max(np.linalg.norm(G), 1e-300)
    resid = float(np.linalg.norm(recon - G)) / g_norm
    if resid > 1.0e-08:
        raise ValueError(
            f"Kraus factorisation failed: relative reconstruction residual "
            f"{resid:.2e} (the supergate is not completely positive to "
            "working precision, or tol is too aggressive)"
        )
    return B


def lindblad_to_kraus(
    Lops: list[np.ndarray],
    dt: float,
    backend: Literal["numpy", "jax"] = "numpy",
) -> np.ndarray:
    """Kraus tensor B[q, d, d] with exp(D·dt) = Σ_q B_q ⊗ B_q*."""
    if dt <= 0:
        raise ValueError("dt must be positive")
    D = lindblad_dissipator(list(Lops))
    gate = expm(D * dt)
    B = supergate_to_kraus(gate)
    if backend == "jax":
        import jax.numpy as jnp

        return jnp.asarray(B)
    return B


def kraus_supergate(B: np.ndarray) -> np.ndarray:
    """Σ_q B_q ⊗ B_q* — dense superoperator of the channel."""
    return sum(np.kron(b, b.conj()) for b in np.asarray(B))


def kraus_contract_single_site(
    core: np.ndarray, B: np.ndarray
) -> np.ndarray:
    """Apply the channel to one vectorised-ρ site core (l, d², r).

    Mathematically Σ_q (B_q ⊗ B_q*)·vec — computed as one dense supergate
    contraction (exact; no truncation needed for a single site).
    """
    G = kraus_supergate(B)
    return np.einsum("nm,lmr->lnr", G, core)


def kraus_contract_two_site(
    core_l: np.ndarray,
    core_r: np.ndarray,
    B: np.ndarray,
    max_bond: int | None = None,
    tol: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Apply a two-site channel B[q, d1·d2, d1·d2] across a bond.

    The joint two-site tensor is contracted with the supergate and split
    back by SVD; ``max_bond`` caps the new bond (reference
    ``kraus_contract_two_site``, ``/root/reference/pytdscf/kraus.py:258-433``).
    """
    l, n1, m = core_l.shape
    m2, n2, r = core_r.shape
    joint = np.einsum("lnm,mkr->lnkr", core_l, core_r).reshape(l, n1 * n2, r)
    G = kraus_supergate(B)
    joint = np.einsum("nm,lmr->lnr", G, joint).reshape(l * n1, n2 * r)
    u, s, vh = np.linalg.svd(joint, full_matrices=False)
    keep = int(np.sum(s > tol * s[0])) if s.size and s[0] > 0 else 1
    keep = max(keep, 1)
    if max_bond is not None:
        keep = min(keep, max_bond)
    new_l = (u[:, :keep] * s[:keep]).reshape(l, n1, keep)
    new_r = vh[:keep].reshape(keep, n2, r)
    return new_l, new_r


def trace_kraus_dim(B: np.ndarray) -> int:
    """Number of Kraus operators (channel rank)."""
    return int(np.asarray(B).shape[0])
