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


def kraus_rank(B: np.ndarray) -> int:
    """Number of Kraus operators (channel rank)."""
    return int(np.asarray(B).shape[0])


def trace_out_ancilla(rdm: np.ndarray, d: int) -> np.ndarray:
    """Trace the ancilla (Kraus) subdimension out of a combined-site RDM.

    ``rdm`` has physical⊗ancilla legs of size d·K; returns the d×d system
    block (batched over a leading time axis if present) — reference
    ``/root/reference/pytdscf/kraus.py:434-455``.
    """
    rdm = np.asarray(rdm)
    dK = rdm.shape[-1]
    if dK % d != 0:
        raise ValueError(f"combined dim {dK} not divisible by system d={d}")
    K = dK // d
    if rdm.ndim == 2:
        return np.einsum("dKxK->dx", rdm.reshape(d, K, d, K))
    return np.einsum("tdKxK->tdx", rdm.reshape(-1, d, K, d, K))


def trace_kraus_dim(*args):
    """Deprecated: ``trace_kraus_dim(B)`` meant the channel rank in an
    earlier revision; use :func:`kraus_rank` for that, or
    :func:`trace_out_ancilla` for the ancilla partial trace."""
    import warnings

    if len(args) == 1:
        warnings.warn(
            "trace_kraus_dim(B) is deprecated; use kraus_rank(B)",
            DeprecationWarning, stacklevel=2,
        )
        return kraus_rank(args[0])
    if len(args) == 2:
        warnings.warn(
            "trace_kraus_dim(rdm, d) is deprecated; use "
            "trace_out_ancilla(rdm, d)",
            DeprecationWarning, stacklevel=2,
        )
        return trace_out_ancilla(*args)
    raise TypeError(
        "trace_kraus_dim takes 1 (deprecated kraus_rank) or 2 "
        "(deprecated trace_out_ancilla) arguments"
    )


def _masked_svd(mat, keep: int):
    """SVD with junk-channel suppression, fixed output rank ``keep``.

    The TPU backend's SVD emits garbage (1e9-scale) entries in the
    near-null singular subspace of rank-deficient complex matrices;
    singular values and the columns above the cut stay usable.  Masking
    sub-cut channels to EXACT zero (jnp.where, not multiply-by-zero)
    keeps junk from leaking into either factor.
    """
    import jax.numpy as jnp

    u, s, vh = jnp.linalg.svd(mat, full_matrices=False)
    if keep > s.shape[0]:  # static: pad null channels with exact zeros
        pad = keep - s.shape[0]
        u = jnp.pad(u, ((0, 0), (0, pad)))
        s = jnp.pad(s, (0, pad))
        vh = jnp.pad(vh, ((0, pad), (0, 0)))
    u, s, vh = u[:, :keep], s[:keep], vh[:keep]
    eps = jnp.finfo(s.dtype).eps
    cut = 100.0 * eps * jnp.maximum(s[0], jnp.asarray(0.0, s.dtype))
    mask = s > cut
    sm = jnp.where(mask, s, 0.0)
    u = jnp.where(mask[None, :], u, 0.0)
    vh = jnp.where(mask[:, None], vh, 0.0)
    return u, sm, vh


def _two_site_device_impl(core_l, core_r, G, keep: int):
    import jax
    import jax.numpy as jnp

    HI = jax.lax.Precision.HIGHEST
    l, n1, _ = core_l.shape
    _, n2, r = core_r.shape
    joint = jnp.einsum("lnm,mkr->lnkr", core_l, core_r, precision=HI)
    joint = joint.reshape(l, n1 * n2, r)
    joint = jnp.einsum("nm,lmr->lnr", G, joint, precision=HI)
    joint = joint.reshape(l * n1, n2 * r)
    u, sm, vh = _masked_svd(joint, keep)
    new_l = (u * sm[None, :].astype(u.dtype)).reshape(l, n1, keep)
    new_r = vh.reshape(keep, n2, r)
    return new_l, new_r


def _purified_single_impl(core, B):
    """Channel on the physical part of a combined phys⊗ancilla site.

    ``core`` (m, d·K, n); ``B`` (k, d, d).  Σ_k B_k|ψ⟩⊗|k⟩ re-compressed
    back to ancilla dimension K by SVD over (m·n·d, k·K) — reference
    ``_kraus_contract_single_site_np`` (``/root/reference/pytdscf/kraus.py:146``).
    """
    import jax
    import jax.numpy as jnp

    HI = jax.lax.Precision.HIGHEST
    k, x, d = B.shape
    m, dK, n = core.shape
    K = dK // d
    A = core.reshape(m, d, K, n)
    C = jnp.einsum("kxd,mdKn->mnxkK", B, A, precision=HI)
    C = C.reshape(m * n * x, k * K)
    u, sm, _ = _masked_svd(C, K)
    A = (u * sm[None, :].astype(u.dtype)).reshape(m, n, x * K)
    return jnp.swapaxes(A, 1, 2)


def _purified_pair_impl(core_1, core_2, B):
    """Channel on a physical site with the ancilla on the neighbour site.

    ``core_1`` (m, d, l) physical, ``core_2`` (l, K, n) ancilla; the Kraus
    index folds into the ancilla dimension (kept at K), then the bond is
    re-split at l — reference ``_kraus_contract_two_site_np``
    (``/root/reference/pytdscf/kraus.py:258-433``).
    """
    import jax
    import jax.numpy as jnp

    HI = jax.lax.Precision.HIGHEST
    k, x, d = B.shape
    m, _, l = core_1.shape
    _, K, n = core_2.shape
    C = jnp.einsum(
        "kxd,mdl,lKn->mxnkK", B, core_1, core_2, precision=HI
    )
    C = C.reshape(m * x * n, k * K)
    u, sm, _ = _masked_svd(C, K)
    C = (u * sm[None, :].astype(u.dtype)).reshape(m, x, n, K)
    C = jnp.swapaxes(C, 2, 3).reshape(m * x, K * n)
    u, sm, vh = _masked_svd(C, l)
    A1 = (u * sm[None, :].astype(u.dtype)).reshape(m, x, l)
    A2 = vh.reshape(l, K, n)
    return A1, A2


_jits: dict = {}


def _jitted(name: str, impl, static=()):
    fn = _jits.get(name)
    if fn is None:
        import jax

        fn = _jits[name] = jax.jit(impl, static_argnames=static)
    return fn


def kraus_two_site_device(core_l, core_r, G, keep: int):
    """Jitted on-device two-site (Liouville joint-supergate) application.

    Device analogue of :func:`kraus_contract_two_site`: joint contraction
    with the dense supergate ``G`` and masked fixed-shape SVD resplit — no
    device→host round trip of the two largest cores per step.  ``keep``
    must be static (``min(l·n1, n2·r, max_bond)``).
    """
    return _jitted("two_site", _two_site_device_impl, ("keep",))(
        core_l, core_r, G, keep=keep
    )


def kraus_purified_single_device(core, B):
    """Jitted purified single-site channel (phys⊗ancilla on one site)."""
    return _jitted("purified_single", _purified_single_impl)(core, B)


def kraus_purified_pair_device(core_1, core_2, B):
    """Jitted purified channel: physical site + adjacent ancilla site."""
    return _jitted("purified_pair", _purified_pair_impl)(core_1, core_2, B)
