"""Radical-pair spin chain: Liouville-space MPDO model builder.

The reference's flagship open-system workflow
(``/root/reference/docs/notebook/radicalpair-liouville.ipynb``) builds the
vectorised Liouvillian of two electron spins (one 4-dim electron-pair
site) hyperfine-coupled to nuclear spins (one site per nucleus, physical
dim = multiplicity²) under a magnetic field, with exchange/dipolar
electron-electron terms and Haberkorn singlet/triplet recombination.  The
reference constructs the one-particle operators with the external
RadicalPy library; here the (textbook) spin operators and gyromagnetic
ratios are built in, so the model is self-contained.

Site ordering follows the notebook: nuclei of radical 1, the
electron-pair site, nuclei of radical 2.  Vectorisation is row-major
(vec(AρB) = (A ⊗ Bᵀ)·vec(ρ)), matching the engine's Liouville
convention: bra-side factors enter as ``kron(Oᵀ, 1)`` and ket-side as
``kron(1, O)`` — see :func:`twin_l` / :func:`twin_r`.

Units: couplings are given in mT (RadicalPy convention) and multiplied by
the gyromagnetic ratio γ [rad/s/mT] and ``scale`` (default 1e-9), so the
Liouvillian is in rad/ns and a ``dt`` of 1 propagates 1 ns.
"""

from __future__ import annotations

import math

import numpy as np

from pytdscf_tpu.basis import Exciton
from pytdscf_tpu.operators.symbolic import (
    AssignManager,
    OpSite,
    SumOfProducts,
    get_eye_site,
)

#: gyromagnetic ratios in rad·s⁻¹·mT⁻¹ (electron, ¹H, ¹⁴N) — the values
#: RadicalPy ships (CODATA γ/2π · 2π, mT).
GAMMA_E = -1.76085963023e8
GAMMA_1H = 2.6752218744e5
GAMMA_14N = 1.9337792e4


def spin_matrices(multiplicity: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(Sx, Sy, Sz) for spin s = (multiplicity−1)/2, ħ = 1."""
    s = (multiplicity - 1) / 2
    m = np.arange(s, -s - 1, -1)
    sp = np.zeros((multiplicity, multiplicity))
    for k in range(multiplicity - 1):
        sp[k, k + 1] = math.sqrt(s * (s + 1) - m[k + 1] * (m[k + 1] + 1))
    sx = 0.5 * (sp + sp.T)
    sy = -0.5j * (sp - sp.T)
    sz = np.diag(m.astype(float))
    return sx, sy, sz


def twin_l(op: np.ndarray) -> np.ndarray:
    """Bra-side superoperator factor: vec(Oρ)=(O⊗1)... in the engine's
    row-major convention ``kron(op, 1)`` acts from the LEFT on ρ."""
    return np.kron(op, np.eye(op.shape[0], dtype=op.dtype))


def twin_r(op: np.ndarray) -> np.ndarray:
    """Ket-side factor: ρ·op ↦ ``kron(1, opᵀ)``·vec(ρ) (row-major)."""
    return np.kron(np.eye(op.shape[0], dtype=op.dtype), op.T)


def radical_pair_liouvillian(
    hfcs_1: list[tuple[int, float]] | None = None,
    hfcs_2: list[tuple[int, float]] | None = None,
    B0: float = 0.2,
    J: float = 0.1,
    D0: float = -0.1,
    kS: float = 1.0e06,
    kT: float = 1.0e06,
    scale: float = 1.0e-09,
):
    """Build (basis, mpo, ele_site) for the radical-pair Liouvillian.

    Args:
        hfcs_1 / hfcs_2: per-nucleus ``(multiplicity, A_mT)`` for radicals
            1 and 2 (defaults: one ¹H at 0.4 mT / one ¹⁴N at 0.5 mT — the
            notebook's small case).
        B0: magnetic field along z [mT].
        J / D0: exchange / dipolar couplings [mT] (D0 ≤ 0; the tensor is
            (2/3)·diag(−1,−1,2)·D0 as in the notebook).
        kS / kT: Haberkorn singlet/triplet recombination rates [s⁻¹].
        scale: energy rescale (1e-9 ⇒ rad/ns, the notebook's choice).

    Returns:
        ``(basis, mpo, ele_site)`` — Exciton bases (physical dims d²),
        the numerical MPO core list of the (non-Hermitian) Liouvillian
        H_eff with i dρ/dt = H_eff ρ, and the electron-pair site index.
    """
    if hfcs_1 is None:
        hfcs_1 = [(2, 0.4)]
    if hfcs_2 is None:
        hfcs_2 = [(3, 0.5)]

    # electron-pair site: product Zeeman basis {αα, αβ, βα, ββ}
    sx, sy, sz = spin_matrices(2)
    E2 = np.eye(2)
    S1 = [np.kron(m, E2) for m in (sx, sy, sz)]
    S2 = [np.kron(E2, m) for m in (sx, sy, sz)]
    singlet = np.zeros(4, dtype=complex)
    singlet[1], singlet[2] = 1 / math.sqrt(2), -1 / math.sqrt(2)
    Qs = np.outer(singlet, singlet.conj())
    Qt = np.eye(4) - Qs

    ele_site = len(hfcs_1)
    nsite = len(hfcs_1) + 1 + len(hfcs_2)
    nuclei: list[tuple[int, int, float]] = []  # (site, multiplicity, A_mT)
    for k, (mult, A) in enumerate(hfcs_1):
        nuclei.append((k, mult, A))
    for k, (mult, A) in enumerate(hfcs_2):
        nuclei.append((ele_site + 1 + k, mult, A))

    def gamma_n(mult: int) -> float:
        return GAMMA_1H if mult == 2 else GAMMA_14N

    def OL(tag: str, site: int, op: np.ndarray) -> OpSite:
        return OpSite(f"L:{tag}", site, value=twin_l(op))

    def OR(tag: str, site: int, op: np.ndarray) -> OpSite:
        return OpSite(f"R:{tag}", site, value=twin_r(op))

    xyz = "xyz"
    sop = SumOfProducts()

    # Zeeman along z: H_Z = −B0 (γe Sz¹ + γe Sz² + Σ γn Iz) — commutator
    # form twin_l(H) − twin_r(H)
    for i, S in enumerate((S1, S2)):
        c = -B0 * GAMMA_E * scale
        sop += c * OL(f"Sz{i}", ele_site, S[2])
        sop -= c * OR(f"Sz{i}", ele_site, S[2])
    for site, mult, _A in nuclei:
        Iz = spin_matrices(mult)[2]
        c = -B0 * gamma_n(mult) * scale
        sop += c * OL(f"Iz{site}", site, Iz)
        sop -= c * OR(f"Iz{site}", site, Iz)

    # isotropic hyperfine: |γe| Σ_ij A_ij (S_i · I_ij)
    for site, mult, A in nuclei:
        Svec = S1 if site < ele_site else S2
        i_ele = 0 if site < ele_site else 1
        Imats = spin_matrices(mult)
        c = abs(GAMMA_E) * A * scale
        for r in range(3):
            tagS, tagI = f"S{xyz[r]}{i_ele}", f"I{xyz[r]}{site}"
            sop += c * OL(tagS, ele_site, Svec[r]) * OL(tagI, site, Imats[r])
            sop -= c * OR(tagS, ele_site, Svec[r]) * OR(tagI, site, Imats[r])

    # exchange: −J|γe| (2 S1·S2 + E/2)
    if J != 0.0:
        S1S2 = sum(a @ b for a, b in zip(S1, S2))
        Hj = -J * abs(GAMMA_E) * scale * (2 * S1S2 + 0.5 * np.eye(4))
        sop += OL("Hj", ele_site, Hj)
        sop -= OR("Hj", ele_site, Hj)

    # dipolar: |γe| S1ᵀ·D·S2 with D = (2/3)·diag(−1,−1,2)·D0
    if D0 != 0.0:
        if D0 > 0:
            raise ValueError("D0 must be ≤ 0 (axial dipolar tensor)")
        Dt = (2.0 / 3.0) * np.diag((-1.0, -1.0, 2.0)) * D0
        Hd = abs(GAMMA_E) * scale * sum(
            Dt[k, k] * S1[k] @ S2[k] for k in range(3)
        )
        sop += OL("Hd", ele_site, Hd)
        sop -= OR("Hd", ele_site, Hd)

    # Haberkorn: i dρ/dt ⊇ −(i/2) Σ k_i {Q_i, ρ}
    for rate, Q, tag in ((kS, Qs, "Qs"), (kT, Qt, "Qt")):
        if rate != 0.0:
            c = -0.5j * rate * scale
            sop += c * (OL(tag, ele_site, Q) + OR(tag, ele_site, Q))

    # anchor every site so the MPO covers the full chain
    dims = {site: mult**2 for site, mult, _ in nuclei}
    dims[ele_site] = 16
    eye_prod = get_eye_site(0, dims[0])
    for site in range(1, nsite):
        eye_prod = eye_prod * get_eye_site(site, dims[site])
    sop += 0.0 * eye_prod

    am = AssignManager(sop.simplify())
    am.assign()
    mpo = am.numerical_mpo()

    basis = [Exciton(dims[s]) for s in range(nsite)]
    return basis, mpo, ele_site


def singlet_product_state(basis, ele_site: int) -> list[list[float]]:
    """Hartree product: vec(Qs) at the electron site, maximally mixed
    nuclei (vec(1/d)) elsewhere — the notebook's initial ensemble."""
    singlet = np.zeros(4, dtype=complex)
    singlet[1], singlet[2] = 1 / math.sqrt(2), -1 / math.sqrt(2)
    Qs = np.outer(singlet, singlet.conj())
    hp = []
    for isite, b in enumerate(basis):
        if isite == ele_site:
            hp.append(Qs.reshape(-1))
        else:
            d = math.isqrt(b.nstate)
            hp.append(np.eye(d, dtype=complex).reshape(-1))
    return hp
