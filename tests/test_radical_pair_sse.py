"""Hilbert-space SSE/trajectory route for the radical pair.

Reference workflow: ``/root/reference/docs/notebook/radicalpair-sse.ipynb``
(wavefunction trajectories with the Haberkorn CAP, nuclear mixed state by
ensemble averaging with projection / spin-coherent sampling).  Dense
references are built here independently of the builder's SOP/MPO route.
"""

import numpy as np
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.radical_pair import (
    GAMMA_E,
    GAMMA_1H,
    _singlet_projector,
    radical_pair_hamiltonian,
    spin_coherent_weights,
    spin_matrices,
)
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util import read_nc

B0, J, D0 = 0.2, 0.1, -0.1
KS, KT = 2.0e06, 0.5e06
SCALE = 1.0e-09
DT = 5.0  # ns (scale=1e-9 makes the MPO rad/ns)
NSTEP = 10


def test_spin_coherent_resolution_of_identity():
    """E[|Ω⟩⟨Ω|] over uniform (u_θ, u_φ) = 1/(2I+1) — the sampling
    identity that makes coherent-state SSE reproduce the mixed state."""
    for mult in (2, 3, 4):
        nodes, wts = np.polynomial.legendre.leggauss(24)
        u_t = 0.5 * (nodes + 1.0)
        w_t = 0.5 * wts
        phis = (np.arange(32) + 0.5) / 32
        acc = np.zeros((mult, mult), dtype=complex)
        for ut, wt in zip(u_t, w_t):
            for up in phis:
                w = spin_coherent_weights(mult, ut, up)
                np.testing.assert_allclose(np.vdot(w, w).real, 1.0, atol=1e-12)
                acc += wt / len(phis) * np.outer(w, w.conj())
        np.testing.assert_allclose(acc, np.eye(mult) / mult, atol=1.0e-12)


def _dense_h():
    """8-dim H_eff (nucleus ⊗ electron pair) from the published formulas."""
    sx, sy, sz = spin_matrices(2)
    E2, E4 = np.eye(2), np.eye(4)
    S1 = [np.kron(m, E2) for m in (sx, sy, sz)]
    S2 = [np.kron(E2, m) for m in (sx, sy, sz)]
    Qs = _singlet_projector()
    Qt = E4 - Qs
    Imats = spin_matrices(2)

    H = np.zeros((8, 8), dtype=complex)
    for S in (S1, S2):
        H += -B0 * GAMMA_E * SCALE * np.kron(E2, S[2])
    for r in range(3):
        H += abs(GAMMA_E) * 0.4 * SCALE * np.kron(Imats[r], S1[r])
    H += -B0 * GAMMA_1H * SCALE * np.kron(Imats[2], E4)
    S1S2 = sum(a @ b for a, b in zip(S1, S2))
    H += -J * abs(GAMMA_E) * SCALE * np.kron(E2, 2 * S1S2 + 0.5 * E4)
    Dt = (2.0 / 3.0) * np.diag((-1.0, -1.0, 2.0)) * D0
    H += abs(GAMMA_E) * SCALE * np.kron(
        E2, sum(Dt[k, k] * S1[k] @ S2[k] for k in range(3))
    )
    H += -0.5j * SCALE * np.kron(E2, KS * Qs + KT * Qt)
    return H


def test_sse_projection_ensemble_matches_dense(tmp_path, monkeypatch):
    """Averaging the 2 nuclear projection trajectories == dense evolution
    of ρ₀ = 1/2 ⊗ |S⟩⟨S| under the non-Hermitian H_eff."""
    monkeypatch.chdir(tmp_path)
    basis, mpo, ele_site = radical_pair_hamiltonian(
        hfcs_1=[(2, 0.4)], hfcs_2=[], B0=B0, J=J, D0=D0, kS=KS, kT=KT,
        scale=SCALE,
    )
    assert ele_site == 1 and len(basis) == 2

    # dense: ρ_e(t) = Tr_nuc U ρ₀ U†, U = e^{−iH_eff t}
    H = _dense_h()
    U = expm(-1.0j * H * DT)
    singlet = np.zeros(4, dtype=complex)
    singlet[1], singlet[2] = 1 / np.sqrt(2), -1 / np.sqrt(2)
    rho = np.kron(np.eye(2) / 2, np.outer(singlet, singlet.conj()))
    want = []
    for _ in range(NSTEP):
        want.append(
            np.einsum("abad->bd", rho.reshape(2, 4, 2, 4))
        )
        rho = U @ rho @ U.conj().T
    want = np.array(want)

    acc = None
    for i, nuc in enumerate(([1.0, 0.0], [0.0, 1.0])):
        model = Model(basis, {"hamiltonian": mpo}, bond_dim=4)
        model.init_HartreeProduct = [[nuc, singlet.tolist()]]
        sim = Simulator(f"sse{i}", model, verbose=0)
        sim.propagate(
            reduced_density=([(ele_site, ele_site)], 1),
            maxstep=NSTEP, stepsize=DT * units.au_in_fs,
            autocorr=False, energy=False, norm=False, populations=False,
            conserve_norm=False, integrator="arnoldi",
        )
        rd = read_nc(
            f"sse{i}_prop/reduced_density.nc", [(ele_site, ele_site)]
        )[(ele_site, ele_site)]
        acc = np.asarray(rd) if acc is None else acc + np.asarray(rd)
    got = acc[:NSTEP] / 2.0
    np.testing.assert_allclose(got[0], want[0], atol=1e-12)
    np.testing.assert_allclose(got, want, atol=1e-07)
    # physics: total survival probability decays under the CAP
    assert np.trace(want[-1]).real < 0.99


def test_sse_coherent_pair_matches_projection_pair(tmp_path, monkeypatch):
    """For spin-½, two antipodal coherent states also resolve 1/2: the
    trajectory average over {|Ω(u)⟩, |Ω(1−u, u_φ+½)⟩}… is NOT generally a
    resolution — but θ→0/θ→π (poles) reduce to the projection pair.
    Check the sampler's pole limits recover |↑⟩ and |↓⟩ exactly."""
    up = spin_coherent_weights(2, 1.0, 0.25)   # θ = 0
    dn = spin_coherent_weights(2, 0.0, 0.75)   # θ = π
    np.testing.assert_allclose(np.abs(up), [1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.abs(dn), [0.0, 1.0], atol=1e-12)
