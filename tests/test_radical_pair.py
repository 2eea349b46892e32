"""Radical-pair Liouville MPDO vs dense exact propagation.

Reference workflow: ``/root/reference/docs/notebook/radicalpair-liouville
.ipynb`` (two electron spins + nuclear spins, Zeeman/hyperfine/exchange/
dipolar + Haberkorn recombination, vectorised density matrix).  The small
case (one ¹H on radical 1, one ¹⁴N on radical 2) is dense-checkable:
the MPDO propagation must reproduce expm(−i·L·t)·vec(ρ₀) exactly (the
3-site MPDO with bond dims (4, 9) ≤ 16 is an exact parameterisation).
"""

import math

import numpy as np
import pytest
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.radical_pair import (
    radical_pair_liouvillian,
    singlet_product_state,
    spin_matrices,
    twin_l,
    twin_r,
    GAMMA_E,
    GAMMA_1H,
    GAMMA_14N,
)
from pytdscf_tpu.simulator import Simulator

B0, J, D0, KS, KT = 0.2, 0.1, -0.1, 1.0e06, 1.0e06
SCALE = 1.0e-09
DT = 0.5  # model units (ns with scale=1e-9)
NSTEP = 20


def _dense_liouvillian():
    """Independent dense H_eff (i dvec/dt = H_eff vec) on C^(4·16·9)."""
    sx, sy, sz = spin_matrices(2)
    E2 = np.eye(2)
    S1 = [np.kron(m, E2) for m in (sx, sy, sz)]
    S2 = [np.kron(E2, m) for m in (sx, sy, sz)]
    Ims = spin_matrices(3)
    singlet = np.zeros(4, dtype=complex)
    singlet[1], singlet[2] = 1 / math.sqrt(2), -1 / math.sqrt(2)
    Qs = np.outer(singlet, singlet.conj())
    Qt = np.eye(4) - Qs

    d1, de, d2 = 2, 4, 3

    def k3(a, b, c):
        return np.kron(np.kron(a, b), c)

    E1, Ee, E2n = np.eye(d1), np.eye(de), np.eye(d2)
    H = np.zeros((d1 * de * d2,) * 2, dtype=complex)
    # Zeeman
    for S in (S1, S2):
        H += -B0 * GAMMA_E * SCALE * k3(E1, S[2], E2n)
    H += -B0 * GAMMA_1H * SCALE * k3(sz, Ee, E2n)
    H += -B0 * GAMMA_14N * SCALE * k3(E1, Ee, Ims[2])
    # hyperfine
    Ihalf = spin_matrices(2)
    for r in range(3):
        H += abs(GAMMA_E) * 0.4 * SCALE * k3(Ihalf[r], S1[r], E2n)
        H += abs(GAMMA_E) * 0.5 * SCALE * k3(E1, S2[r], Ims[r])
    # exchange + dipolar
    S1S2 = sum(a @ b for a, b in zip(S1, S2))
    H += -J * abs(GAMMA_E) * SCALE * k3(E1, 2 * S1S2 + 0.5 * Ee, E2n)
    Dt = (2.0 / 3.0) * np.diag((-1.0, -1.0, 2.0)) * D0
    H += abs(GAMMA_E) * SCALE * k3(
        E1, sum(Dt[r, r] * S1[r] @ S2[r] for r in range(3)), E2n
    )
    Heff = twin_l(H) - twin_r(H)
    # Haberkorn
    for rate, Q in ((KS, Qs), (KT, Qt)):
        Qf = k3(E1, Q, E2n)
        Heff += -0.5j * rate * SCALE * (twin_l(Qf) + twin_r(Qf))
    return Heff


def _dense_trajectory():
    """ρ_e(t) diagonals from dense expm propagation, steps 0..NSTEP."""
    Heff = _dense_liouvillian()
    n = 2 * 4 * 3
    rho0 = np.zeros((n, n), dtype=complex)
    singlet = np.zeros(4, dtype=complex)
    singlet[1], singlet[2] = 1 / math.sqrt(2), -1 / math.sqrt(2)
    Qs = np.outer(singlet, singlet.conj())
    rho0 = np.kron(np.kron(np.eye(2), Qs), np.eye(3))
    rho0 /= np.trace(rho0)
    U = expm(-1.0j * Heff * DT)
    vec = rho0.reshape(-1)
    out = []
    for _ in range(NSTEP + 1):
        rho = vec.reshape(2, 4, 3, 2, 4, 3)
        out.append(np.einsum("aikajk->ij", rho))
        vec = U @ vec
    return np.array(out)  # (NSTEP+1, 4, 4)


def test_radical_pair_matches_dense(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    basis, mpo, ele_site = radical_pair_liouvillian(
        hfcs_1=[(2, 0.4)], hfcs_2=[(3, 0.5)],
        B0=B0, J=J, D0=D0, kS=KS, kT=KT, scale=SCALE,
    )
    assert ele_site == 1
    model = Model(basis, {"hamiltonian": mpo}, space="liouville", bond_dim=16)
    model.init_HartreeProduct = [singlet_product_state(basis, ele_site)]
    sim = Simulator("radpair", model, verbose=0)
    sim.propagate(
        reduced_density=([(ele_site, ele_site)], 1),
        maxstep=NSTEP + 1,
        stepsize=DT * units.au_in_fs,
        autocorr=False, energy=False, norm=False, populations=False,
        conserve_norm=False, integrator="arnoldi",
    )
    from pytdscf_tpu.util import read_nc

    rd = read_nc("radpair_prop/reduced_density.nc", [(ele_site, ele_site)])
    got = np.asarray(rd[(ele_site, ele_site)])[: NSTEP + 1]
    want = _dense_trajectory()
    # trace decays under Haberkorn: both must agree to integrator accuracy
    np.testing.assert_allclose(got, want, atol=5.0e-07)
    # sanity: recombination actually removes population
    assert np.trace(want[-1]).real < np.trace(want[0]).real - 1.0e-04


def test_radical_pair_mpo_is_compact():
    """The fused Liouvillian MPO must stay narrow (complementary-operator
    channels): w ≤ ~14 on nuclear bonds for 4+4 spin-1/2 nuclei — the
    χ=1024 benchmark's matvec cost scales linearly in this width."""
    hf = [(2, 0.3 + 0.1 * k) for k in range(4)]
    basis, mpo, ele = radical_pair_liouvillian(hfcs_1=hf, hfcs_2=hf)
    widths = [c.shape[0] for c in mpo[1:]]
    assert max(widths) <= 16, widths


def test_radical_pair_split_electron_matches_dense(tmp_path, monkeypatch):
    """split_electron=True (one 4-dim site per electron spin — the
    large-χ TN layout) reproduces the same dense trajectory: exchange /
    dipolar / Haberkorn as two-site terms are exactly equivalent to the
    notebook's single 16-dim pair site."""
    monkeypatch.chdir(tmp_path)
    basis, mpo, ele_site = radical_pair_liouvillian(
        hfcs_1=[(2, 0.4)], hfcs_2=[(3, 0.5)],
        B0=B0, J=J, D0=D0, kS=KS, kT=KT, scale=SCALE,
        split_electron=True,
    )
    assert [b.nstate for b in basis] == [4, 4, 4, 9]
    model = Model(basis, {"hamiltonian": mpo}, space="liouville", bond_dim=16)
    model.init_HartreeProduct = [
        singlet_product_state(basis, ele_site, split_electron=True)
    ]
    sim = Simulator("radpair_sp", model, verbose=0)
    _, wf = sim.propagate(
        maxstep=NSTEP, stepsize=DT * units.au_in_fs,
        autocorr=False, energy=False, norm=False, populations=False,
        conserve_norm=False, integrator="arnoldi",
    )
    # full electron-pair block after NSTEP steps, from the engine RDM:
    # (a1,b1,a2,b2) kept site-major → ρ_e[(a1 a2), (b1 b2)]
    got_pair = wf.engine.reduced_density_liouville((0, 2, 2))
    got = np.asarray(got_pair).transpose(0, 2, 1, 3).reshape(4, 4)
    want = _dense_trajectory()[-1]  # state after NSTEP steps
    np.testing.assert_allclose(got, want, atol=5.0e-07)
