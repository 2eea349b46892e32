"""Donor–acceptor (LE/CS) model vs dense exact dynamics.

Reference workflow: ``/root/reference/docs/notebook/donor-acceptor.ipynb``
(model A of Dorfner et al., JCTC 20, 8767 (2024)).  Dense Hamiltonians
are assembled here directly from the published tables, independently of
the builder's SOP/MPO pipeline.
"""

import numpy as np
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.basis.boson import Boson, Exciton
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.donor_acceptor import (
    BATH_G_MEV,
    BATH_OMEGA_MEV,
    EPSILON_EV,
    G_CS_EV,
    G_LE_EV,
    OMEGA_R_EV,
    T_LECS_EV,
    donor_acceptor,
    mode_number_operators,
)
from pytdscf_tpu.simulator import Simulator

EV = 1.0 / units.au_in_eV
# t_LE,CS = 0.13 eV is a ~5 fs Rabi period: dt must resolve it or the
# 1-site splitting error dominates (MPO-vs-dense itself is exact, see
# test_da_small_bath_mpo_matches_dense)
DT_FS = 0.2
NSTEP = 10


def _dense_da(n_bath, nfock):
    dims = [2] + [nfock] * (1 + n_bath)
    exc = Exciton(2)
    a = exc.get_annihilation_matrix()
    ad = exc.get_creation_matrix()
    n_cs = ad @ a
    sx = a + ad
    bos = Boson(nfock)
    x = bos.get_annihilation_matrix() + bos.get_creation_matrix()
    num = bos.get_number_matrix()

    def emb(site_mats):
        out = np.ones((1, 1), dtype=complex)
        for s, d in enumerate(dims):
            out = np.kron(out, site_mats.get(s, np.eye(d)))
        return out

    H = EPSILON_EV * EV * emb({0: n_cs})
    H += T_LECS_EV * EV * emb({0: sx})
    H += G_CS_EV * EV * emb({0: n_cs, 1: x})
    H += G_LE_EV * EV * emb({0: sx, 1: x})
    H += OMEGA_R_EV * EV * emb({1: num})
    for i in range(n_bath):
        H += BATH_G_MEV[i] * 1e-3 * EV * emb({0: n_cs, 2 + i: x})
        H += BATH_OMEGA_MEV[i] * 1e-3 * EV * emb({2 + i: num})
    return H


def _mpo_to_dense(mpo):
    t = np.ones((1, 1, 1), dtype=complex)  # (bra, ket, w)
    for core in mpo:
        t = np.einsum("bkw,wxyv->bxkyv", t, core, optimize=True)
        t = t.reshape(
            t.shape[0] * t.shape[1], t.shape[2] * t.shape[3], t.shape[4]
        )
    return t[:, :, 0]


def test_da_small_bath_mpo_matches_dense():
    """Electronic + R + 3 bath modes: compiled MPO == dense H exactly."""
    nfock = 3
    basis, ham = donor_acceptor(n_bath=3, nfock=nfock)
    assert len(basis) == 5
    mpo = [np.asarray(c) for c in ham.fused_mpo([b.nprim for b in basis])[0][0]]
    got = _mpo_to_dense(mpo)
    want = _dense_da(3, nfock)
    np.testing.assert_allclose(got, want, atol=1.0e-12)


def test_da_no_bath_matches_dense(tmp_path, monkeypatch):
    """use_bath=False analog: LE decay through the R mode vs expm."""
    monkeypatch.chdir(tmp_path)
    nfock = 8
    basis, ham = donor_acceptor(n_bath=0, nfock=nfock)
    assert len(basis) == 2
    H = _dense_da(0, nfock)
    psi = np.zeros(2 * nfock, dtype=complex)
    psi[0] = 1.0  # LE ⊗ vacuum
    U = expm(-1.0j * H * DT_FS / units.au_in_fs)
    want = []
    for _ in range(NSTEP + 1):
        t = psi.reshape(2, nfock)
        want.append(t @ t.conj().T)
        psi = U @ psi
    want = np.array(want)

    model = Model(basis, {"hamiltonian": ham}, bond_dim=2 * nfock)
    model.init_HartreeProduct = [
        [[1.0, 0.0], [1.0] + [0.0] * (nfock - 1)]
    ]
    sim = Simulator("da_nobath", model, verbose=0)
    sim.propagate(
        reduced_density=([(0, 0)], 1),
        maxstep=NSTEP + 1,
        stepsize=DT_FS,
        autocorr=False, energy=True, norm=True, populations=False,
    )
    from pytdscf_tpu.util import read_nc

    rd = read_nc("da_nobath_prop/reduced_density.nc", [(0, 0)])
    got = np.asarray(rd[(0, 0)])[: NSTEP + 1]
    np.testing.assert_allclose(got, want, atol=2.0e-05)
    # physics: strong t_LE,CS mixing moves population out of LE fast
    assert want[-1][0, 0].real < 0.9


def test_da_full_mpo_compiles():
    """All 99 bath modes (101 sites): one-site-coupled LVC stays at the
    complementary-operator minimum width."""
    basis, ham = donor_acceptor(nfock=28)
    assert len(basis) == 101
    mpo = ham.fused_mpo([b.nprim for b in basis])[0][0]
    assert len(mpo) == 101
    widths = [c.shape[0] for c in mpo[1:]]
    assert max(widths) <= 6, widths
    ops = mode_number_operators(basis)
    assert len(ops) == 100


# ---------------------------------------------------------------------------
# Model B (donor-acceptor_B.ipynb, example 14): 2N-level electron ladder
# + reaction mode + fragment/OT baths.  Dense references assembled here
# directly from the notebook's equations, independent of the builder.
# ---------------------------------------------------------------------------

from pytdscf_tpu.models.donor_acceptor import (  # noqa: E402
    B_EPSILON_CS_MEV,
    B_EPSILON_LE_EV,
    B_G_CS_EV,
    B_G_F_MEV,
    B_G_LE_EV,
    B_G_OT_CS_MEV,
    B_G_OT_LE_MEV,
    B_J_EV,
    B_LAMBDA_EV,
    B_OMEGA_F_MEV,
    B_OMEGA_OT_MEV,
    B_OMEGA_R_EV,
    B_T_EV,
    donor_acceptor_b,
    electron_level_projectors,
)

MEV = 1.0e-3 * EV


def _dense_da_b(n_frag, n_f, n_ot, nfock):
    """Notebook equations embedded by explicit kron, level order
    [CS_N..CS_1, LE_1..LE_N]; F/OT energies as ω·b b† (the notebook's
    operator order)."""
    N = n_frag
    nele = 2 * N
    dims = [nele] + [nfock] * (1 + n_f + N * n_ot)
    bos = Boson(nfock)
    b = bos.get_annihilation_matrix()
    bd = bos.get_creation_matrix()
    x = b + bd
    n_op = bd @ b
    nbar = b @ bd  # truncated b b† = n + 1

    def emb(site_mats):
        out = np.ones((1, 1), dtype=complex)
        for s, d in enumerate(dims):
            out = np.kron(out, site_mats.get(s, np.eye(d)))
        return out

    def proj(k):
        m = np.zeros((nele, nele))
        m[k, k] = 1.0
        return m

    def hop(k, j):
        m = np.zeros((nele, nele))
        m[k, j] = m[j, k] = 1.0
        return m

    def ot_site(i, j):  # fragment i, mode j (both 1-based)
        return 1 + n_f + (i - 1) * n_ot + j

    H = B_OMEGA_R_EV * EV * emb({1: n_op})
    for L in range(n_f):
        H += B_OMEGA_F_MEV[L] * MEV * emb({2 + L: nbar})
    for i in range(1, N + 1):
        for j in range(1, n_ot + 1):
            H += B_OMEGA_OT_MEV[j - 1] * MEV * emb({ot_site(i, j): nbar})
    for i in range(1, N + 1):
        H += B_EPSILON_LE_EV * EV * emb({0: proj(N - 1 + i)})
        H += B_EPSILON_CS_MEV[i - 1] * MEV * emb({0: proj(N - i)})
    for i in range(1, N):
        H += B_J_EV * EV * emb({0: hop(N - 1 + i, N + i)})
        H += B_T_EV * EV * emb({0: hop(N - i, N - i - 1)})
    H += B_LAMBDA_EV * EV * emb({0: hop(N - 1, N)})
    for L in range(n_f):
        for i in range(1, N + 1):
            H += B_G_F_MEV[L] * MEV * emb({0: proj(N - i), 2 + L: x})
    for i in range(1, N + 1):
        for j in range(1, n_ot + 1):
            s = ot_site(i, j)
            H += B_G_OT_CS_MEV[j - 1] * MEV * emb({0: proj(N - i), s: x})
            H += B_G_OT_LE_MEV[j - 1] * MEV * emb({0: proj(N - 1 + i), s: x})
    H += B_G_CS_EV * EV * emb({0: proj(N - 1), 1: x})
    H += B_G_LE_EV * EV * emb({0: hop(N - 1, N), 1: x})
    return H


def test_da_b_mpo_matches_dense():
    """N=2 fragments, 1 F + 1 OT mode each, nfock=3 (5 sites, 324-dim):
    compiled MPO == dense notebook Hamiltonian exactly."""
    basis, ham = donor_acceptor_b(n_frag=2, n_f=1, n_ot=1, nfock=3)
    assert [b.nprim for b in basis] == [4, 3, 3, 3, 3]
    mpo = [np.asarray(c) for c in ham.fused_mpo([b.nprim for b in basis])[0][0]]
    got = _mpo_to_dense(mpo)
    want = _dense_da_b(2, 1, 1, 3)
    np.testing.assert_allclose(got, want, atol=1.0e-12)


def test_da_b_propagation_matches_expm(tmp_path, monkeypatch):
    """LE₁-seeded dynamics on the reduced model vs dense expm: electron
    RDM through the Simulator driver, LE→CS interface transfer visible."""
    monkeypatch.chdir(tmp_path)
    n_frag, n_f, n_ot, nfock = 2, 1, 1, 4
    basis, ham = donor_acceptor_b(
        n_frag=n_frag, n_f=n_f, n_ot=n_ot, nfock=nfock
    )
    nele = 2 * n_frag
    H = _dense_da_b(n_frag, n_f, n_ot, nfock)
    nrest = nfock ** (1 + n_f + n_frag * n_ot)
    psi = np.zeros(nele * nrest, dtype=complex)
    psi = psi.reshape(nele, nrest)
    psi[n_frag, 0] = 1.0  # LE₁ ⊗ vacuum (notebook init_exciton)
    psi = psi.ravel()
    U = expm(-1.0j * H * DT_FS / units.au_in_fs)
    want = []
    for _ in range(NSTEP + 1):
        t = psi.reshape(nele, nrest)
        want.append(t @ t.conj().T)
        psi = U @ psi
    want = np.array(want)

    model = Model(basis, {"hamiltonian": ham}, bond_dim=16)
    ele0 = [0.0] * n_frag + [1.0] + [0.0] * (n_frag - 1)
    vac = [1.0] + [0.0] * (nfock - 1)
    model.init_HartreeProduct = [[ele0] + [vac] * (len(basis) - 1)]
    sim = Simulator("da_b_small", model, verbose=0)
    sim.propagate(
        reduced_density=([(0, 0)], 1),
        maxstep=NSTEP + 1,
        stepsize=DT_FS,
        autocorr=False, energy=True, norm=True, populations=False,
    )
    from pytdscf_tpu.util import read_nc

    rd = read_nc("da_b_small_prop/reduced_density.nc", [(0, 0)])
    got = np.asarray(rd[(0, 0)])[: NSTEP + 1]
    np.testing.assert_allclose(got, want, atol=2.0e-05)
    # physics: λ interface coupling moves LE₁ → CS₁ population
    assert want[-1][n_frag - 1, n_frag - 1].real > 0.01


def test_da_b_full_mpo_compiles():
    """Full notebook size: 13 fragments, 8 F + 13×8 OT modes (114 sites,
    26-level electron site); the electron-first chain needs one open
    channel per pending fragment operator."""
    basis, ham = donor_acceptor_b(nfock=28)
    assert len(basis) == 114
    assert basis[0].nprim == 26
    mpo = ham.fused_mpo([b.nprim for b in basis])[0][0]
    assert len(mpo) == 114
    widths = [c.shape[0] for c in mpo[1:]]
    assert max(widths) <= 2 * 13 + 3, max(widths)
    ops = electron_level_projectors(basis)
    assert len(ops) == 26
