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
