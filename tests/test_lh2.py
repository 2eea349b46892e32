"""LH2 exciton-delocalization model vs dense exact dynamics.

Reference workflow: ``/root/reference/docs/notebook/lh2.ipynb`` (9
molecules × 3 chromophores, Holstein baths, ring couplings).  The dense
Hamiltonians here are assembled directly from the published tables —
independently of the builder's SOP/MPO pipeline.
"""

import numpy as np
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.basis.boson import Boson, Exciton
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.lh2 import (
    E_ALPHA_CM1,
    E_BETA_CM1,
    E_GAMMA_CM1,
    HUANG_RHYS,
    NN_PAIRS,
    OMEGA_CM1,
    V_CM1,
    lh2_chain,
    lh2_initial_weights,
)
from pytdscf_tpu.simulator import Simulator

CM1 = 1.0 / units.au_in_cm1
MODE = 6  # ω = 915.7 cm⁻¹, S = 0.051
NFOCK = 2
DT_FS = 0.5
NSTEP = 10


def _kron_term(dims, site_mats):
    """Embed {site: matrix} into the full product space."""
    out = np.ones((1, 1), dtype=complex)
    for s, d in enumerate(dims):
        out = np.kron(out, site_mats.get(s, np.eye(d)))
    return out


def _dense_lh2(nmol):
    """H for nmol molecules × (γ, β, α), one bath mode each, in au."""
    block = 2  # exciton + 1 boson
    nsite = block * 3 * nmol
    dims = [2] * nsite
    gamma = list(range(0, nsite, block * 3))
    beta = list(range(block, nsite, block * 3))
    alpha = list(range(block * 2, nsite, block * 3))

    exc = Exciton(2)
    a = exc.get_annihilation_matrix()
    ad = exc.get_creation_matrix()
    n_exc = ad @ a
    bos = Boson(NFOCK)
    q = bos.get_q_matrix()
    num = bos.get_number_matrix()

    H = np.zeros((2**nsite, 2**nsite), dtype=complex)
    w = OMEGA_CM1[MODE] * CM1
    g = w * np.sqrt(2.0 * HUANG_RHYS[MODE])
    for asite, bsite, gsite in zip(alpha, beta, gamma):
        for s, e in (
            (asite, E_ALPHA_CM1),
            (bsite, E_BETA_CM1),
            (gsite, E_GAMMA_CM1),
        ):
            H += _kron_term(dims, {s: e * CM1 * n_exc})
            H += _kron_term(dims, {s + 1: w * num})
            H += _kron_term(dims, {s: g * n_exc, s + 1: q})

    def hop(v_cm1, s1, s2):
        nonlocal H
        H += v_cm1 * CM1 * _kron_term(dims, {s1: ad, s2: a})
        H += v_cm1 * CM1 * _kron_term(dims, {s1: a, s2: ad})

    for asite, bsite, gsite in zip(alpha, beta, gamma):
        hop(V_CM1["ab1"], bsite, asite)
        hop(V_CM1["ag1"], gsite, asite)
        hop(V_CM1["bg1"], gsite, bsite)
    for p1, p2 in NN_PAIRS:
        if max(p1, p2) > nmol - 1:
            continue
        hop(V_CM1["aa1"] + V_CM1["aa2"], alpha[p1], alpha[p2])
        hop(V_CM1["bb1"], beta[p1], beta[p2])
        hop(V_CM1["gg1"], gamma[p1], gamma[p2])
        hop(V_CM1["ab2"] + V_CM1["ab4"], beta[p1], alpha[p2])
        hop(V_CM1["ag2"], gamma[p1], alpha[p2])
        hop(V_CM1["ab3"], alpha[p1], beta[p2])
    return H


def _mpo_matvec(mpo, x, dims):
    """y = (MPO) x without densifying the operator."""
    t = np.asarray(x, complex).reshape(1, 1, -1)  # (w, out, in-rest)
    for core in mpo:
        w, dout, din, wn = core.shape
        t = t.reshape(t.shape[0], t.shape[1], din, -1)
        t = np.einsum("wodr,wxdv->voxr", t, core, optimize=True)
        t = t.reshape(wn, t.shape[1] * t.shape[2], t.shape[3])
    assert t.shape[0] == 1 and t.shape[2] == 1
    return t[0, :, 0]


def test_lh2_two_molecule_mpo_matches_dense():
    """nmol=2 covers every coupling class incl. the ring pair (1, 0) and
    the double NN loop (aa2/ab4 on top of aa1/ab2)."""
    basis, ham, site_map = lh2_chain(nmol=2, modes=(MODE,), nfock=NFOCK)
    assert len(basis) == 12
    mpo = ham.fused_mpo([b.nprim for b in basis])[0][0]
    mpo = [np.asarray(c) for c in mpo]
    H = _dense_lh2(2)
    rng = np.random.default_rng(5)
    for _ in range(3):
        x = rng.standard_normal(2**12) + 1j * rng.standard_normal(2**12)
        y_ref = H @ x
        y_mpo = _mpo_matvec(mpo, x, [2] * 12)
        np.testing.assert_allclose(y_mpo, y_ref, atol=1.0e-10 * np.abs(y_ref).max())


def test_lh2_single_molecule_matches_dense(tmp_path, monkeypatch):
    """γ-excited single molecule: TDVP exciton populations vs expm."""
    monkeypatch.chdir(tmp_path)
    basis, ham, site_map = lh2_chain(nmol=1, modes=(MODE,), nfock=NFOCK)
    assert len(basis) == 6
    # dense trajectory
    H = _dense_lh2(1)
    dim = 2**6
    psi = np.zeros(dim, dtype=complex)
    # site 0 (γ exciton) in |1⟩: index ordering is row-major over sites
    psi[1 << 5] = 1.0
    U = expm(-1.0j * H * DT_FS / units.au_in_fs)
    want = []
    for _ in range(NSTEP + 1):
        t = psi.reshape(2, dim // 2)
        want.append(t @ t.conj().T)
        psi = U @ psi
    want = np.array(want)

    model = Model(basis, {"hamiltonian": ham}, bond_dim=8)
    model.init_HartreeProduct = [
        lh2_initial_weights(basis, site_map, excite=(0,))
    ]
    sim = Simulator("lh2tiny", model, verbose=0)
    sim.propagate(
        reduced_density=([(0, 0)], 1),
        maxstep=NSTEP + 1,
        stepsize=DT_FS,
        autocorr=False, energy=True, norm=True, populations=False,
    )
    from pytdscf_tpu.util import read_nc

    rd = read_nc("lh2tiny_prop/reduced_density.nc", [(0, 0)])
    got = np.asarray(rd[(0, 0)])[: NSTEP + 1]
    np.testing.assert_allclose(got, want, atol=2.0e-05)
    # physics: the γ excitation must hop (β/γ coupling is weak but α–γ isn't)
    assert want[-1][1, 1].real < 0.999


def test_lh2_full_mpo_compiles():
    """The notebook-scale model (9 molecules, 2 bath modes, 81 sites)."""
    basis, ham, site_map = lh2_chain()  # defaults = notebook reduction
    assert len(basis) == 81
    assert [len(site_map[k]) for k in ("gamma", "beta", "alpha")] == [9] * 3
    mpo = ham.fused_mpo([b.nprim for b in basis])[0][0]
    assert len(mpo) == 81
    widths = [c.shape[0] for c in mpo[1:]]
    # ring-coupling complementary blocks stay compact after compression
    assert max(widths) <= 40, widths
    assert mpo[site_map["gamma"][0]].shape[1] == 2
    assert mpo[site_map["gamma"][0] + 1].shape[1] == 10
