"""Pyrazine QVC model vs dense exact propagation.

Reference workflow: ``/root/reference/docs/notebook/pyrazine-qvc.ipynb``
(2-state 24-mode quadratic vibronic coupling Hamiltonian of Raab et al.,
JCP 110, 936 (1999)).  The standard 4-mode reduction (6a, 1, 9a, 10a)
with small Fock spaces is dense-checkable: the S2 wavepacket decay from
the symbolic-SOP-compiled MPO propagation must match expm(−iHt)|ψ₀⟩.
The dense H is assembled HERE directly from the published constants —
independently of the builder's SOP/MPO pipeline.
"""

import numpy as np
import pytest
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.basis.boson import Boson
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.pyrazine import (
    pyrazine_qvc,
    DELTA_EV,
    OMEGA_EV,
    G1_EV,
    G2_EV,
    G3_EV,
    G4_EV,
    MODE_10A,
)
from pytdscf_tpu.simulator import Simulator

MODES = [0, 1, 2, 5]  # 6a, 1, 9a, 10a
NPRIM = 6
DT_FS = 0.5
NSTEP = 10


def _dense_hamiltonian():
    """H on C^(2·6⁴) straight from the published tables (au)."""
    ev = 1.0 / units.au_in_eV
    b = Boson(NPRIM)
    q, h0 = b.get_q_matrix(), 0.5 * (b.get_p2_matrix() + b.get_q2_matrix())
    sigx = np.array([[0.0, 1.0], [1.0, 0.0]])
    eye_el = np.eye(2)
    eye_m = np.eye(NPRIM)

    def emb(el, site_mats):
        # site_mats: list of (mode_pos, matrix); repeated positions compose
        # as matrix products (q·q on one site, matching the SOP semantics)
        per_site = [eye_m] * len(MODES)
        for i, m in site_mats:
            per_site[i] = per_site[i] @ m
        out = np.asarray(el, dtype=complex)
        for m in per_site:
            out = np.kron(out, m)
        return out

    H = emb(np.diag([-DELTA_EV, DELTA_EV]) * ev, [])
    for i, m in enumerate(MODES):
        H += emb(eye_el * OMEGA_EV[m] * ev, [(i, h0)])
        if m in G1_EV:
            H += emb(np.diag(G1_EV[m]) * ev, [(i, q)])
        elif m == MODE_10A:
            H += emb(sigx * G3_EV * ev, [(i, q)])
    for (k, l), ab in G2_EV.items():
        if k in MODES and l in MODES:
            i, j = MODES.index(k), MODES.index(l)
            H += emb(np.diag(ab) * ev, [(i, q), (j, q)])
    for (k, l), c in G4_EV.items():
        if k in MODES and l in MODES:
            i, j = MODES.index(k), MODES.index(l)
            H += emb(sigx * c * ev, [(i, q), (j, q)])
    return H


def _dense_trajectory():
    """Electronic RDM at steps 0..NSTEP from dense expm propagation."""
    H = _dense_hamiltonian()
    nvib = NPRIM ** len(MODES)
    psi = np.zeros(2 * nvib, dtype=complex)
    psi[1 * nvib] = 1.0  # S2 ⊗ vacuum (state index 1)
    U = expm(-1.0j * H * DT_FS / units.au_in_fs)
    out = []
    for _ in range(NSTEP + 1):
        mat = psi.reshape(2, nvib)
        out.append(mat @ mat.conj().T)
        psi = U @ psi
    return np.array(out)  # (NSTEP+1, 2, 2)


def test_pyrazine_4mode_matches_dense(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    basis, ham = pyrazine_qvc(modes=MODES, nprim=NPRIM)
    assert len(basis) == 5
    # exact parameterisation: max Schmidt rank of the 2·6⁴ chain is 36
    model = Model(basis, {"hamiltonian": ham}, bond_dim=36)
    weights = [[0.0, 1.0]] + [
        [1.0] + [0.0] * (NPRIM - 1) for _ in MODES
    ]
    model.init_HartreeProduct = [weights]
    sim = Simulator("pyrazine4", model, verbose=0)
    sim.propagate(
        reduced_density=([(0, 0)], 1),
        maxstep=NSTEP + 1,
        stepsize=DT_FS,
        autocorr=False, energy=True, norm=True, populations=False,
    )
    from pytdscf_tpu.util import read_nc

    rd = read_nc("pyrazine4_prop/reduced_density.nc", [(0, 0)])
    got = np.asarray(rd[(0, 0)])[: NSTEP + 1]
    want = _dense_trajectory()
    # 6e-6 observed: sweep-splitting + Krylov tolerance at dt=0.5 fs
    # (the operator itself is MPO-vs-dense exact to 1e-12)
    np.testing.assert_allclose(got, want, atol=2.0e-05)
    # physics sanity: S2 population must have decayed through the 10a
    # conical-intersection coupling
    assert want[-1][1, 1].real < 0.995


def test_pyrazine_full_24mode_mpo_compiles():
    """The full 24-mode QVC SOP (≈140 terms) fuses into one compact MPO."""
    basis, ham = pyrazine_qvc(nprim=8)
    assert len(basis) == 25
    mpo = ham.fused_mpo([b.nprim for b in basis])[0][0]
    widths = [c.shape[0] for c in mpo[1:]]
    # bilinear chains over 24 modes stay near the complementary-operator
    # minimum; sanity-bound the compression
    assert max(widths) <= 30, widths
    assert mpo[0].shape[1] == 2 and mpo[1].shape[1] == 8
