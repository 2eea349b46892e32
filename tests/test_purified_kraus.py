"""Kraus channels on purified MPS (Hilbert space) vs dense Lindblad.

Reference strategy (``/root/reference/tests/test_mixedstate.py:560-812``):
the 3-spin radical-pair model with Haberkorn damping, amplitude + dephasing
Lindblad channels on the central spin-1, run as a PURIFIED MPS — boundary
ancillas Bell-paired to the bath spins, and the channel's Kraus index
absorbed into an ancilla dimension each step:

 * single-site form: the central site carries phys⊗ancilla (3·K),
 * two-site form: a dedicated K-dim ancilla site next to the spin site.

Both must reproduce the dense ``expm(L·dt)``-propagated reduced density.
"""

import math
import os

import numpy as np
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.basis import Exciton
from pytdscf_tpu.kraus import lindblad_to_kraus, trace_out_ancilla
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.symbolic import (
    AssignManager,
    OpSite,
    SumOfProducts,
    get_eye_site,
)
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util import read_nc

J01, J12 = 0.8, 0.6
BX, BY, BZ = 0.9, 1.1, 1.0
K_HAB = 0.12
K_AMP, K_DEPH = 5.0, 7.0
DT = 0.1
NSTEP = 6

SX = np.array([[0, 1], [1, 0]]) / 2
SY = np.array([[0, -1j], [1j, 0]]) / 2
SZ = np.array([[1, 0], [0, -1]]) / 2
IZ = np.diag([1.0, 0.0, -1.0]) / 2
IP = np.array([[0, math.sqrt(2), 0], [0, 0, math.sqrt(2)], [0, 0, 0]]) / 2
IX = 0.5 * (IP + IP.T)
IY = -0.5j * (IP - IP.T)
E2, E3 = np.eye(2), np.eye(3)

L_AMP = np.array([[0, 1, 0], [0, 0, 1], [0, 0, 0]], dtype=complex) * math.sqrt(
    K_AMP
)
L_DEPH = IZ.astype(complex) * math.sqrt(K_DEPH)


def exact_rdms(pini: np.ndarray) -> np.ndarray:
    def k3(a, b, c):
        return np.kron(np.kron(a, b), c)

    H = (
        BX * k3(E2, IX, E2)
        + BY * k3(E2, IY, E2)
        + BZ * k3(E2, IZ, E2)
        + J01 * (k3(SX, IX, E2) + k3(SY, IY, E2) + k3(SZ, IZ, E2))
        + J12 * (k3(E2, IX, SX) + k3(E2, IY, SY) + k3(E2, IZ, SZ))
    )
    n = H.shape[0]
    L = (np.kron(H, np.eye(n)) - np.kron(np.eye(n), H.T)) / 1.0j
    L = L - K_HAB * np.eye(n * n)
    for lj in (L_AMP, L_DEPH):
        Lj = k3(E2, lj, E2)
        L = L + np.kron(Lj, Lj.conj()) - 0.5 * (
            np.kron(Lj.conj().T @ Lj, np.eye(n))
            + np.kron(np.eye(n), Lj.T @ Lj.conj())
        )
    dm = k3(E2 / 2, pini, E2 / 2)
    vec = dm.reshape(-1)
    prop = expm(L * DT)
    rdms = []
    for _ in range(NSTEP):
        rdms.append(np.einsum("abcadc->bd", vec.reshape(2, 3, 2, 2, 3, 2)))
        vec = prop @ vec
    return np.array(rdms)


def _spin_sop(site_of, dims, centre_kron=None):
    """H of the 3 spins on MPS sites ``site_of``; identity elsewhere.

    ``centre_kron`` right-krons the central-site operators with an
    identity (the combined phys⊗ancilla single-site purified layout)."""
    ops = {}

    def O(name, s, val):
        if (name, s) not in ops:
            ops[(name, s)] = OpSite(name, s, value=val)
        return ops[(name, s)]

    def C(mat):
        return mat if centre_kron is None else np.kron(mat, centre_kron)

    s0, s1, s2 = site_of
    sop = SumOfProducts()
    sop += (
        BX * O("ix", s1, C(IX))
        + BY * O("iy", s1, C(IY))
        + BZ * O("iz", s1, C(IZ))
    )
    for (Jc, sa, ma, sb, mb) in (
        (J01, s0, (SX, SY, SZ), s1, (IX, IY, IZ)),
        (J12, s1, (IX, IY, IZ), s2, (SX, SY, SZ)),
    ):
        for A, B in zip(ma, mb):
            Av = C(A) if sa == s1 else A
            Bv = C(B) if sb == s1 else B
            sop += Jc * (
                O(f"a{sa}{id(A)}", sa, Av) * O(f"b{sb}{id(B)}", sb, Bv)
            )
    sop += (-0.5j * K_HAB) * O("e1", s1, C(E3))
    eye = 1
    for s in range(len(dims)):
        eye = eye * get_eye_site(s, dims[s])
    sop += 0.0 * eye
    am = AssignManager(sop.simplify())
    am.assign()
    return am.numerical_mpo()


def _run(jobname, basis_dims, mpo, init_cores, kraus, rd_site):
    basis = [Exciton(d) for d in basis_dims]
    model = Model(basis, {"hamiltonian": mpo}, bond_dim=64, kraus_op=kraus)
    model.init_HartreeProduct = [init_cores]
    sim = Simulator(jobname, model, verbose=0)
    sim.propagate(
        reduced_density=([(rd_site, rd_site)], 1),
        maxstep=NSTEP,
        stepsize=DT * units.au_in_fs,
        autocorr=False,
        energy=False,
        norm=False,
        populations=False,
        conserve_norm=False,
        integrator="arnoldi",
    )
    rd = read_nc(
        f"{jobname}_prop/reduced_density.nc", [(rd_site, rd_site)]
    )[(rd_site, rd_site)]
    return np.asarray(rd)


def _bell_pair():
    """(anc, phys) cores contracting to the maximally mixed qubit."""
    anc = np.zeros((1, 2, 2))
    anc[0, 0, 0] = anc[0, 1, 1] = 1
    phys = np.zeros((2, 2, 1))
    phys[0, 0, 0] = phys[1, 1, 0] = 1
    return anc, phys


def test_purified_kraus_single_site(tmp_path):
    os.chdir(tmp_path)
    K = 24
    rdms_exact = exact_rdms(np.diag([0.0, 0.0, 1.0]).astype(complex))
    dims = [2, 2, 3 * K, 2, 2]
    mpo = _spin_sop((1, 2, 3), dims, centre_kron=np.eye(K))
    B = lindblad_to_kraus([L_AMP, L_DEPH], DT)
    anc0, phys1 = _bell_pair()
    centre = np.zeros((1, 3 * K, 1))
    centre[0, 2 * K, 0] = 1  # spin |2⟩ ⊗ ancilla |0⟩
    phys3 = np.zeros((1, 2, 2))
    phys3[0, 0, 0] = phys3[0, 1, 1] = 1
    anc4 = np.zeros((2, 2, 1))
    anc4[0, 0, 0] = anc4[1, 1, 0] = 1
    rdms = _run(
        "pur1", dims, mpo, [anc0, phys1, centre, phys3, anc4],
        {(2,): B}, rd_site=2,
    )
    rdms = trace_out_ancilla(rdms, 3)
    np.testing.assert_allclose(rdms[0], rdms_exact[0], atol=1e-12)
    np.testing.assert_allclose(rdms[-1], rdms_exact[NSTEP - 1], atol=2e-2)


def test_purified_kraus_two_site(tmp_path):
    os.chdir(tmp_path)
    K = 24
    rdms_exact = exact_rdms(np.diag([0.0, 0.5, 0.5]).astype(complex))
    dims = [2, 2, 3, K, 2, 2]
    mpo = _spin_sop((1, 2, 4), dims)
    B = lindblad_to_kraus([L_AMP, L_DEPH], DT)
    anc0, phys1 = _bell_pair()
    # spin entangled with its channel ancilla: (|2⟩|a0⟩ + |1⟩|a1⟩)/√2
    spin = np.zeros((1, 3, 2))
    spin[0, 2, 0] = spin[0, 1, 1] = 1
    anc3 = np.zeros((2, K, 1))
    anc3[0, 0, 0] = anc3[1, 1, 0] = 1
    phys4 = np.zeros((1, 2, 2))
    phys4[0, 0, 0] = phys4[0, 1, 1] = 1
    anc5 = np.zeros((2, 2, 1))
    anc5[0, 0, 0] = anc5[1, 1, 0] = 1
    rdms = _run(
        "pur2", dims, mpo, [anc0, phys1, spin, anc3, phys4, anc5],
        {(2, 3): B}, rd_site=2,
    )
    np.testing.assert_allclose(rdms[0], rdms_exact[0], atol=1e-12)
    np.testing.assert_allclose(rdms[-1], rdms_exact[NSTEP - 1], atol=2e-2)
