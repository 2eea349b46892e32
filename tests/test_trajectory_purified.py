"""Hilbert-space routes to open-system dynamics (reference
``test_mixedstate.py:240-520``): wavefunction-trajectory averaging and
purified MPS, both against the dense exact solution (no Lindblad)."""

import math
import os

import numpy as np
import pytest
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.basis import Exciton
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


def _exact_rdms():
    def k3(a, b, c):
        return np.kron(np.kron(a, b), c)

    H = (
        BX * k3(E2, IX, E2) + BY * k3(E2, IY, E2) + BZ * k3(E2, IZ, E2)
        + J01 * (k3(SX, IX, E2) + k3(SY, IY, E2) + k3(SZ, IZ, E2))
        + J12 * (k3(E2, IX, SX) + k3(E2, IY, SY) + k3(E2, IZ, SZ))
    )
    n = H.shape[0]
    L = (np.kron(H, np.eye(n)) - np.kron(np.eye(n), H.T)) / 1.0j
    L -= K_HAB * np.eye(n * n)
    dm = k3(E2 / 2, np.diag([0.0, 0.0, 1.0]).astype(complex), E2 / 2)
    vec = dm.reshape(-1)
    prop = expm(L * DT)
    out = []
    for _ in range(NSTEP):
        out.append(np.einsum("abcadc->bd", vec.reshape(2, 3, 2, 2, 3, 2)))
        vec = prop @ vec
    return np.array(out)


def _spin_sop(site_of, nsites, dims):
    ops = {}

    def O(name, s, val):
        if (name, s) not in ops:
            ops[(name, s)] = OpSite(name, s, value=val)
        return ops[(name, s)]

    s0, s1, s2 = site_of
    sop = SumOfProducts()
    sop += BX * O("ix", s1, IX) + BY * O("iy", s1, IY) + BZ * O("iz", s1, IZ)
    for (Jc, sa, ma, sb, mb) in (
        (J01, s0, (SX, SY, SZ), s1, (IX, IY, IZ)),
        (J12, s1, (IX, IY, IZ), s2, (SX, SY, SZ)),
    ):
        for A, B in zip(ma, mb):
            sop += Jc * (
                O(f"a{sa}{id(A)}", sa, A) * O(f"b{sb}{id(B)}", sb, B)
            )
    sop += (-0.5j * K_HAB) * O("e1", s1, E3)
    eye = 1
    for s in range(nsites):
        eye = eye * get_eye_site(s, dims[s])
    sop += 0.0 * eye
    am = AssignManager(sop.simplify())
    am.assign()
    return am.numerical_mpo()


def test_trajectory_sum(tmp_path):
    os.chdir(tmp_path)
    rdms_exact = _exact_rdms()
    mpo = _spin_sop((0, 1, 2), 3, [2, 3, 2])
    basis = [Exciton(2), Exciton(3), Exciton(2)]
    hps = [
        [[1, 0], [0, 0, 1], [1, 0]],
        [[1, 0], [0, 0, 1], [0, 1]],
        [[0, 1], [0, 0, 1], [1, 0]],
        [[0, 1], [0, 0, 1], [0, 1]],
    ]
    acc = None
    for i, hp in enumerate(hps):
        model = Model(basis, {"hamiltonian": mpo}, bond_dim=8)
        model.init_HartreeProduct = [hp]
        sim = Simulator(f"traj{i}", model, verbose=0)
        sim.propagate(
            reduced_density=([(1, 1)], 1), maxstep=NSTEP,
            stepsize=DT * units.au_in_fs, autocorr=False, energy=False,
            norm=False, populations=False, conserve_norm=False,
            integrator="arnoldi",
        )
        rd = read_nc(f"traj{i}_prop/reduced_density.nc", [(1, 1)])[(1, 1)]
        acc = rd if acc is None else acc + rd
    acc = acc / len(hps)
    np.testing.assert_allclose(acc[0], rdms_exact[0], atol=1e-12)
    np.testing.assert_allclose(acc[-1], rdms_exact[NSTEP - 1], atol=1e-08)


def test_purified_mps(tmp_path):
    os.chdir(tmp_path)
    rdms_exact = _exact_rdms()
    # sites: anc0, phys0, phys1(spin-1), phys2, anc2
    mpo = _spin_sop((1, 2, 3), 5, [2, 2, 3, 2, 2])
    basis = [Exciton(2), Exciton(2), Exciton(3), Exciton(2), Exciton(2)]
    model = Model(basis, {"hamiltonian": mpo}, bond_dim=16)
    # purification of 1/2 ⊗ |2⟩⟨2| ⊗ 1/2 as an entangled pure state
    anc0 = np.zeros((1, 2, 2))
    anc0[0, 0, 0] = anc0[0, 1, 1] = 1
    phys0 = np.zeros((2, 2, 1))
    phys0[0, 0, 0] = phys0[1, 1, 0] = 1
    spin = np.zeros((1, 3, 1))
    spin[0, 2, 0] = 1
    phys2 = np.zeros((1, 2, 2))
    phys2[0, 0, 0] = phys2[0, 1, 1] = 1
    anc2 = np.zeros((2, 2, 1))
    anc2[0, 0, 0] = anc2[1, 1, 0] = 1
    cores = [anc0 / math.sqrt(2), phys0, spin, phys2 / math.sqrt(2), anc2]
    # zero-pad the bonds so 1-site TDVP has room for entanglement growth
    dims = [1, 4, 8, 8, 2, 1]
    padded = []
    for k, c in enumerate(cores):
        new = np.zeros((dims[k], c.shape[1], dims[k + 1]), dtype=complex)
        new[: c.shape[0], :, : c.shape[2]] = c
        padded.append(new)
    from pytdscf_tpu.mps.lattice import right_canonicalize

    cores = right_canonicalize(padded)

    from pytdscf_tpu.config import Config
    from pytdscf_tpu.mps.tdvp import TDVPEngine

    engine = TDVPEngine(
        [cores],
        model.hamiltonian,
        Config(jobname="purified", conserve_norm=False,
               integrator="arnoldi"),
    )
    rdms = []
    for _ in range(NSTEP):
        rdms.append(engine.reduced_density((0, 0, 2)))
        engine.propagate(DT)
    np.testing.assert_allclose(rdms[0], rdms_exact[0], atol=1e-12)
    np.testing.assert_allclose(rdms[-1], rdms_exact[NSTEP - 1], atol=1e-07)


def test_coherent_state_overlap():
    """⟨CS(p,q)|HO_v⟩ amplitudes (reference test_sample_CS_ovlp)."""
    from pytdscf_tpu.basis import HarmonicOscillator

    ho = HarmonicOscillator(12, 1200.0)
    w = ho.omega
    # CS at the origin with zero momentum = the vibrational ground state
    ov = ho.get_ovi_CS_HO(0.0, 0.0, type="FBR")
    np.testing.assert_allclose(abs(ov[0]), 1.0, atol=1e-12)
    np.testing.assert_allclose(ov[1:], 0.0, atol=1e-12)
    # displaced CS: Poissonian amplitudes |⟨v|z⟩|² = e^{-|z|²}|z|^{2v}/v!
    q = 0.7 / math.sqrt(w)
    z = math.sqrt(w / 2) * q
    ov = ho.get_ovi_CS_HO(0.0, q, type="FBR")
    import scipy.special as sp

    v = np.arange(12)
    expect = np.exp(-abs(z) ** 2 / 2) * z**v / np.sqrt(sp.factorial(v))
    np.testing.assert_allclose(np.abs(ov), np.abs(expect), atol=1e-10)
