"""Open-system (Liouville-space MPDO) dynamics vs dense exact propagation.

Reference strategy (``/root/reference/tests/test_mixedstate.py``): a 3-site
spin chain — bath spin-1/2, central spin-1, bath spin-1/2 — with Zeeman +
Heisenberg couplings, Haberkorn damping and Lindblad dissipation on the
central site; the MPDO propagation must reproduce the dense
``expm(L·dt)``-propagated density matrix built independently in-test.

Three equivalent routes are exercised:
 1. Lindblad terms inside the (non-Hermitian) Liouvillian MPO (Arnoldi),
 2. the exact supergate exp(D·dt) applied per step via one_gate_to_apply,
 3. the Kraus factorisation of the same channel via kraus_op.
"""

import math
import os

import numpy as np
import pytest
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.basis import Exciton
from pytdscf_tpu.kraus import kraus_supergate, lindblad_to_kraus
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.symbolic import (
    AssignManager,
    OpSite,
    SumOfProducts,
)
from pytdscf_tpu.operators.tensor_op import TensorOperator
from pytdscf_tpu.simulator import Simulator

# --- model parameters (arbitrary test scales, a.u.) ---
J01, J12 = 0.8, 0.6
BX, BY, BZ = 0.9, 1.1, 1.0
K_HAB = 0.12
K_AMP, K_DEPH = 5.0, 7.0
DT = 0.1  # a.u.
NSTEP = 11

SX = np.array([[0, 1], [1, 0]]) / 2
SY = np.array([[0, -1j], [1j, 0]]) / 2
SZ = np.array([[1, 0], [0, -1]]) / 2
IZ = np.diag([1.0, 0.0, -1.0]) / 2
IP = np.array([[0, math.sqrt(2), 0], [0, 0, math.sqrt(2)], [0, 0, 0]]) / 2
IX = 0.5 * (IP + IP.T)
IY = -0.5j * (IP - IP.T)
E2, E3 = np.eye(2), np.eye(3)

L_AMP = np.array([[0, 1, 0], [0, 0, 1], [0, 0, 0]], dtype=complex) * math.sqrt(K_AMP)
L_DEPH = IZ.astype(complex) * math.sqrt(K_DEPH)


def _hamiltonian_dense():
    def k3(a, b, c):
        return np.kron(np.kron(a, b), c)

    H = (
        BX * k3(E2, IX, E2)
        + BY * k3(E2, IY, E2)
        + BZ * k3(E2, IZ, E2)
        + J01 * (k3(SX, IX, E2) + k3(SY, IY, E2) + k3(SZ, IZ, E2))
        + J12 * (k3(E2, IX, SX) + k3(E2, IY, SY) + k3(E2, IZ, SZ))
    )
    return H


def exact_rdms(lindblad=True):
    H = _hamiltonian_dense()
    n = H.shape[0]
    L = (np.kron(H, np.eye(n)) - np.kron(np.eye(n), H.T)) / 1.0j
    L = L - K_HAB * np.eye(n * n)
    if lindblad:
        for lj in (L_AMP, L_DEPH):
            Lj = np.kron(np.kron(E2, lj), E2)
            L = L + np.kron(Lj, Lj.conj()) - 0.5 * (
                np.kron(Lj.conj().T @ Lj, np.eye(n))
                + np.kron(np.eye(n), Lj.T @ Lj.conj())
            )
    pini = np.diag([0.0, 0.0, 1.0]).astype(complex)
    dm = np.kron(np.kron(E2 / 2, pini), np.kron(np.eye(1), E2 / 2))
    vec = dm.reshape(-1)
    prop = expm(L * DT)
    rdms = []
    for _ in range(NSTEP):
        rdms.append(
            np.einsum("abcadc->bd", vec.reshape(2, 3, 2, 2, 3, 2))
        )
        vec = prop @ vec
    return np.array(rdms)


def _twin(op):
    """left-multiplication superoperator L_op = op ⊗ I."""
    d = op.shape[0]
    return np.kron(op, np.eye(d))


def _niwt(op):
    """right-multiplication superoperator R_op = I ⊗ opᵀ."""
    d = op.shape[0]
    return np.kron(np.eye(d), op.T)


def _liouville_mpo(include_lindblad: bool):
    """H_eff with exp(-i·H_eff·t) = exp(L·t) as a twin-space SOP → MPO."""
    sop = SumOfProducts()
    for mat, site, dim in (
        (IX, 1, 3), (IY, 1, 3), (IZ, 1, 3),
    ):
        pass
    ops = {}

    def O(name, site, value):
        key = (name, site)
        if key not in ops:
            ops[key] = OpSite(name, site, value=value)
        return ops[key]

    for B, mat in ((BX, IX), (BY, IY), (BZ, IZ)):
        sop += B * (O(f"L{id(mat)}", 1, _twin(mat)) - O(f"R{id(mat)}", 1, _niwt(mat)))
    for (Jc, m0, m1, s_a, s_b) in (
        (J01, (SX, SY, SZ), (IX, IY, IZ), 0, 1),
        (J12, (IX, IY, IZ), (SX, SY, SZ), 1, 2),
    ):
        for ma, mb in zip(m0, m1):
            sop += Jc * (
                O(f"L{s_a}{id(ma)}", s_a, _twin(ma))
                * O(f"L{s_b}{id(mb)}", s_b, _twin(mb))
                - O(f"R{s_a}{id(ma)}", s_a, _niwt(ma))
                * O(f"R{s_b}{id(mb)}", s_b, _niwt(mb))
            )
    sop += (-1.0j * K_HAB) * O("EE1", 1, np.kron(E3, E3))
    if include_lindblad:
        for lj in (L_AMP, L_DEPH):
            LL = np.kron(lj, lj.conj())
            LLE = np.kron(lj.conj().T @ lj, E3)
            ELL = np.kron(E3, lj.T @ lj.conj())
            sop += 1.0j * O(f"LL{id(lj)}", 1, LL)
            sop += (-0.5j) * O(f"LLE{id(lj)}", 1, LLE)
            sop += (-0.5j) * O(f"ELL{id(lj)}", 1, ELL)
    # spectator identities so sites 0 and 2 are defined
    sop += 0.0 * (
        O("I0", 0, np.eye(4)) * O("I1", 1, np.eye(9)) * O("I2", 2, np.eye(4))
    )
    am = AssignManager(sop.simplify())
    am.assign()
    return am.numerical_mpo()


def _run_mpdo(tmp_path, jobname, include_lindblad, one_gate=None, kraus=None):
    os.chdir(tmp_path)
    mpo = _liouville_mpo(include_lindblad)
    basis = [Exciton(nstate=4), Exciton(nstate=9), Exciton(nstate=4)]
    pini = np.diag([0.0, 0.0, 1.0]).astype(complex)
    model = Model(
        basis,
        {"hamiltonian": mpo},
        space="liouville",
        bond_dim=64,
        one_gate_to_apply=one_gate,
        kraus_op=kraus,
    )
    model.init_HartreeProduct = [
        [E2.reshape(-1), pini.reshape(-1), E2.reshape(-1)]
    ]
    sim = Simulator(jobname, model, verbose=0)
    sim.propagate(
        reduced_density=([(1, 1)], 1),
        maxstep=NSTEP,
        stepsize=DT * units.au_in_fs,
        autocorr=False,
        energy=False,
        norm=False,
        populations=False,
        conserve_norm=False,
        integrator="arnoldi",
    )
    import h5py

    from pytdscf_tpu.util.nc4 import as_complex

    with h5py.File(f"{jobname}_prop/reduced_density.nc", "r") as f:
        rdms = as_complex(np.asarray(f["rho_(1, 1)_0"]))
    return rdms


def test_liouville_lindblad_in_mpo(tmp_path):
    rdms_exact = exact_rdms(lindblad=True)
    rdms = _run_mpdo(tmp_path, "mix_sop", include_lindblad=True)
    np.testing.assert_allclose(rdms[0], rdms_exact[0], atol=1e-12)
    np.testing.assert_allclose(
        rdms[NSTEP - 1], rdms_exact[NSTEP - 1], atol=1e-8
    )
    # trace decays under Haberkorn: Tr ρ(t) = e^{-k t}
    assert np.trace(rdms[NSTEP - 1]).real == pytest.approx(
        math.exp(-K_HAB * DT * (NSTEP - 1)), abs=1e-6
    )


def test_liouville_supergate(tmp_path):
    rdms_exact = exact_rdms(lindblad=True)
    D = np.zeros((81, 81), dtype=complex)
    from pytdscf_tpu.kraus import lindblad_dissipator

    dloc = lindblad_dissipator([np.kron(np.kron(np.eye(1), lj), np.eye(1))
                                for lj in (L_AMP, L_DEPH)])
    gate_mat = expm(dloc * DT)
    op_dict = {
        ((1, 1),): TensorOperator(
            mpo=[gate_mat[None, :, :, None]], legs=(1, 1)
        )
    }
    gate = TensorHamiltonian(3, potential=[[op_dict]], kinetic=None)
    rdms = _run_mpdo(
        tmp_path, "mix_gate", include_lindblad=False, one_gate=gate
    )
    np.testing.assert_allclose(rdms[0], rdms_exact[0], atol=1e-12)
    # Trotter split (H-step ∘ channel) is O(dt²)-accurate per step
    np.testing.assert_allclose(
        rdms[NSTEP - 1], rdms_exact[NSTEP - 1], atol=2e-2
    )


def test_liouville_kraus_channel(tmp_path):
    B = lindblad_to_kraus([L_AMP.copy(), L_DEPH.copy()], DT)
    # factorisation reproduces the supergate exactly
    dloc = expm(
        __import__("pytdscf_tpu.kraus", fromlist=["lindblad_dissipator"])
        .lindblad_dissipator([L_AMP, L_DEPH]) * DT
    )
    np.testing.assert_allclose(kraus_supergate(B), dloc, atol=1e-12)

    rdms_exact = exact_rdms(lindblad=True)
    rdms = _run_mpdo(
        tmp_path, "mix_kraus", include_lindblad=False, kraus={(1,): B}
    )
    np.testing.assert_allclose(rdms[0], rdms_exact[0], atol=1e-12)
    np.testing.assert_allclose(
        rdms[NSTEP - 1], rdms_exact[NSTEP - 1], atol=2e-2
    )
