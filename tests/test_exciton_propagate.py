"""End-to-end regression: LVC exciton-vibration model, 20 × 0.1 fs.

Parity target: the reference's ``tests/test_exiciton_propagate.py`` — final
energy 0.010000180312707298 Eh and the site-3 reduced density matrix at the
last step to atol 1e-9.
"""

import numpy as np
import pytest

from pytdscf_tpu.basis import Exciton, HarmonicOscillator as HO
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.units import au_in_cm1
from pytdscf_tpu.util import read_nc

freqs_cm1 = [1000, 2000, 3000]
omega2 = [(f / au_in_cm1) ** 2 for f in freqs_cm1]
nprim = 8
prim_info = [HO(nprim, f, units="cm-1") for f in freqs_cm1] + [
    Exciton(nstate=2, names=["S0", "S1"])
]


def _build_hamiltonian():
    dE = 0.01
    J = 0.001
    lamb = 0.0001
    kappa = 0.0001

    W0 = np.zeros((1, nprim, 3), dtype=np.complex128)
    W1 = np.zeros((3, nprim, 4), dtype=np.complex128)
    W2 = np.zeros((4, nprim, 3), dtype=np.complex128)
    W3 = np.zeros((3, 2, 2, 1), dtype=np.complex128)

    q1 = [np.array(ho.get_grids()) for ho in prim_info[:3]]
    q2 = [q * q for q in q1]
    one = [np.ones_like(q) for q in q1]
    a = prim_info[3].get_annihilation_matrix()
    a_dag = prim_info[3].get_creation_matrix()

    W0[0, :, 0] = one[0]
    W0[0, :, 1] = q1[0]
    W0[0, :, 2] = omega2[0] / 2 * q2[0]

    W1[0, :, 0] = J * one[1] + lamb * q1[1]
    W1[0, :, 1] = one[1]
    W1[0, :, 2] = kappa * q1[1] + omega2[1] ** 2 / 2 * q2[1]
    W1[0, :, 3] = omega2[1] / 2 * q2[1]
    W1[1, :, 0] = lamb * one[1]
    W1[1, :, 2] = kappa * one[1]
    W1[2, :, 2] = one[1]
    W1[2, :, 3] = one[1]

    W2[0, :, 2] = one[2]
    W2[1, :, 0] = dE * one[2] + kappa * q1[2] + omega2[2] / 2 * q2[2]
    W2[1, :, 1] = omega2[2] / 2 * q2[2]
    W2[1, :, 2] = lamb * q1[2]
    W2[2, :, 0] = one[2]
    W2[3, :, 1] = one[2]

    W3[0, :, :, 0] = a_dag @ a
    W3[1, :, :, 0] = a @ a_dag
    W3[2, :, :, 0] = a_dag + a

    potential = [
        [
            {
                (0, 1, 2, (3, 3)): TensorOperator(
                    mpo=[W0, W1, W2, W3], legs=(0, 1, 2, 3, 3)
                )
            }
        ]
    ]

    kinetic_mpo = []
    for idof in range(3):
        d2 = prim_info[idof].get_2nd_derivative_matrix_dvr() / 2
        if idof == 0:
            core = np.zeros((1, nprim, nprim, 2), dtype=np.complex128)
            core[0, :, :, 0] = d2
            core[0, :, :, 1] = np.eye(nprim)
        elif idof == 2:
            core = np.zeros((2, nprim, nprim, 1), dtype=np.complex128)
            core[0, :, :, 0] = np.eye(nprim)
            core[1, :, :, 0] = d2
        else:
            core = np.zeros((2, nprim, nprim, 2), dtype=np.complex128)
            core[0, :, :, 0] = np.eye(nprim)
            core[1, :, :, 1] = np.eye(nprim)
            core[0, :, :, 1] = d2
        kinetic_mpo.append(core)
    kinetic = [
        [
            {
                ((0, 0), (1, 1), (2, 2)): TensorOperator(
                    mpo=kinetic_mpo, legs=(0, 0, 1, 1, 2, 2)
                )
            }
        ]
    ]
    return TensorHamiltonian(
        ndof=4, potential=potential, kinetic=kinetic, backend="numpy"
    )


def test_exciton_propagate(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    hamiltonian = _build_hamiltonian()
    model = Model(prim_info, {"hamiltonian": hamiltonian}, bond_dim=2)
    model.init_HartreeProduct = [
        [ho.get_unitary()[0].tolist() for ho in prim_info[:3]]
        + [np.array([0.0, 1.0]).tolist()]
    ]

    jobname = "LVC_Exciton_test"
    simulator = Simulator(jobname, model, backend="numpy")
    ener, wf = simulator.propagate(
        stepsize=0.1,
        maxstep=20,
        reduced_density=([(3, 3), (0, 0), (0, 0, 3, 3)], 1),
    )
    assert pytest.approx(ener) == 0.010000180312707298
    rdm = read_nc(f"{jobname}_prop/reduced_density.nc", [(3, 3)])
    np.testing.assert_allclose(
        rdm[(3, 3)][-1],
        np.array(
            [
                [1.86417721e-02 + 1.60379680e-20j, 2.87367863e-02 - 6.91095824e-02j],
                [2.87367863e-02 + 6.91095824e-02j, 9.81358228e-01 - 7.40721885e-18j],
            ]
        ),
        atol=1e-09,
    )
