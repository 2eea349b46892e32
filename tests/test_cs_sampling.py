"""Coherent-state overlap sampling of an MPS (reference parity).

Mirrors ``/root/reference/tests/test_sample_CS_ovlp_jax.py``: apply a
linear dipole MPO to the 3-mode HO-DVR ground state via the variational
``operate`` workflow, then contract the resulting MPS with per-DOF
coherent-state overlap vectors ``get_ovi_CS_HO(p, q)``.  The reference's
literals: ‖μ|0⟩‖ = 1.3111895155460684 and Re⟨CS(0.1, 0.1)|Ψ⟩ =
0.0048425339."""

import os

import numpy as np
import pytest

from pytdscf_tpu.basis import HarmonicOscillator
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.dvr import construct_nMR_recursive
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator
from pytdscf_tpu.simulator import Simulator


def test_sample_cs_ovlp(tmp_path):
    os.chdir(tmp_path)
    prim_info = [[
        HarmonicOscillator(5, 1500, 0.0),
        HarmonicOscillator(5, 2000, 0.0),
        HarmonicOscillator(5, 2500, 0.0),
    ]]
    basinfo = BasInfo(prim_info)

    funcs = {
        (0,): lambda q0: 0.1 * q0,
        (1,): lambda q1: 0.1 * q1,
        (2,): lambda q2: 0.1 * q2,
    }
    mpo = construct_nMR_recursive(prim_info[0], func=funcs)
    dipole = TensorHamiltonian(
        ndof=3,
        potential=[[{(0, 1, 2): TensorOperator(mpo=mpo)}]],
        kinetic=None,
        backend="jax",
    )
    model = Model(basinfo, {"hamiltonian": dipole}, bond_dim=4)

    sim = Simulator("cs_sample", model, verbose=0)
    norm, wf = sim.operate(maxstep=10, restart=False)
    assert norm == pytest.approx(1.3111895155460684, abs=1e-8)

    trans = [
        ho.get_ovi_CS_HO(0.1, 0.1, type="DVR") for ho in prim_info[0]
    ]
    val = wf.ci_coef.get_CI_coef_state(trans_arrays=trans)
    assert val.real == pytest.approx(0.0048425339, abs=1e-8)

    # J-indexed coefficient == one-hot trans_arrays
    c_J = wf.ci_coef.get_CI_coef_state(J=(1, 0, 2))
    hot = [np.eye(5)[j] for j in (1, 0, 2)]
    c_v = wf.ci_coef.get_CI_coef_state(trans_arrays=hot)
    assert c_J == pytest.approx(c_v, abs=1e-12)
