"""Multi-state MCTDH and CMF adaptive-step propagation.

Reference capabilities: multi-state CI matvec over (istate, jstate) blocks
with state-specific SPFs (``/root/reference/pytdscf/_ci_cls.py:616-899``)
and constant-mean-field propagation with predictor/corrector step control
(``/root/reference/pytdscf/wavefunction.py:418-586``).  Validation is
against dense ``expm(-iHt)`` propagation of the same vibronic Hamiltonian.
"""

import math
import os

import numpy as np
import pytest
from scipy.linalg import expm

from pytdscf_tpu import units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.basis.op_matrix import op_matrix
from pytdscf_tpu.config import Config
from pytdscf_tpu.mctdh import MCTDHEngine
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import PolynomialHamiltonian, read_potential_nMR
from pytdscf_tpu.potentials import h2o_k_orig
from pytdscf_tpu.simulator import Simulator


def _lvc_model(nprim, nspf):
    """2-state, 2-mode LVC: HO diabats, κ·Q inter-state coupling + gap."""
    prim = [PrimBas_HO(0.0, 1200, nprim), PrimBas_HO(0.0, 1600, nprim)]
    prim_info = [prim, prim]  # same bases for both states
    basinfo = BasInfo(prim_info, [[nspf, nspf], [nspf, nspf]])
    ham = PolynomialHamiltonian(ndof=2, nstate=2)
    ham.set_LVC(
        basinfo,
        {(0, 1): {0: 0.002}, (1, 0): {0: 0.002}},
    )
    gap = 0.005
    ham.coupleJ[1][1] += gap
    return basinfo, ham


def _dense_H(ham, basinfo):
    ndof, ns = ham.ndof, ham.nstate
    dims = [basinfo.get_nprim(0, d) for d in range(ndof)]
    D = int(np.prod(dims))
    H = np.zeros((ns * D, ns * D), dtype=complex)
    for i in range(ns):
        for j in range(ns):
            block = np.zeros((D, D), dtype=complex)
            for term in ham.general[i][j] + ham.onesite[i][j]:
                mats = [
                    op_matrix(
                        basinfo.get_primbas(i, d),
                        basinfo.get_primbas(j, d),
                        term.mode_ops[d],
                    )
                    if d in term.mode_ops
                    else np.eye(dims[d])
                    for d in range(ndof)
                ]
                M = mats[0]
                for m in mats[1:]:
                    M = np.kron(M, m)
                block = block + term.coef * M
            if ham.coupleJ[i][j] != 0.0:
                block = block + ham.coupleJ[i][j] * np.eye(D)
            H[i * D:(i + 1) * D, j * D:(j + 1) * D] = block
    return H


def _dense_propagate(H, ns, dims, t_au, init_state=1):
    D = int(np.prod(dims))
    vec = np.zeros(ns * D, dtype=complex)
    vec[init_state * D] = 1.0  # |init_state⟩ ⊗ |0,0⟩
    vec = expm(-1j * H * t_au) @ vec
    pops = [float(np.linalg.norm(vec[i * D:(i + 1) * D]) ** 2)
            for i in range(ns)]
    energy = float((vec.conj() @ H @ vec).real)
    return pops, energy


def test_multistate_mctdh_exact_limit():
    """nspf == nprim: multi-state VMF MCTDH is exact (full CI)."""
    basinfo, ham = _lvc_model(nprim=5, nspf=5)
    model = Model(basinfo, {"hamiltonian": ham})
    model.init_weight_ESTATE = [0.0, 1.0]
    eng = MCTDHEngine(model, Config(jobname="ms_exact", thresh_exp=1e-12))
    dt = 0.1 / units.au_in_fs
    nstep = 10
    e0 = eng.expectation().real
    for _ in range(nstep):
        eng.propagate(dt)
    pops = eng.pop_states()
    H = _dense_H(ham, basinfo)
    pops_exact, e_exact = _dense_propagate(H, 2, [5, 5], dt * nstep)
    assert e0 == pytest.approx(e_exact, abs=1e-10)
    assert eng.expectation().real == pytest.approx(e_exact, abs=1e-9)
    np.testing.assert_allclose(pops, pops_exact, atol=1e-7)
    assert pops[0] > 1e-4  # population actually transferred


def test_multistate_mctdh_contracted_cmf():
    """nspf < nprim with CMF adaptive stepping tracks the dense solution."""
    basinfo, ham = _lvc_model(nprim=6, nspf=4)
    model = Model(basinfo, {"hamiltonian": ham})
    model.init_weight_ESTATE = [0.0, 1.0]
    eng = MCTDHEngine(
        model,
        Config(
            jobname="ms_cmf", thresh_exp=1e-11, tol_cmf=1e-10,
            max_stepsize=0.2 / units.au_in_fs,
        ),
    )
    e0 = eng.expectation().real
    t, guess = 0.0, 1.0e-3 / units.au_in_fs
    sizes = []
    for _ in range(25):
        h, guess = eng.propagate_CMF(guess)
        t += h
        sizes.append(h)
    # adaptive control actually grew the step from the 1e-3 fs seed
    assert sizes[-1] > sizes[0]
    assert eng.expectation().real == pytest.approx(e0, abs=1e-8)
    assert eng.norm() == pytest.approx(1.0, abs=1e-8)
    H = _dense_H(ham, basinfo)
    pops_exact, _ = _dense_propagate(H, 2, [6, 6], t)
    np.testing.assert_allclose(eng.pop_states(), pops_exact, atol=1e-5)


def test_cmf_simulator_wiring(tmp_path):
    """Simulator(ci_type='mctdh').propagate(cmf=True) conserves energy."""
    os.chdir(tmp_path)
    prim_info = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 6)
        for i in (1, 2, 3)
    ]]
    basinfo = BasInfo(prim_info, [[4, 4, 4]])
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham})
    sim = Simulator("h2o_cmf", model, ci_type="MCTDH", verbose=0)
    e0, _ = sim.propagate(maxstep=1, stepsize=0.1)
    e, wf = sim.propagate(
        maxstep=6, cmf=True, tol_cmf=1e-9, max_stepsize=0.02
    )
    assert e == pytest.approx(e0, abs=5e-7)
    assert wf.norm() == pytest.approx(1.0, abs=1e-8)
