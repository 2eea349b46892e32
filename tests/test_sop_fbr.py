"""SOP (polynomial) Hamiltonian FBR propagation regressions.

Energy literals from the reference test suite:
``/root/reference/tests/test_harmonic_fbr_sm_propagate_numpy.py:30``,
``test_anharmonic_fbr_mpssm_propagate_np.py:37``,
``test_LVC_propagate_np.py:24-28`` (coupleJ=0 case — no proj_gs).
"""

import math
import os

import pytest

from pytdscf_tpu import units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import (
    PolynomialHamiltonian,
    read_potential_nMR,
)
from pytdscf_tpu.potentials import h2o_k_orig
from pytdscf_tpu.simulator import Simulator


def test_harmonic_fbr_propagate(tmp_path):
    prim_info = [[PrimBas_HO(0.0, 1500, 8), PrimBas_HO(0.0, 2000, 8)]]
    basinfo = BasInfo(prim_info)
    ham = PolynomialHamiltonian(ndof=2)
    ham.set_HO_potential(basinfo)
    model = Model(basinfo, {"hamiltonian": ham})
    os.chdir(tmp_path)
    sim = Simulator("harmonic_fbr_sm", model, verbose=0)
    energy, _ = sim.propagate(maxstep=1)
    assert pytest.approx(energy) == 0.007973586692598029


def test_anharmonic_fbr_h2o_propagate(tmp_path):
    prim_info = [
        [
            PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 6)
            for i in (1, 2, 3)
        ]
    ]
    basinfo = BasInfo(prim_info)
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=4)
    os.chdir(tmp_path)
    sim = Simulator("anharmonic_fbr_sm", model, verbose=0)
    energy, _ = sim.propagate(maxstep=2)
    assert pytest.approx(energy) == 0.021360262338234466


def test_lvc_propagate_projgs(tmp_path):
    """coupleJ=-0.04 variant with GS-projected initial vibrational states
    (reference literal ``test_LVC_propagate_np.py:24``)."""
    freqs_cm1 = [1000, 2000, 3000]
    disps = [0.3, 0.4, 0.5]
    nprim = 5
    s0 = [PrimBas_HO(0.0, f, nprim) for f in freqs_cm1]
    s1 = [PrimBas_HO(d, f, nprim) for f, d in zip(freqs_cm1, disps)]
    basinfo = BasInfo([s0, s1])
    ham = PolynomialHamiltonian(basinfo.get_ndof(), basinfo.get_nstate())
    ham.coupleJ = [[0.0, -0.04], [-0.04, 0.007]]
    lam = {
        (0, 1): {0: 0.002, 1: 0.002, 2: 0.002},
        (1, 0): {0: 0.002, 1: 0.002, 2: 0.002},
    }
    ham.set_LVC(basinfo, lam)
    model = Model(basinfo, {"hamiltonian": ham})
    model.m_aux_max = 5
    model.init_weight_ESTATE = [1.0, 0.0]
    model.primbas_gs = s0
    import os as _os

    _os.chdir(tmp_path)
    sim = Simulator("LVC_projgs", model, proj_gs=True, verbose=0)
    energy, _ = sim.propagate(maxstep=3, stepsize=0.05)
    assert pytest.approx(energy) == 0.013669005758718421


def test_lvc_propagate(tmp_path):
    freqs_cm1 = [1000, 2000, 3000]
    disps = [0.3, 0.4, 0.5]
    nprim = 5
    s0 = [PrimBas_HO(0.0, f, nprim) for f in freqs_cm1]
    s1 = [PrimBas_HO(d, f, nprim) for f, d in zip(freqs_cm1, disps)]
    basinfo = BasInfo([s0, s1])
    ham = PolynomialHamiltonian(basinfo.get_ndof(), basinfo.get_nstate())
    ham.coupleJ = [[0.0, 0.0], [0.0, 0.007]]
    lam = {
        (0, 1): {0: 0.002, 1: 0.002, 2: 0.002},
        (1, 0): {0: 0.002, 1: 0.002, 2: 0.002},
    }
    ham.set_LVC(basinfo, lam)
    model = Model(basinfo, {"hamiltonian": ham})
    model.m_aux_max = 4
    model.init_weight_ESTATE = [1.0, 0.0]
    os.chdir(tmp_path)
    sim = Simulator("LVC_test", model, verbose=0)
    energy, _ = sim.propagate(maxstep=3, stepsize=0.05)
    assert pytest.approx(energy) == 0.013669005758738601
