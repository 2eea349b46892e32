"""Full MCTDH (CI ⊗ SPF) propagation regressions.

Harmonic literal from the reference
(``/root/reference/tests/test_harmonic_fbr_mctdh_propagate_numpy.py:35``);
the anharmonic case checks VMF energy conservation with contracted SPFs.
"""

import math
import os

import pytest

from pytdscf_tpu import units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import PolynomialHamiltonian, read_potential_nMR
from pytdscf_tpu.potentials import h2o_k_orig
from pytdscf_tpu.simulator import Simulator


def test_harmonic_mctdh_propagate(tmp_path):
    os.chdir(tmp_path)
    prim_info = [[
        PrimBas_HO(0.0, 1500, 8),
        PrimBas_HO(0.0, 2000, 8),
        PrimBas_HO(0.0, 2500, 8),
    ]]
    basinfo = BasInfo(prim_info, [[5, 5, 5]])
    ham = PolynomialHamiltonian(ndof=3)
    ham.set_HO_potential(basinfo)
    model = Model(basinfo, {"hamiltonian": ham})
    sim = Simulator("harmonic_mctdh", model, ci_type="MCTDH", verbose=0)
    energy, _ = sim.propagate(maxstep=1, stepsize=0.1)
    assert pytest.approx(energy) == 0.013669005758739479


def test_anharmonic_mctdh_energy_conservation(tmp_path):
    os.chdir(tmp_path)
    prim_info = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 6)
        for i in (1, 2, 3)
    ]]
    basinfo = BasInfo(prim_info, [[4, 4, 4]])
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham})
    sim = Simulator("h2o_mctdh", model, ci_type="MCTDH", verbose=0)
    e0, _ = sim.propagate(maxstep=1, stepsize=0.1)
    e5, wf = sim.propagate(maxstep=5, stepsize=0.1)
    assert e5 == pytest.approx(e0, abs=5.0e-07)
    assert wf.norm() == pytest.approx(1.0, abs=1e-08)
