"""MPS-MCTDH hybrid (MPS over SPF-contracted bases) regressions.

Reference capability: ``/root/reference/pytdscf/_mps_sop.py:111-383``
(non-standard method: MPS site dimensions = nspf with an SPF layer below,
mean fields from MPS hole contractions ``:839-1172``).  Strategy: the
full-SPF limit must reproduce the plain primitive-basis MPS propagation
exactly; the contracted hybrid must conserve energy/norm and track the
full-basis autocorrelation.
"""

import math
import os

import numpy as np
import pytest

from pytdscf_tpu import units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import h2o_k_orig
from pytdscf_tpu.simulator import Simulator

NPRIM = 6
DT = 0.1
NSTEP = 6


def _prim_info():
    return [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, NPRIM)
        for i in (1, 2, 3)
    ]]


def _run(jobname, basinfo, bond_dim=8):
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=bond_dim)
    sim = Simulator(jobname, model, verbose=0)
    e, wf = sim.propagate(maxstep=NSTEP, stepsize=DT)
    auto = np.loadtxt(f"{jobname}_prop/autocorr.dat", dtype=complex,
                      converters={1: lambda s: complex(s)}, usecols=(1,))
    return e, wf, auto


def test_hybrid_full_spf_limit_matches_mps(tmp_path):
    """nspf == nprim forced through the hybrid engine ≡ plain MPS."""
    os.chdir(tmp_path)
    e_mps, wf_mps, auto_mps = _run("h2o_plain", BasInfo(_prim_info()))
    # spf_info equal to nprim but EXPLICIT → is_standard_method False →
    # hybrid engine with square SPF matrices ((1−P) ≡ 0, SPFs frozen)
    basinfo = BasInfo(_prim_info(), [[NPRIM] * 3])
    assert not basinfo.is_standard_method
    e_hyb, wf_hyb, auto_hyb = _run("h2o_hyb_full", basinfo)
    assert e_hyb == pytest.approx(e_mps, abs=1e-10)
    np.testing.assert_allclose(auto_hyb, auto_mps, atol=1e-9)


def test_hybrid_contracted(tmp_path):
    """nspf < nprim: energy/norm conserved, autocorr tracks full basis."""
    os.chdir(tmp_path)
    _, _, auto_full = _run("h2o_full", BasInfo(_prim_info()))
    basinfo = BasInfo(_prim_info(), [[4, 4, 4]])
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=4)
    sim = Simulator("h2o_hyb", model, verbose=0)
    e0, _ = sim.propagate(maxstep=1, stepsize=DT)
    e, wf = sim.propagate(maxstep=NSTEP, stepsize=DT)
    assert e == pytest.approx(e0, abs=5e-7)
    assert wf.norm() == pytest.approx(1.0, abs=1e-8)
    auto = np.loadtxt("h2o_hyb_prop/autocorr.dat", dtype=complex,
                      converters={1: lambda s: complex(s)}, usecols=(1,))
    np.testing.assert_allclose(auto, auto_full[: len(auto)], atol=2e-4)


def test_hybrid_tdh_split(tmp_path):
    """A dof with nspf=1 (the reference's TDH split) still conserves
    energy — the single SPF evolves by the mean-field TDH EOM."""
    os.chdir(tmp_path)
    basinfo = BasInfo(_prim_info(), [[4, 4, 1]])
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=4)
    sim = Simulator("h2o_tdh", model, verbose=0)
    e0, _ = sim.propagate(maxstep=1, stepsize=DT)
    e, wf = sim.propagate(maxstep=NSTEP, stepsize=DT)
    assert e == pytest.approx(e0, abs=5e-6)
    assert wf.norm() == pytest.approx(1.0, abs=1e-8)
