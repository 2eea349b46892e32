"""Relaxation (imaginary time + improved) and dipole-operate workflows.

Ambrosek 2-molecule aggregate literals from
``/root/reference/tests/test_Ambrosec_relax_np_projgs.py:24`` and
``test_Ambrosec_propagate_np_projgs.py:29-33`` (coupleJ = 0 cases).
"""

import os

import numpy as np
import pytest

from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import PolynomialHamiltonian
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util.helper_input import matJ_1D_exciton

FREQS = [763.31, 1556.64]
DISPS = [0.317, 0.429]
NMOL = 2
NPRIM = 5


def _build_model(coupleJ, bonddim, proj_gs=False):
    s0 = [PrimBas_HO(0.0, f, NPRIM) for f in FREQS]
    s1 = [PrimBas_HO(d, f, NPRIM) for f, d in zip(FREQS, DISPS)]
    prim_info, _, _, matJ = matJ_1D_exciton(NMOL, NPRIM, s0, s1, coupleJ)
    basinfo = BasInfo(prim_info)
    ham = PolynomialHamiltonian(basinfo.get_ndof(), basinfo.get_nstate())
    ham.coupleJ = matJ
    ham.set_HO_potential(basinfo)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=bonddim)
    model.init_weight_ESTATE = [1.0] + [0.0] * (basinfo.get_nstate() - 1)
    if proj_gs:
        model.primbas_gs = s0 * NMOL
    return model


def test_ambrosek_imag_relax(tmp_path):
    os.chdir(tmp_path)
    model = _build_model(0.0, 4)
    sim = Simulator("ambrosek", model, verbose=0)
    energy, _ = sim.relax(maxstep=2, stepsize=0.05, improved=False)
    assert pytest.approx(energy) == 0.010570469969995883


def test_ambrosek_propagate(tmp_path):
    os.chdir(tmp_path)
    model = _build_model(0.0, 4)
    sim = Simulator("ambrosek", model, verbose=0)
    energy, _ = sim.propagate(maxstep=3, stepsize=0.05)
    assert pytest.approx(energy) == 0.010570469969995852


#: DELIBERATE reference deviation: the reference's displaced-HO overlap
#: matrix is numerically wrong — ``ovi_HO_FBR_matrix``
#: (``/root/reference/pytdscf/basis/_primints_cls.py:34``, the J.-L. Chang
#: 2005 recursion) returns ⟨χ'_m|χ_0⟩ = [0, 0, 0.69, 0.27, −0.54] for a
#: δ = 0.317 displaced same-frequency pair, where quadrature (and the
#: closed-form coherent-state overlap e^{−δ²/4}δ^m/√(2^m m!)) gives
#: [0.975, −0.218, 0.031, ...].  The reference literals
#: 0.03950380914328852 / 0.03929851595695371
#: (``test_Ambrosec_*_np_projgs.py``) encode that bug: their "GS-projected"
#: initial state carries ~3× the zero-point energy.  This package's
#: cross-basis overlaps are quadrature-validated (tests/test_native_
#: primints.py), so the proj_gs literals below are OUR values, checked
#: against the analytic energy ZPE + Σ ω δ²/2 = 0.0105705 + 0.000827.
PROJGS_E = 0.011397875485012856


def test_ambrosek_projgs_propagate(tmp_path):
    """Aggregate with coupleJ = −0.04 eV and GS-projected vibrations
    (reference ``test_Ambrosec_propagate_np_projgs.py:29-33``; literal
    deviates deliberately — see PROJGS_E above)."""
    from pytdscf_tpu import units

    os.chdir(tmp_path)
    model = _build_model(-0.04 / units.au_in_eV, 5, proj_gs=True)
    sim = Simulator("ambrosek_pg", model, proj_gs=True, verbose=0)
    energy, _ = sim.propagate(maxstep=3, stepsize=0.05)
    assert pytest.approx(energy) == PROJGS_E
    # physics anchor: ZPE + coherent-state reorganisation Σ ω δ²/2
    from pytdscf_tpu.units import au_in_cm1

    # 4 modes à ω/2 = (763.31 + 1556.64) cm⁻¹ total
    zpe = (763.31 + 1556.64) / au_in_cm1
    lam = (763.31 * 0.317**2 + 1556.64 * 0.429**2) / 2 / au_in_cm1
    assert energy == pytest.approx(zpe + lam, abs=2e-6)


def test_ambrosek_projgs_imag_relax(tmp_path):
    """Same aggregate under imaginary-time relaxation (reference
    ``test_Ambrosec_relax_np_projgs.py:24,29``; literal deviates
    deliberately — see PROJGS_E above)."""
    from pytdscf_tpu import units

    os.chdir(tmp_path)
    model = _build_model(-0.04 / units.au_in_eV, 5, proj_gs=True)
    sim = Simulator("ambrosek_pgr", model, proj_gs=True, verbose=0)
    energy, _ = sim.relax(maxstep=2, stepsize=0.05, improved=False)
    assert pytest.approx(energy) == 0.011367589141866094
    # imaginary time strictly lowers the energy from the projected start
    assert energy < PROJGS_E


def test_improved_relax_finds_ground_state(tmp_path):
    """Improved (diagonalisation) relaxation reaches the exact HO ZPE."""
    os.chdir(tmp_path)
    model = _build_model(0.0, 4)
    # start from a mixed vibrational configuration (nonzero GS overlap —
    # Lanczos cannot leave an exact excited eigenstate, so a pure |v=1⟩
    # seed would be stationary, in the reference as well)
    es = [0.6, 0.8, 0.0, 0.0, 0.0]
    gs = [1.0, 0.0, 0.0, 0.0, 0.0]
    model.init_weight_VIBSTATE = [
        [es, gs, gs, gs],
        [gs, gs, gs, gs],
    ]
    sim = Simulator("ambrosek_imp", model, verbose=0)
    energy, _ = sim.relax(maxstep=5, stepsize=0.1, improved=True)
    from pytdscf_tpu import units

    zpe = sum(FREQS) / units.au_in_cm1  # two molecules × Σω/2
    assert energy == pytest.approx(zpe, abs=1.0e-10)
