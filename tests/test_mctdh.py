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


def test_mctdh_improved_relax_matches_mps_zpe(tmp_path):
    """Improved (CI-diagonalisation) relaxation with full-rank SPFs reaches
    the H2O anharmonic ZPE computed independently by the MPS engine
    (tests/test_h2o_pipeline.py literal 0.0208557166) — a cross-ansatz
    anchor.  Reference semantics: under doRelax the CI update becomes
    ``diagonalize_CI`` and the SPF EOM factor switches −i → −1
    (``/root/reference/pytdscf/_ci_cls.py:255-262``, ``_spf_cls.py:307``).
    """
    os.chdir(tmp_path)
    prim_info = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
        for i in (1, 2, 3)
    ]]
    # full-rank SPFs: relaxation must hit the exact primitive-space ZPE
    basinfo = BasInfo(prim_info, [[9, 9, 9]])
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham})
    sim = Simulator("h2o_mctdh_relax", model, ci_type="MCTDH", verbose=0)
    e_gs, _ = sim.relax(maxstep=3, stepsize=0.1, improved=True)
    assert e_gs == pytest.approx(0.0208557166, abs=1.0e-08)


def test_mctdh_imaginary_relax_contracted_spfs(tmp_path):
    """Imaginary-time relaxation with CONTRACTED SPFs (nspf < nprim): the
    orbital flow must now run in imaginary time too, so the energy drops
    monotonically toward (and variationally above) the full-space ZPE."""
    os.chdir(tmp_path)
    prim_info = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
        for i in (1, 2, 3)
    ]]
    basinfo = BasInfo(prim_info, [[4, 4, 4]])
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham})
    sim = Simulator("h2o_mctdh_imrelax", model, ci_type="MCTDH", verbose=0)
    e1, _ = sim.relax(maxstep=2, stepsize=0.2, improved=False)
    e2, _ = sim.relax(
        maxstep=12, stepsize=0.2, improved=False,
        restart=True, loadfile_ext="_gs", savefile_ext="_gs",
    )
    assert e2 < e1  # monotone descent continues across the restart
    zpe_full = 0.0208557166
    assert e2 > zpe_full - 1.0e-09  # variational bound
    assert e2 == pytest.approx(zpe_full, abs=5.0e-04)


def test_mctdh_operate_dipole(tmp_path):
    """Simulator.operate for ci_type='MCTDH' (the reference's MCTDH
    ``wavefunction.apply_dipole``): with full-rank SPFs the CI projection
    is exact, so ‖μ|Ψ_gs⟩‖ must match the MPS route on the identical
    model; with contracted SPFs the alternating SPF-rotation fit recovers
    the norm to the contraction error (and stays variationally below)."""
    from pytdscf_tpu.potentials import h2o_mu

    os.chdir(tmp_path)
    prim_info = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
        for i in (1, 2, 3)
    ]]
    ham = read_potential_nMR(h2o_k_orig)
    mu_ham = read_potential_nMR(
        None, dipole_emu=h2o_mu, efield=(1e-2, 1e-2, 1e-2)
    )

    # --- MPS route (ground truth: full-rank fit in the 9³ space)
    basinfo = BasInfo(prim_info)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=9)
    sim = Simulator("h2o_mps", model, verbose=0)
    sim.relax(maxstep=5, stepsize=0.1, improved=True)
    model_mu = Model(basinfo, {"hamiltonian": mu_ham}, bond_dim=9)
    norm_mps, _ = Simulator("h2o_mps", model_mu, verbose=0).operate(
        maxstep=10, restart=True, loadfile_ext="_gs"
    )

    # --- MCTDH route, full-rank SPFs
    basinfo_f = BasInfo(prim_info, [[9, 9, 9]])
    model_f = Model(basinfo_f, {"hamiltonian": ham})
    sim_f = Simulator("h2o_mctdh_op", model_f, ci_type="MCTDH", verbose=0)
    sim_f.relax(maxstep=3, stepsize=0.1, improved=True)
    model_f_mu = Model(basinfo_f, {"hamiltonian": mu_ham})
    norm_f, _ = Simulator(
        "h2o_mctdh_op", model_f_mu, ci_type="MCTDH", verbose=0
    ).operate(maxstep=10, restart=True, loadfile_ext="_gs")
    assert norm_f == pytest.approx(norm_mps, rel=1e-07)

    # --- MCTDH route, contracted SPFs (exercises the SPF rotation)
    basinfo_c = BasInfo(prim_info, [[5, 5, 5]])
    model_c = Model(basinfo_c, {"hamiltonian": ham})
    sim_c = Simulator("h2o_mctdh_opc", model_c, ci_type="MCTDH", verbose=0)
    sim_c.relax(maxstep=3, stepsize=0.1, improved=True)
    model_c_mu = Model(basinfo_c, {"hamiltonian": mu_ham})
    norm_c, _ = Simulator(
        "h2o_mctdh_opc", model_c_mu, ci_type="MCTDH", verbose=0
    ).operate(maxstep=10, restart=True, loadfile_ext="_gs")
    # the contracted GS differs from the full one at the contraction
    # error, so its ‖μΨ₀‖ is close to (not bounded by) the full value
    assert norm_c == pytest.approx(norm_f, rel=1e-04)
