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


def test_hybrid_multidof_rdm_matches_mps(tmp_path):
    """Hybrid RDMs over 1 AND 2 kept DOFs (primitive basis) match the
    plain-MPS engine in the full-SPF limit; contracted-hybrid marginals
    are consistent (Tr₂ ρ₁₂ = ρ₁)."""
    os.chdir(tmp_path)
    ham = read_potential_nMR(h2o_k_orig)

    def engines():
        m_p = Model(BasInfo(_prim_info()), {"hamiltonian": ham},
                    bond_dim=8)
        s_p = Simulator("rdm_mps", m_p, verbose=0)
        bi = BasInfo(_prim_info(), [[NPRIM] * 3])
        m_h = Model(bi, {"hamiltonian": ham}, bond_dim=8)
        s_h = Simulator("rdm_hyb", m_h, verbose=0)
        cfgs = []
        for s in (s_p, s_h):
            from pytdscf_tpu.config import Config

            cfg = Config(jobname="x", thresh_exp=1e-10)
            cfgs.append(s._initial_engine(cfg, False, ""))
        return cfgs

    eng_mps, eng_hyb = engines()
    for _ in range(3):
        eng_mps.propagate(DT / units.au_in_fs)
        eng_hyb.propagate(DT / units.au_in_fs)
    # single kept DOF
    r1_mps = eng_mps.reduced_density((0, 2))
    r1_hyb = eng_hyb.reduced_density((0, 2, 0))
    np.testing.assert_allclose(r1_hyb, r1_mps, atol=1e-8)
    # two kept DOFs
    r12_mps = eng_mps.reduced_density((2, 2))
    r12_hyb = eng_hyb.reduced_density((2, 2, 0))
    np.testing.assert_allclose(r12_hyb, r12_mps, atol=1e-8)
    # diagonal-only legs
    g_mps = eng_mps.reduced_density((1, 1))
    g_hyb = eng_hyb.reduced_density((1, 1, 0))
    np.testing.assert_allclose(g_hyb, g_mps, atol=1e-8)
    # marginal consistency on the 2-DOF density
    np.testing.assert_allclose(
        np.trace(r12_hyb, axis1=0, axis2=1),
        eng_hyb.reduced_density((0, 2, 0)), atol=1e-9,
    )


def test_mctdh_multidof_rdm(tmp_path):
    """MCTDH RDMs over 2 kept DOFs: marginals equal the 1-DOF RDMs and
    the trace equals the state population."""
    os.chdir(tmp_path)
    from pytdscf_tpu.config import Config

    ham = read_potential_nMR(h2o_k_orig)
    basinfo = BasInfo(_prim_info(), [[4, 4, 4]])
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=4)
    sim = Simulator("mctdh_rdm", model, ci_type="mctdh", verbose=0)
    eng = sim._initial_engine(Config(jobname="x"), False, "")
    for _ in range(3):
        eng.propagate(DT / units.au_in_fs)
    r12 = eng.reduced_density((2, 2, 0))
    r1 = eng.reduced_density((2, 0, 0))
    r2 = eng.reduced_density((0, 2, 0))
    np.testing.assert_allclose(
        np.trace(r12, axis1=2, axis2=3), r1, atol=1e-10
    )
    np.testing.assert_allclose(
        np.trace(r12, axis1=0, axis2=1), r2, atol=1e-10
    )
    assert np.trace(r1) == pytest.approx(1.0, abs=1e-8)
    # diagonal-only legs agree with the full density's diagonal
    g12 = eng.reduced_density((1, 1, 0))
    np.testing.assert_allclose(
        g12, np.einsum("aabb->ab", r12), atol=1e-12
    )


def test_hybrid_gate_matches_mps(tmp_path):
    """One-site gates project onto the SPF bases: full-SPF-limit hybrid
    ≡ plain MPS with the same per-step gate (reference routes gates
    through its nonstandard-method MPS path, ``wavefunction.py:398``)."""
    os.chdir(tmp_path)
    from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
    from pytdscf_tpu.operators.tensor_op import TensorOperator

    # diagonal phase gate on DOF 1 (primitive basis, unitary)
    U = np.diag(np.exp(1j * 0.13 * np.arange(NPRIM)))
    op_dict = {
        ((1, 1),): TensorOperator(mpo=[U[None, :, :, None]], legs=(1, 1))
    }
    gate = TensorHamiltonian(3, potential=[[op_dict]], kinetic=None)
    ham = read_potential_nMR(h2o_k_orig)

    def run(jobname, basinfo):
        model = Model(basinfo, {"hamiltonian": ham}, bond_dim=8,
                      one_gate_to_apply=gate)
        sim = Simulator(jobname, model, verbose=0)
        e, wf = sim.propagate(maxstep=4, stepsize=DT)
        return wf

    wf_mps = run("gate_mps", BasInfo(_prim_info()))
    wf_hyb = run("gate_hyb", BasInfo(_prim_info(), [[NPRIM] * 3]))
    r_mps = wf_mps.engine.reduced_density((0, 2))
    r_hyb = wf_hyb.engine.reduced_density((0, 2, 0))
    # the hybrid's Strang split places the gate at a slightly different
    # point in the step than the serial fwd|gate|bwd ordering → O(dt²)
    np.testing.assert_allclose(r_hyb, r_mps, atol=5e-5)
    assert wf_hyb.norm() == pytest.approx(wf_mps.norm(), abs=1e-9)


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


def test_hybrid_to_mctdh_conversion(tmp_path):
    """to_mctdh (the reference's ``trans_mps2fci``,
    ``/root/reference/pytdscf/_helper.py:165-188``): contracting the hybrid
    MPS into a dense CI tensor preserves energy/norm/autocorr to round-off,
    and the converted full-MCTDH wavefunction keeps propagating with the
    same conserved energy."""
    os.chdir(tmp_path)
    basinfo = BasInfo(_prim_info(), [[4, 4, 4]])
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=6)
    sim = Simulator("h2o_conv", model, verbose=0)
    e_hyb, wf = sim.propagate(maxstep=3, stepsize=DT)
    hybrid = wf.engine
    full = hybrid.to_mctdh()
    assert complex(full.expectation()).real == pytest.approx(
        complex(hybrid.expectation()).real, abs=1e-10
    )
    assert full.norm() == pytest.approx(hybrid.norm(), abs=1e-10)
    assert complex(full.autocorr()) == pytest.approx(
        complex(hybrid.autocorr()), abs=1e-10
    )
    e0 = complex(full.expectation()).real
    for _ in range(3):
        full.propagate(DT)
    assert complex(full.expectation()).real == pytest.approx(e0, abs=5e-7)
    assert full.norm() == pytest.approx(1.0, abs=1e-8)


def test_hybrid_improved_relax(tmp_path):
    """Improved relaxation through the hybrid engine: the MPS layer
    diagonalises while the SPFs flow in imaginary time; the relaxed energy
    must approach the full-space ZPE from above (variational) and sit
    within the SPF-contraction error of the MPS literal 0.0208557166
    (tests/test_h2o_pipeline.py, 9³ primitive space)."""
    os.chdir(tmp_path)
    prim = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
        for i in (1, 2, 3)
    ]]
    basinfo = BasInfo(prim, [[5, 5, 5]])
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=5)
    sim = Simulator("h2o_hyb_relax", model, verbose=0)
    e_gs, _ = sim.relax(maxstep=10, stepsize=0.2, improved=True)
    zpe_full = 0.0208557166
    assert e_gs > zpe_full - 1.0e-09
    assert e_gs == pytest.approx(zpe_full, abs=2.0e-05)


def test_hybrid_operate_dipole(tmp_path):
    """Simulator.operate through the hybrid engine: frozen-SPF projection
    + MPS alternating fit.  The fitted norm is bounded by the full-space
    value and recovers most of it (the GS-optimised SPFs span the dipole
    action well for a near-harmonic PES)."""
    from pytdscf_tpu.potentials import h2o_mu

    os.chdir(tmp_path)
    prim = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
        for i in (1, 2, 3)
    ]]
    ham = read_potential_nMR(h2o_k_orig)
    mu_ham = read_potential_nMR(
        None, dipole_emu=h2o_mu, efield=(1e-2, 1e-2, 1e-2)
    )

    # full-space reference norm via the plain MPS route
    model = Model(BasInfo(prim), {"hamiltonian": ham}, bond_dim=9)
    sim = Simulator("h2o_mps_ref", model, verbose=0)
    sim.relax(maxstep=5, stepsize=0.1, improved=True)
    norm_full, _ = Simulator(
        "h2o_mps_ref",
        Model(BasInfo(prim), {"hamiltonian": mu_ham}, bond_dim=9),
        verbose=0,
    ).operate(maxstep=10, restart=True, loadfile_ext="_gs")

    basinfo = BasInfo(prim, [[6, 6, 6]])
    model_h = Model(basinfo, {"hamiltonian": ham}, bond_dim=6)
    sim_h = Simulator("h2o_hyb_op", model_h, verbose=0)
    sim_h.relax(maxstep=8, stepsize=0.2, improved=True)
    norm_h, _ = Simulator(
        "h2o_hyb_op",
        Model(basinfo, {"hamiltonian": mu_ham}, bond_dim=6),
        verbose=0,
    ).operate(maxstep=10, restart=True, loadfile_ext="_gs")
    assert norm_h < norm_full * (1.0 + 1e-09)
    assert norm_h > 0.97 * norm_full
