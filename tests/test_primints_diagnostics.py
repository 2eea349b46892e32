"""PrimInts table container and diagnostics utilities."""

import numpy as np
import pytest

from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.basis.primints import PrimInts
from pytdscf_tpu.diagnostics import Diagnostics, mpo_diagram, mps_diagram
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import PolynomialHamiltonian


def _model():
    s0 = [PrimBas_HO(0.0, 1500, 5), PrimBas_HO(0.0, 2000, 5)]
    s1 = [PrimBas_HO(0.3, 1500, 5), PrimBas_HO(0.4, 2000, 5)]
    basinfo = BasInfo([s0, s1])
    ham = PolynomialHamiltonian(2, 2)
    ham.set_HO_potential(basinfo)
    return Model(basinfo, {"hamiltonian": ham})


def test_primints_build_and_cache(tmp_path):
    model = _model()
    ints = PrimInts(model)
    # same-basis overlap is the identity
    np.testing.assert_allclose(ints[(0, 0)]["ovlp"][0], np.eye(5))
    # cross-state overlap: columns normalised (complete HO basis limit)
    ov = ints[(0, 1)]["ovlp"][0]
    assert ov.shape == (5, 5)
    assert abs(np.linalg.norm(ov[:, 0]) - 1.0) < 0.05
    # q^1 cross blocks Hermitian-conjugate pair: ⟨0|q|1⟩ = ⟨1|q|0⟩†
    np.testing.assert_allclose(
        ints[(0, 1)]["q^1"][0], ints[(1, 0)]["q^1"][0].conj().T, atol=1e-12
    )
    path = str(tmp_path / "ints.pkl")
    ints.save(path)
    back = PrimInts.load(path)
    np.testing.assert_allclose(
        back[(0, 1)]["d^2"][1], ints[(0, 1)]["d^2"][1]
    )


def test_simulator_caches_primints(tmp_path):
    import os

    os.chdir(tmp_path)
    model = _model()
    model.init_weight_ESTATE = [1.0, 0.0]
    model.ints_prim_file = "ints_prim.pkl"
    from pytdscf_tpu.simulator import Simulator

    sim = Simulator("pi_cache", model, verbose=0)
    sim.propagate(maxstep=1)
    assert os.path.exists("ints_prim.pkl")


def test_diagnostics_and_diagrams():
    diag = Diagnostics()
    with diag.timer("sweep"):
        pass
    diag.count("steps", 3)
    rep = diag.report()
    assert "sweep" in rep and "steps=3" in rep
    art = mps_diagram([4, 4, 4], [2, 3])
    assert "[1]" in art and "--2--" in art
    art2 = mpo_diagram([4, 4], [3])
    assert "(W0)" in art2
