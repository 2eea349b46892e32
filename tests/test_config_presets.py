"""Precision presets: the measured χ=1024 accuracy/throughput rungs
(round-5 matrix, BASELINE.md) as one-call configurations."""

import pytest

from pytdscf_tpu.config import Config


def test_presets_fields():
    base = Config(jobname="p")
    t = base.with_precision_preset("throughput")
    assert (t.matvec_precision, t.env_precision) == ("high", "high")
    assert t.krylov_relaxed and t.relax_after == 1 and t.pallas_matvec
    b = base.with_precision_preset("balanced")
    assert (b.matvec_precision, b.env_precision) == ("highest", "highest")
    assert b.krylov_relaxed and b.relax_after == 1
    p = base.with_precision_preset("precise")
    assert p.krylov_relaxed and p.relax_after == 2
    assert (p.matvec_precision, p.env_precision) == ("highest", "highest")
    e = base.with_precision_preset("exact")
    assert not e.krylov_relaxed and not e.pallas_matvec
    assert (e.matvec_precision, e.env_precision) == ("highest", "highest")
    # presets do not touch unrelated fields
    assert t.jobname == "p" and t.dtype == base.dtype


def test_preset_unknown():
    with pytest.raises(ValueError):
        Config(jobname="p").with_precision_preset("fast")


def test_simulator_propagate_precision_preset(tmp_path):
    """The driver surface: presets reach the engine Config end-to-end
    (and rejection of unknown names happens before any compute)."""
    import os

    import numpy as np

    from pytdscf_tpu.basis import Exciton
    from pytdscf_tpu.model import Model
    from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
    from pytdscf_tpu.operators.tensor_op import TensorOperator
    from pytdscf_tpu.simulator import Simulator

    os.chdir(tmp_path)
    h = np.diag([0.0, 0.01]) + 0.002 * (np.ones((2, 2)) - np.eye(2))
    pot = {(0, 0): TensorOperator(mpo=[h[None, :, :, None]], legs=(0, 0))}
    ham = TensorHamiltonian(1, [[pot]], kinetic=None)
    model = Model([Exciton(nstate=2)], {"hamiltonian": ham}, bond_dim=2)
    model.init_HartreeProduct = [[[1.0, 0.0]]]
    sim = Simulator("preset_e2e", model, verbose=0)
    with pytest.raises(ValueError):
        sim.propagate(maxstep=1, loadfile_ext="",
                      precision_preset="warpspeed")
    e, _ = sim.propagate(maxstep=3, loadfile_ext="",
                         precision_preset="balanced")
    assert np.isfinite(float(e))
