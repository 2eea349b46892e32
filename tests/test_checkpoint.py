"""Checkpoint roundtrips (pickle and orbax backends)."""

import numpy as np
import pytest

from pytdscf_tpu.checkpoint import (
    load_wavefunction,
    resolve_checkpoint,
    save_wavefunction,
)


def _payload():
    rng = np.random.default_rng(0)
    return {
        "cores": [
            [
                (rng.normal(size=(1, 4, 2)) + 1j * rng.normal(size=(1, 4, 2))),
                (rng.normal(size=(2, 4, 1)) + 1j * rng.normal(size=(2, 4, 1))),
            ]
        ]
    }


def test_pickle_roundtrip(tmp_path):
    path = str(tmp_path / "wf_test.pkl")
    payload = _payload()
    out = save_wavefunction(payload, path, backend="pickle")
    assert out == path
    back = load_wavefunction(resolve_checkpoint(path))
    np.testing.assert_allclose(back["cores"][0][0], payload["cores"][0][0])


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    path = str(tmp_path / "wf_test.pkl")
    payload = _payload()
    out = save_wavefunction(payload, path, backend="orbax")
    assert out.endswith(".ckpt")
    back = load_wavefunction(out)
    np.testing.assert_allclose(
        np.asarray(back["cores"][0][1]), payload["cores"][0][1]
    )
    # resolve finds the orbax checkpoint from the pickle-style base name
    assert resolve_checkpoint(path) == out


def test_mctdh_restart_continues_trajectory(tmp_path, monkeypatch):
    """Split 6-step MCTDH propagation (3 + restart 3) reproduces the
    continuous 6-step energy and CI tensors (restart support for the
    VMF engines — reference ``simulator_cls.py:577-589`` analogue)."""
    import math

    from pytdscf_tpu import units
    from pytdscf_tpu.basis import PrimBas_HO
    from pytdscf_tpu.model import BasInfo, Model
    from pytdscf_tpu.operators.sop import read_potential_nMR
    from pytdscf_tpu.potentials import h2o_k_orig
    from pytdscf_tpu.simulator import Simulator

    monkeypatch.chdir(tmp_path)
    prim_info = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 6)
        for i in (1, 2, 3)
    ]]

    def build():
        basinfo = BasInfo(prim_info, [[4, 4, 4]])
        ham = read_potential_nMR(h2o_k_orig)
        return Model(basinfo, {"hamiltonian": ham})

    e_cont, wf_cont = Simulator(
        "mcr_cont", build(), ci_type="MCTDH", verbose=0
    ).propagate(maxstep=6, stepsize=0.1)

    sim = Simulator("mcr_split", build(), ci_type="MCTDH", verbose=0)
    sim.propagate(maxstep=3, stepsize=0.1)
    e_split, wf_split = sim.propagate(
        maxstep=3, stepsize=0.1, restart=True, loadfile_ext=""
    )
    assert e_split == pytest.approx(e_cont, abs=1e-10)
    for a, b in zip(wf_cont.engine.cis, wf_split.engine.cis):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-09)


def test_mps_mctdh_restart_continues_trajectory(tmp_path, monkeypatch):
    """Same split-restart identity for the MPS-MCTDH hybrid engine."""
    import math

    from pytdscf_tpu import units
    from pytdscf_tpu.basis import PrimBas_HO
    from pytdscf_tpu.model import BasInfo, Model
    from pytdscf_tpu.operators.sop import read_potential_nMR
    from pytdscf_tpu.potentials import h2o_k_orig
    from pytdscf_tpu.simulator import Simulator

    monkeypatch.chdir(tmp_path)
    prim_info = [[
        PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 6)
        for i in (1, 2, 3)
    ]]

    def build():
        basinfo = BasInfo(prim_info, [[4, 4, 4]])  # nspf < nprim → hybrid
        ham = read_potential_nMR(h2o_k_orig)
        model = Model(basinfo, {"hamiltonian": ham})
        model.m_aux_max = 4
        return model

    e_cont, wf_cont = Simulator(
        "hyr_cont", build(), verbose=0
    ).propagate(maxstep=6, stepsize=0.1)

    sim = Simulator("hyr_split", build(), verbose=0)
    sim.propagate(maxstep=3, stepsize=0.1)
    e_split, wf_split = sim.propagate(
        maxstep=3, stepsize=0.1, restart=True, loadfile_ext=""
    )
    assert e_split == pytest.approx(e_cont, abs=1e-10)
