"""End-to-end ``Simulator.propagate(parallel_split_indices=...)``.

The reference wires its MPI parallel MPS through the same driver kwarg
(``/root/reference/pytdscf/simulator_cls.py:181,364-370``;
``tests/test_mpi_exiciton_propagate.py:208``).  Here the kwarg constructs
the SPMD shard_map engine (or the in-process PITDVP below the device
count), with Properties logging, dat export, checkpoint backup and
restart all working in parallel mode — and it must never be silently
ignored.
"""

import os

import numpy as np
import pytest

import jax

from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import PolynomialHamiltonian
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util.helper_input import matJ_1D_exciton


def _model():
    freqs = [763.31, 1556.64]
    disps = [0.317, 0.429]
    s0 = [PrimBas_HO(0.0, f, 5) for f in freqs]
    s1 = [PrimBas_HO(d, f, 5) for f, d in zip(freqs, disps)]
    prim, _, _, matJ = matJ_1D_exciton(2, 5, s0, s1, 1.0e-03)
    basinfo = BasInfo(prim)
    ham = PolynomialHamiltonian(basinfo.get_ndof(), basinfo.get_nstate())
    ham.coupleJ = matJ
    ham.set_HO_potential(basinfo)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=6)
    model.init_weight_ESTATE = [1.0, 0.0]
    return model


def _read_dat(path):
    rows = []
    with open(path) as fh:
        for line in fh:
            if not line.strip() or line.startswith("#"):
                continue
            vals = []
            for x in line.split():
                if x.endswith("j"):
                    c = complex(x.replace(" ", ""))
                    vals.extend([c.real, c.imag])
                else:
                    vals.append(float(x))
            rows.append(vals)
    return np.asarray(rows)


def test_simulator_parallel_matches_serial(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    os.chdir(tmp_path)
    nsteps = 4

    e_s, wf_s = Simulator("ser", _model(), verbose=0).propagate(
        stepsize=0.2, maxstep=nsteps, loadfile_ext="", autocorr=True,
        reduced_density=([(2,)], 1),
    )
    e_p, wf_p = Simulator("par", _model(), verbose=0).propagate(
        stepsize=0.2,
        maxstep=nsteps,
        loadfile_ext="",
        autocorr=True,
        reduced_density=([(2,)], 1),
        parallel_split_indices=[(0, 1), (2, 3)],
    )
    assert e_p == pytest.approx(e_s, abs=5e-4)

    # the parallel run produced the same dat exports as the serial one
    for name in ("autocorr", "populations"):
        ser = _read_dat(f"ser_prop/{name}.dat")
        par = _read_dat(f"par_prop/{name}.dat")
        assert ser.shape == par.shape, name
        # boundary-splitting error of the two-phase parallel sweep
        np.testing.assert_allclose(par, ser, atol=2e-3, err_msg=name)

    # netCDF reduced densities ride the in-mesh RDM path under SPMD
    from pytdscf_tpu.util.read_nc import read_nc

    rd_s = read_nc("ser_prop/reduced_density.nc", [(2,)])
    rd_p = read_nc("par_prop/reduced_density.nc", [(2,)])
    assert rd_p[(2,)].shape == rd_s[(2,)].shape
    np.testing.assert_allclose(rd_p[(2,)], rd_s[(2,)], atol=2e-3)

    # wavefunction checkpoints exist and restart continues the run
    assert os.path.exists("wf_par.pkl")
    _, wf_p2 = Simulator("par", _model(), verbose=0).propagate(
        stepsize=0.2,
        maxstep=2,
        restart=True,
        loadfile_ext="",
        savefile_ext="_cont",
        parallel_split_indices=[(0, 1), (2, 3)],
    )
    _, wf_s2 = Simulator("ser", _model(), verbose=0).propagate(
        stepsize=0.2,
        maxstep=2,
        restart=True,
        loadfile_ext="",
        savefile_ext="_cont",
    )
    np.testing.assert_allclose(
        wf_p2.pop_states(), wf_s2.pop_states(), atol=1e-3
    )


def test_simulator_parallel_fetch_stride_rows_identical(tmp_path):
    """Deferred multi-step property fetches under the SPMD parallel
    driver (the in-mesh observables are submitted per step and resolved
    in one packed fetch): rows must be bit-identical to stride 1."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    os.chdir(tmp_path)
    for name, stride in (("fs1", 1), ("fs3", 3)):
        Simulator(name, _model(), verbose=0).propagate(
            stepsize=0.2, maxstep=5, loadfile_ext="", autocorr=True,
            parallel_split_indices=[(0, 1), (2, 3)], fetch_stride=stride,
        )
    for name in ("autocorr", "populations"):
        a = open(f"fs1_prop/{name}.dat").read()
        b = open(f"fs3_prop/{name}.dat").read()
        assert a == b, name
        assert len(a.strip().splitlines()) == 1 + 5


def test_simulator_parallel_bad_split_raises(tmp_path):
    os.chdir(tmp_path)
    sim = Simulator("bad", _model(), verbose=0)
    with pytest.raises((ValueError, NotImplementedError)):
        sim.propagate(
            maxstep=1, loadfile_ext="",
            parallel_split_indices=[(0, 0), (1, 3)],  # unequal
        )
    with pytest.raises((ValueError, NotImplementedError)):
        sim.propagate(
            maxstep=1, loadfile_ext="",
            parallel_split_indices=[(0, 1), (1, 3)],  # overlapping
        )
