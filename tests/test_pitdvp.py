"""Chain-partitioned parallel TDVP vs the serial engine.

Reference analog: ``/root/reference/tests/test_mpi_exiciton_propagate.py``
(parallel propagation must track the serial result).  The PITDVP boundary
splitting carries an O(dt) Trotter-type error at segment boundaries, so
agreement is checked at small dt with a tolerance scaled accordingly, plus
invariants (norm conservation, energy conservation).
"""

import numpy as np
import pytest

from pytdscf_tpu.basis import Boson
from pytdscf_tpu.config import Config
from pytdscf_tpu.mps.lattice import alloc_hartree_product
from pytdscf_tpu.mps.tdvp import TDVPEngine
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator
from pytdscf_tpu.parallel.pitdvp import PITDVP

NSITE = 16
NLEV = 3
BOND = 6
DT = 0.05


def _model():
    basis = [Boson(NLEV) for _ in range(NSITE)]
    n_mat = basis[0].get_number_matrix()
    q_mat = basis[0].get_q_matrix()
    pot = {}
    for s in range(NSITE):
        pot[(s, s)] = TensorOperator(
            mpo=[(0.05 * (1 + 0.1 * s) * n_mat)[None, :, :, None]],
            legs=(s, s),
        )
    for s in range(NSITE - 1):
        key = (s, s, s + 1, s + 1)
        pot[key] = TensorOperator(
            mpo=[(0.02 * q_mat)[None, :, :, None], q_mat[None, :, :, None]],
            legs=key,
        )
    ham = TensorHamiltonian(NSITE, [[pot]], kinetic=None)
    vecs = []
    rng = np.random.default_rng(11)
    for s in range(NSITE):
        v = np.zeros(NLEV, complex)
        v[0] = 1.0
        if s in (5, 10):
            v[:] = 0
            v[1] = 1.0
        vecs.append(v)
    cores = alloc_hartree_product([NLEV] * NSITE, BOND, vecs)
    return ham, cores


def _serial_rho(engine):
    return np.array(
        [engine.grid_pop(p) for p in (0, 5, 10, 15)]
    )


@pytest.mark.parametrize("nseg", [2, 4])
def test_pitdvp_tracks_serial(nseg):
    ham, cores = _model()
    nsteps = 4

    serial = TDVPEngine(
        [list(cores)], ham, Config(jobname="serial", thresh_exp=1e-10)
    )
    e0 = serial.expectation().real
    for _ in range(nsteps):
        serial.propagate(DT)
    e_serial = serial.expectation().real

    par = PITDVP(
        list(cores), ham, Config(jobname="par", thresh_exp=1e-10), nseg
    )
    e0p = par.expectation()
    assert e0p == pytest.approx(e0, abs=1e-09)
    for _ in range(nsteps):
        par.propagate(DT)
    e_par = par.expectation()
    n_par = par.norm()

    # invariants: norm and energy conserved to the boundary-splitting order
    assert n_par == pytest.approx(1.0, abs=5e-04)
    assert e_par == pytest.approx(e0, abs=5e-04)
    # tracks the serial propagation
    assert e_par == pytest.approx(e_serial, abs=5e-04)

    # local observables agree with serial to the splitting error
    ser_cores = par.to_serial_cores()
    from pytdscf_tpu.mps.lattice import right_canonicalize

    ser_cores = right_canonicalize(ser_cores)
    chk = TDVPEngine(
        [ser_cores], ham, Config(jobname="chk", thresh_exp=1e-10)
    )
    pops_par = _serial_rho(chk)
    pops_ser = _serial_rho(serial)
    np.testing.assert_allclose(pops_par, pops_ser, atol=5e-03)


def test_pitdvp_krylov_relaxed_tracks_exact():
    """Config.krylov_relaxed threads through the parallel evolvers.  The
    relaxed path runs genuine planar-bf16 matvecs on every backend, so the
    runs track the exact propagation to the late-coefficient weight."""
    ham, cores = _model()
    a = PITDVP(
        list(cores), ham, Config(jobname="r0", thresh_exp=1e-10), 2
    )
    b = PITDVP(
        list(cores), ham,
        Config(jobname="r1", thresh_exp=1e-10, krylov_relaxed=True), 2
    )
    for _ in range(2):
        a.propagate(DT)
        b.propagate(DT)
    assert a.expectation() == pytest.approx(b.expectation(), abs=1e-6)
    assert a.norm() == pytest.approx(b.norm(), abs=1e-6)
