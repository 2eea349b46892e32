"""Time-dependent Hamiltonian (Rabi drive) vs the analytic solution.

Reference analog: ``build_td_hamiltonian`` / ``doTDHamil`` support
(``/root/reference/pytdscf/model_cls.py``, ``_const_cls.py:doTDHamil``).
"""

import math
import os

import numpy as np
import pytest

from pytdscf_tpu import units
from pytdscf_tpu.basis import Exciton
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util import read_nc

OMEGA0 = 1.0   # level splitting [a.u.]
RABI = 0.02    # drive amplitude


def _ham_at(t: float) -> TensorHamiltonian:
    sz = np.diag([0.0, OMEGA0])
    sx = np.array([[0, 1], [1, 0]], float)
    h = sz + 2 * RABI * math.cos(OMEGA0 * t) * sx
    # two sites so the sweep machinery is exercised; site 1 is a spectator
    pot = {
        (0, 0): TensorOperator(mpo=[h[None, :, :, None]], legs=(0, 0)),
        (1, 1): TensorOperator(
            mpo=[np.zeros((2, 2))[None, :, :, None]], legs=(1, 1)
        ),
    }
    return TensorHamiltonian(2, [[pot]], kinetic=None)


def test_rabi_drive(tmp_path):
    os.chdir(tmp_path)
    basis = [Exciton(2), Exciton(2)]
    model = Model(
        basis, {"hamiltonian": _ham_at(0.0)},
        bond_dim=2, build_td_hamiltonian=_ham_at,
    )
    model.init_HartreeProduct = [[[1, 0], [1, 0]]]
    dt = 0.5  # a.u.
    nstep = 120
    sim = Simulator("rabi", model, verbose=0)
    sim.propagate(
        maxstep=nstep, stepsize=dt * units.au_in_fs,
        reduced_density=([(0, 0)], 1), autocorr=False,
        energy=False, norm=False, populations=False,
    )
    rd = read_nc("rabi_prop/reduced_density.nc", [(0, 0)])[(0, 0)]
    p1 = rd[:, 1, 1].real
    t = np.arange(nstep) * dt
    # RWA: P1(t) = sin²(Ω t / 2) with Ω = RABI·... (drive 2A cos → Rabi A)
    expected = np.sin(RABI * t / 1.0) ** 2
    # counter-rotating corrections are O(A/ω0) = 2% — loose envelope check
    assert np.max(np.abs(p1 - expected)) < 0.08
    # population actually oscillates up beyond 30%
    assert p1.max() > 0.3
