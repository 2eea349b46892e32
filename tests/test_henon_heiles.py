"""Henon–Heiles nMR-MPO propagation regression.

End-to-end exercise of the grid machinery: DVR HO primitives →
``construct_nMR_recursive`` (2-mode nMR from analytic component functions) →
kinetic MPO → Model → 3-step TDVP propagation.  Energy literals are the
reference's exact CI values (``/root/reference/tests/test_henon_heiles.py:18-24``).
"""

import pytest

from pytdscf_tpu import units
from pytdscf_tpu.basis import HarmonicOscillator
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.dvr import (
    construct_kinetic_mpo,
    construct_nMR_recursive,
)
from pytdscf_tpu.simulator import Simulator


@pytest.mark.parametrize(
    "omega_cm1, lam, f, ngrid, bond, dt_fs, ener",
    [
        (4000, 1.0e-05, 1, 5, 4, 0.01, 0.027338011517478895),
        (2000, 1.0e-03, 2, 5, 4, 0.001, 0.018225341011652626),
    ],
)
def test_henon_heiles(omega_cm1, lam, f, ngrid, bond, dt_fs, ener, tmp_path):
    prims = [HarmonicOscillator(ngrid, omega_cm1) for _ in range(f)]
    w = omega_cm1 / units.au_in_cm1

    # Mass-weighted Henon–Heiles nMR components:
    # V = Σ w²Qᵢ²/2 + λ w^{3/2} (Σ Qᵢ²Qᵢ₊₁ − Qᵢ₊₁³/3)
    def v_edge0(q1, w=w):
        return w**2 / 2 * q1**2

    def v_last(q, w=w, lam=lam):
        return w**2 / 2 * q**2 - lam * w**1.5 / 3 * q**3

    def v_pair(qa, qb, w=w, lam=lam):
        return lam * w**1.5 * qa**2 * qb

    funcs = {}
    for i in range(f):
        if i == 0:
            funcs[(0,)] = v_edge0
            if f > 1:
                funcs[(0, 1)] = v_pair
        elif i == f - 1:
            funcs[(i,)] = v_last
        else:
            funcs[(i,)] = v_last
            funcs[(i, i + 1)] = v_pair

    pot = construct_nMR_recursive(
        prims, nMR=2, func=funcs, rate=0.99999999999
    )
    kin = construct_kinetic_mpo(prims)
    model = Model(
        prims, {"potential": pot, "kinetic": kin}, bond_dim=bond
    )
    gs = [1.0] + [0.0] * (ngrid - 1)
    es = [0.0, 1.0] + [0.0] * (ngrid - 2)
    model.init_weight_VIBSTATE = [[es] + [gs] * (f - 1)]

    import os

    os.chdir(tmp_path)
    sim = Simulator(jobname="henon_heiles", model=model, verbose=0)
    energy, wf = sim.propagate(maxstep=3, stepsize=dt_fs)
    assert pytest.approx(energy) == ener
