"""Grid-PES database pipeline: DVR_Mesh → multiproc calc → db → nMR MPO.

Covers the reference's db-based workflow
(``/root/reference/tests/test_anharmonic_dvr_db_nmr_mpssm_propagate_jax.py``):
instead of shipping a pre-computed database, the "ab initio" calculator here
is an analytic anharmonic 2-mode potential evaluated by the parallel job
runner, so inclusion–exclusion nMR separation is exercised end-to-end and
the resulting dynamics must agree with the direct func-path MPO.
"""

import math

import numpy as np
import pytest

from pytdscf_tpu import units
from pytdscf_tpu.ase_handler import DVR_Mesh
from pytdscf_tpu.basis import HarmonicOscillator
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.dvr import (
    construct_kinetic_mpo,
    construct_nMR_recursive,
    database_to_dataframe,
)
from pytdscf_tpu.simulator import Simulator

W1 = 1500.0 / units.au_in_cm1
W2 = 3000.0 / units.au_in_cm1
CUB = 1.0e-06


def potential(q):
    """Total anharmonic PES at mass-weighted displacement q = (q1, q2)."""
    q1, q2 = q
    return (
        W1**2 / 2 * q1**2
        + W2**2 / 2 * q2**2
        + CUB * (q1**3 + q1 * q2**2 + q1**2 * q2)
    )


def run(model, jobname, tmp_path):
    import os

    os.chdir(tmp_path)
    sim = Simulator(jobname=jobname, model=model, verbose=0)
    energy, _ = sim.propagate(maxstep=2, stepsize=0.1)
    return energy


def test_db_nmr_matches_func_path(tmp_path):
    prims = [
        HarmonicOscillator(5, 1500.0),
        HarmonicOscillator(5, 3000.0),
    ]
    db = str(tmp_path / "pes.db")
    mesh = DVR_Mesh(prims)
    n_saved = mesh.save_geoms(db, nMR=2)
    assert n_saved == 5 * 5  # full 2-mode product mesh (zero point shared)

    ndone = mesh.execute_multiproc(potential, db, max_workers=2, timeout=60)
    assert ndone == n_saved

    df = database_to_dataframe(db)
    assert len(df) == n_saved
    assert df["distance"].max() == 2

    # db path (raw totals, inclusion-exclusion applied internally)
    pot_db = construct_nMR_recursive(prims, nMR=2, db=db)

    # func path (components given analytically)
    funcs = {
        (0,): lambda q1: W1**2 / 2 * q1**2 + CUB * q1**3,
        (1,): lambda q2: W2**2 / 2 * q2**2,
        (0, 1): lambda q1, q2: CUB * (q1 * q2**2 + q1**2 * q2),
    }
    pot_func = construct_nMR_recursive(prims, nMR=2, func=funcs)

    # The two MPOs must represent the same grid tensor.
    def mpo_diag_tensor(cores):
        t = cores[0][0]  # (n, b)
        t = np.einsum("ia,ajb->ijb", t, cores[1])[:, :, 0]
        return t

    t_db = mpo_diag_tensor(pot_db)
    t_func = mpo_diag_tensor(pot_func)
    np.testing.assert_allclose(t_db, t_func, atol=1.0e-10)

    kin = construct_kinetic_mpo(prims)
    gs = [1.0, 0.0, 0.0, 0.0, 0.0]
    es = [0.0, 1.0, 0.0, 0.0, 0.0]

    model_db = Model(prims, {"potential": pot_db, "kinetic": kin}, bond_dim=4)
    model_db.init_weight_VIBSTATE = [[es, gs]]
    e_db = run(model_db, "nmr_db", tmp_path)

    model_f = Model(prims, {"potential": pot_func, "kinetic": kin}, bond_dim=4)
    model_f.init_weight_VIBSTATE = [[es, gs]]
    e_func = run(model_f, "nmr_func", tmp_path)

    assert e_db == pytest.approx(e_func, abs=1.0e-10)
    # harmonic estimate: E ≈ 3ω1/2 + ω2/2 plus anharmonic shift
    assert e_db == pytest.approx(1.5 * W1 + 0.5 * W2, rel=5.0e-02)
