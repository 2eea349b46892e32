"""Full-dimensional grid-PES improved relaxation regression.

Exercises ``construct_fulldimensional`` (dense diagonal grid tensor over
ALL DOFs → TensorOperator → MPO) end-to-end through ``Simulator.relax``.
Mirrors the reference's harmonic 3-mode DVR test with its exact energy
literal — the analytic ZPE (1500+2000+2500)/2 cm⁻¹
(``/root/reference/tests/test_harmonic_dvr_func_full_mpssm_jax.py:17-57``).
"""

import os

import pytest

from pytdscf_tpu import units
from pytdscf_tpu.basis import HarmonicOscillator
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.dvr import (
    construct_fulldimensional,
    construct_kinetic_mpo,
)
from pytdscf_tpu.simulator import Simulator

ZPE_REF = 0.013669005758739458  # reference literal (= 3000 cm⁻¹)


def test_harmonic_fulldimensional_relax(tmp_path):
    prims = [
        HarmonicOscillator(5, 1500, 0.0),
        HarmonicOscillator(5, 2000, 0.0),
        HarmonicOscillator(5, 2500, 0.0),
    ]

    def pes(q1, q2, q3):
        return (
            (1500 / units.au_in_cm1) ** 2 / 2 * q1**2
            + (2000 / units.au_in_cm1) ** 2 / 2 * q2**2
            + (2500 / units.au_in_cm1) ** 2 / 2 * q3**2
        )

    pot = construct_fulldimensional(dvr_prims=prims, func=pes)
    kin = construct_kinetic_mpo(prims)
    model = Model(prims, {"potential": pot, "kinetic": kin}, bond_dim=4)

    os.chdir(tmp_path)
    sim = Simulator(jobname="harmonic_fulldim", model=model, verbose=0)
    energy, _ = sim.relax(maxstep=3, stepsize=0.1)
    assert energy == pytest.approx(ZPE_REF, abs=1e-9)
