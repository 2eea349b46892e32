"""Full IR-spectrum workflow: relax → operate(μ) → propagate → FFT.

The reference chains these through saved wavefunction files
(``/root/reference/pytdscf/simulator_cls.py:577-589``; workflow notebooks
``poly-MPO-H2O-*.ipynb``).  Peak positions are checked against the known
anharmonic fundamentals of the bundled H2O surface (bend ≈ 1612 cm⁻¹,
stretches ≈ 3620/3787 cm⁻¹ at this level, measured with fine resolution).
"""

import math
import os

import numpy as np
import pytest

from pytdscf_tpu import spectra, units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import h2o_k_orig, h2o_mu
from pytdscf_tpu.simulator import Simulator


def test_h2o_ir_spectrum(tmp_path):
    os.chdir(tmp_path)
    prim = [
        [
            PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
            for i in (1, 2, 3)
        ]
    ]
    basinfo = BasInfo(prim)
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=9)

    sim = Simulator("h2o", model, verbose=0)
    e_gs, _ = sim.relax(maxstep=10, stepsize=0.1, improved=True)
    # anharmonic ZPE sits below the harmonic estimate
    harm_zpe = sum(
        math.sqrt(h2o_k_orig[(i, i)]) for i in (1, 2, 3)
    ) / 2
    assert e_gs == pytest.approx(0.0208557166, abs=1.0e-08)
    assert e_gs < harm_zpe

    mu_ham = read_potential_nMR(
        None, dipole_emu=h2o_mu, efield=(1e-2, 1e-2, 1e-2)
    )
    model_mu = Model(basinfo, {"hamiltonian": mu_ham}, bond_dim=9)
    norm, _ = Simulator("h2o", model_mu, verbose=0).operate(
        maxstep=10, restart=True, loadfile_ext="_gs"
    )
    assert norm > 0

    sim3 = Simulator("h2o", model, verbose=0)
    sim3.propagate(
        maxstep=500, stepsize=0.2, restart=True, loadfile_ext="_operate"
    )

    t_fs, ac = spectra.load_autocorr("h2o_prop/autocorr.dat")
    assert t_fs[-1] == pytest.approx(2 * 499 * 0.2, rel=1e-6)  # T/2 trick
    freq, inten = spectra.ifft_autocorr(
        t_fs, ac, E_shift=e_gs * units.au_in_eV
    )
    sel = (freq > 1000) & (freq < 3000)
    bend = freq[sel][np.argmax(inten[sel])]
    assert bend == pytest.approx(1612.0, abs=90.0)
    sel = (freq > 3000) & (freq < 4100)
    stretch = freq[sel][np.argmax(inten[sel])]
    assert stretch == pytest.approx(3787.0, abs=180.0)
