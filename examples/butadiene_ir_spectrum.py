"""Example: trans-butadiene (C4H6) IR spectrum from the bundled local-mode
polyene tables — relax → operate(μ) → propagate → FFT.

Uses the 14-active-mode local-mode quartic PES and dipole surface the
reference ships for its polyene example workflows
(``/root/reference/pytdscf/potentials/c4h6_local_potential.py`` /
``c4h6_local_dipole.py``).  Runs in a few minutes on CPU; scale the chain
up with the c6h8…c14h16 tables (``pytdscf_tpu.potentials.load``).

    python examples/butadiene_ir_spectrum.py
"""

import os

import jax

jax.config.update(
    "jax_platforms", os.environ.get("PYTDSCF_PLATFORM", "cpu")
)

import math

import numpy as np

from pytdscf_tpu import spectra, units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import load
from pytdscf_tpu.simulator import Simulator


def main() -> None:
    k_orig = load("c4h6_local_potential")["k_orig"]
    mu = load("c4h6_local_dipole")["mu"]
    modes = sorted({i for key in k_orig for i in key})
    print(f"C4H6 local-mode surface: {len(modes)} active modes {modes}")

    prim = [[
        PrimBas_HO(0.0, math.sqrt(k_orig[(m, m)]) * units.au_in_cm1, 6)
        for m in modes
    ]]
    basinfo = BasInfo(prim)
    ham = read_potential_nMR(k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=12)

    print("1/3 improved relaxation to the ground state …")
    e_gs, _ = Simulator("c4h6", model, verbose=0).relax(
        maxstep=8, stepsize=0.1, improved=True
    )
    print(f"    E_gs = {e_gs:.10f} Eh")

    print("2/3 apply the dipole operator μ·E …")
    mu_ham = read_potential_nMR(
        None, dipole_emu=mu, efield=(1e-2, 1e-2, 1e-2),
        active_modes=modes,
    )
    model_mu = Model(basinfo, {"hamiltonian": mu_ham}, bond_dim=12)
    norm, _ = Simulator("c4h6", model_mu, verbose=0).operate(
        maxstep=10, restart=True, loadfile_ext="_gs"
    )
    print(f"    |μ|0⟩| = {norm:.8f}")

    print("3/3 real-time propagation (400 × 0.2 fs) …")
    Simulator("c4h6", model, verbose=0).propagate(
        maxstep=400, stepsize=0.2, restart=True, loadfile_ext="_operate"
    )

    t_fs, ac = spectra.load_autocorr("c4h6_prop/autocorr.dat")
    freq, inten = spectra.ifft_autocorr(
        t_fs, ac, E_shift=e_gs * units.au_in_eV
    )
    spectra.export_spectrum(freq, inten, "c4h6_spectrum.dat")
    sel = (freq > 600) & (freq < 3500)
    top = np.argsort(inten[sel])[-5:]
    print("    strongest lines [cm^-1]:", np.sort(freq[sel][top]).round(1))
    print("    wrote c4h6_spectrum.dat")


if __name__ == "__main__":
    main()
