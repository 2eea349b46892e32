"""Example: H2O IR spectrum via relax → operate(μ) → propagate → FFT.

Mirrors the reference's ``poly-MPO-H2O-*`` notebook workflow on the bundled
3-mode quartic H2O surface.  Runs in ~1 minute on CPU.

    python examples/h2o_ir_spectrum.py
"""

import os

import jax

# parity-precision (complex128) workflow — run on CPU unless the user
# explicitly overrides PYTDSCF_PLATFORM (the ambient JAX_PLATFORMS of the
# environment may point at a TPU without complex128 support)
jax.config.update(
    "jax_platforms", os.environ.get("PYTDSCF_PLATFORM", "cpu")
)

import math

import numpy as np

from pytdscf_tpu import spectra, units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import h2o_k_orig, h2o_mu
from pytdscf_tpu.simulator import Simulator


def main() -> None:
    prim = [
        [
            PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
            for i in (1, 2, 3)
        ]
    ]
    basinfo = BasInfo(prim)
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=9)

    print("1/3 improved relaxation to the ground state …")
    e_gs, _ = Simulator("h2o", model, verbose=0).relax(
        maxstep=10, stepsize=0.1, improved=True
    )
    print(f"    E_gs = {e_gs:.10f} Eh")

    print("2/3 apply the dipole operator μ·E …")
    mu_ham = read_potential_nMR(
        None, dipole_emu=h2o_mu, efield=(1e-2, 1e-2, 1e-2)
    )
    model_mu = Model(basinfo, {"hamiltonian": mu_ham}, bond_dim=9)
    norm, _ = Simulator("h2o", model_mu, verbose=0).operate(
        maxstep=10, restart=True, loadfile_ext="_gs"
    )
    print(f"    |μ|0⟩| = {norm:.8f}")

    print("3/3 real-time propagation (500 × 0.2 fs) …")
    Simulator("h2o", model, verbose=0).propagate(
        maxstep=500, stepsize=0.2, restart=True, loadfile_ext="_operate"
    )

    t_fs, ac = spectra.load_autocorr("h2o_prop/autocorr.dat")
    freq, inten = spectra.ifft_autocorr(
        t_fs, ac, E_shift=e_gs * units.au_in_eV
    )
    spectra.export_spectrum(freq, inten, "h2o_spectrum.dat")
    spectra.plot_spectrum(
        freq, inten, 1000, 4200, gui=False, filename="h2o_spectrum.png"
    )
    sel = (freq > 1000) & (freq < 4200)
    top = np.argsort(inten[sel])[-3:]
    print("    strongest lines [cm^-1]:", np.sort(freq[sel][top]).round(1))
    print("    wrote h2o_spectrum.dat / h2o_spectrum.png")


if __name__ == "__main__":
    main()
