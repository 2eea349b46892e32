"""Pyrazine S2 photoexcitation dynamics — 24-mode QVC model.

TPU-native analog of the reference workflow
``docs/notebook/pyrazine-qvc.ipynb``: propagate the S2 ⊗ vacuum
wavepacket of the 2-state 24-mode quadratic-vibronic-coupling model
(Raab et al., JCP 110, 936 (1999)), export the electronic reduced
density + autocorrelation, and Fourier-transform the autocorrelation
into the UV absorption band.

Run:  python examples/pyrazine_s2_dynamics.py  [--maxstep 1500]
Outputs land in pyrazine_prop/ (reduced_density.nc, autocorr.dat, ...).
"""

from __future__ import annotations

import argparse

import numpy as np

from pytdscf_tpu import Model, Simulator, spectra, units
from pytdscf_tpu.models.pyrazine import pyrazine_qvc, OMEGA_EV


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxstep", type=int, default=1500)
    ap.add_argument("--stepsize-fs", type=float, default=0.1)
    ap.add_argument("--nprim", type=int, default=10)
    ap.add_argument("--bond-dim", type=int, default=20)
    args = ap.parse_args()

    basis, ham = pyrazine_qvc(nprim=args.nprim)
    model = Model(basis, {"hamiltonian": ham}, bond_dim=args.bond_dim)
    # S2 ⊗ vacuum initial state (vertical excitation)
    model.init_HartreeProduct = [
        [[0.0, 1.0]] + [[1.0] + [0.0] * (args.nprim - 1)] * (len(basis) - 1)
    ]

    sim = Simulator("pyrazine", model, verbose=2)
    sim.propagate(
        maxstep=args.maxstep,
        stepsize=args.stepsize_fs,
        reduced_density=([(0, 0)], 10),
        energy=True,
        autocorr=True,
    )

    # S1/S2 populations over time
    from pytdscf_tpu.util import read_nc

    rd = read_nc("pyrazine_prop/reduced_density.nc", [(0, 0)])
    rho = np.asarray(rd[(0, 0)])
    t_fs = np.asarray(rd["time"])
    print("final populations: S1 %.4f  S2 %.4f (t = %.1f fs)"
          % (rho[-1, 0, 0].real, rho[-1, 1, 1].real, t_fs[-1]))

    # absorption band from the autocorrelation function (the notebook's
    # E_0 shift centres the band on the experimental S1/S2 origins)
    time, auto = spectra.load_autocorr("pyrazine_prop/autocorr.dat")
    damp = np.exp(-np.abs(time) / 150.0)
    e0_ev = 0.5 * sum(OMEGA_EV) - (3.94 + 4.89) / 2.0
    freq, intensity = spectra.ifft_autocorr(
        time, auto * damp, E_shift=e0_ev, window="cos"
    )
    mask = freq > 0
    nm = 1.0e7 / freq[mask]
    band = intensity[mask]
    sel = (nm > 220) & (nm < 280)
    if sel.any():
        peak = nm[sel][np.argmax(band[sel])]
        print(f"absorption maximum in the 220-280 nm window: {peak:.1f} nm")
    spectra.export_spectrum(freq, intensity, "pyrazine_prop/spectrum.dat")


if __name__ == "__main__":
    main()
