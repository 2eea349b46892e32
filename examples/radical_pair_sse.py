"""Radical-pair SSE ensemble: wavefunction trajectories + coherent sampling.

TPU-native analog of the reference workflow
``docs/notebook/radicalpair-sse.ipynb``: the Hilbert-space radical-pair
H_eff (Zeeman + hyperfine + exchange + dipolar + Haberkorn CAP) is
propagated per trajectory with Arnoldi (non-Hermitian, norm decays), and
the nuclear mixed state is reconstructed by averaging the electron-pair
reduced density over initial nuclear states sampled from SU(2)
spin-coherent states on a Sobol sequence (JCP 154, 084121 (2021)).

Run:  python examples/radical_pair_sse.py  [--ntraj 16]
Prints the ensemble-averaged singlet population per step.
"""

from __future__ import annotations

import argparse

import numpy as np

from pytdscf_tpu import units
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.radical_pair import (
    radical_pair_hamiltonian,
    spin_coherent_weights,
)
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util import read_nc


def sobol_samples(n: int, dim: int, seed: int = 7) -> np.ndarray:
    try:
        from scipy.stats import qmc

        return qmc.Sobol(d=dim, scramble=True, seed=seed).random(n)
    except Exception:  # pragma: no cover - scipy always present here
        return np.random.default_rng(seed).random((n, dim))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntraj", type=int, default=16)
    ap.add_argument("--maxstep", type=int, default=100)
    ap.add_argument("--dt-ns", type=float, default=0.5)
    ap.add_argument("--bond-dim", type=int, default=32)
    ap.add_argument("--n-nuc", type=int, default=3, help="¹H per radical")
    args = ap.parse_args()

    basis, mpo, ele_site = radical_pair_hamiltonian(
        hfcs_1=[(2, 0.4)] * args.n_nuc,
        hfcs_2=[(2, 0.5)] * args.n_nuc,
    )
    nsite = len(basis)
    singlet = [0.0, 1 / np.sqrt(2), -1 / np.sqrt(2), 0.0]

    samples = sobol_samples(args.ntraj, 2 * (nsite - 1))
    acc = None
    for itraj, u in enumerate(samples):
        hp, k = [], 0
        for s in range(nsite):
            if s == ele_site:
                hp.append(singlet)
                continue
            w = spin_coherent_weights(basis[s].nstate, u[2 * k], u[2 * k + 1])
            hp.append(w.tolist())
            k += 1
        model = Model(basis, {"hamiltonian": mpo}, bond_dim=args.bond_dim)
        model.init_HartreeProduct = [hp]
        sim = Simulator(f"rp_sse_{itraj}", model, verbose=0)
        sim.propagate(
            reduced_density=([(ele_site, ele_site)], 1),
            maxstep=args.maxstep,
            stepsize=args.dt_ns * units.au_in_fs,  # scale=1e-9 ⇒ dt in ns
            autocorr=False, energy=False, norm=False, populations=False,
            conserve_norm=False, integrator="arnoldi",
        )
        rd = read_nc(
            f"rp_sse_{itraj}_prop/reduced_density.nc",
            [(ele_site, ele_site)],
        )[(ele_site, ele_site)]
        acc = np.asarray(rd) if acc is None else acc + np.asarray(rd)
        print(f"trajectory {itraj + 1}/{args.ntraj} done")

    rho = acc / args.ntraj  # (steps, 4, 4) electron-pair ensemble RDM
    p_singlet = np.einsum(
        "tij,ji->t",
        rho,
        np.outer(singlet, np.conj(singlet)),
    ).real
    for t, p in enumerate(p_singlet):
        print(f"step {t:4d}  P_S = {p:.6f}  trace = {np.trace(rho[t]).real:.6f}")


if __name__ == "__main__":
    main()
