"""Radical-pair SSE ensemble: wavefunction trajectories + coherent sampling.

TPU-native analog of the reference workflow
``docs/notebook/radicalpair-sse.ipynb``: the Hilbert-space radical-pair
H_eff (Zeeman + hyperfine + exchange + dipolar + Haberkorn CAP) is
propagated per trajectory with Arnoldi (non-Hermitian, norm decays), and
the nuclear mixed state is reconstructed by averaging the electron-pair
reduced density over initial nuclear states sampled from SU(2)
spin-coherent states on a Sobol sequence (JCP 154, 084121 (2021)).

Two execution modes:

* default — the whole ensemble advances in ONE scan-compiled shard_map
  program (`parallel.batched.batched_sse_propagate`): trajectories ride a
  batch axis through the MXU (dp-sharded across every available device),
  where the reference loops full simulator runs per trajectory;
* ``--serial`` — one Simulator run per trajectory (same numbers, with the
  full Properties/netCDF export machinery per trajectory).

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


def sobol_samples(n: int, dim: int, seed: int = 7) -> np.ndarray:
    try:
        from scipy.stats import qmc

        return qmc.Sobol(d=dim, scramble=True, seed=seed).random(n)
    except Exception:  # pragma: no cover - scipy always present here
        return np.random.default_rng(seed).random((n, dim))


SINGLET = [0.0, 1 / np.sqrt(2), -1 / np.sqrt(2), 0.0]


def _hartree_products(basis, ele_site, samples):
    hps = []
    for u in samples:
        hp, k = [], 0
        for s, b in enumerate(basis):
            if s == ele_site:
                hp.append(SINGLET)
                continue
            hp.append(
                spin_coherent_weights(b.nstate, u[2 * k], u[2 * k + 1])
            )
            k += 1
        hps.append(hp)
    return hps


def run_batched(args, basis, mpo, ele_site, samples) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.parallel import batched_sse_propagate, make_mesh

    phys = [b.nstate for b in basis]
    model = Model(basis, {"hamiltonian": mpo}, bond_dim=args.bond_dim)
    fused = model.hamiltonian.fused_mpo(phys)[0][0]
    Ws = tuple(jnp.asarray(w, jnp.complex64 if not jax.config.jax_enable_x64
               else jnp.complex128) for w in fused)
    dtype = Ws[0].dtype

    ndev = len(jax.devices())
    ndp = max(d for d in range(1, ndev + 1) if args.ntraj % d == 0)
    mesh = make_mesh({"dp": ndp})
    hps = _hartree_products(basis, ele_site, samples)
    percore = [
        alloc_hartree_product(phys, args.bond_dim, hp) for hp in hps
    ]
    bcores = tuple(
        jnp.asarray(np.stack([t[p] for t in percore]), dtype)
        for p in range(len(phys))
    )
    _, rdms = batched_sse_propagate(
        mesh, bcores, Ws, -0.5j * args.dt_ns, args.maxstep - 1, ele_site
    )
    # row 0 = initial state (the serial path's export convention): the
    # nuclear coherent states are unit-norm, so ρ_e(0) = |S⟩⟨S| exactly
    rho0 = np.outer(SINGLET, np.conj(SINGLET))[None]
    return np.concatenate([rho0, np.asarray(rdms) / args.ntraj])


def run_serial(args, basis, mpo, ele_site, samples) -> np.ndarray:
    from pytdscf_tpu.simulator import Simulator
    from pytdscf_tpu.util import read_nc

    hps = _hartree_products(basis, ele_site, samples)
    acc = None
    for itraj, hp in enumerate(hps):
        model = Model(basis, {"hamiltonian": mpo}, bond_dim=args.bond_dim)
        model.init_HartreeProduct = [[np.asarray(v).tolist() for v in hp]]
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
        print(f"trajectory {itraj + 1}/{len(hps)} done")
    return acc[: args.maxstep] / len(hps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntraj", type=int, default=16)
    ap.add_argument("--maxstep", type=int, default=100)
    ap.add_argument("--dt-ns", type=float, default=0.5)
    ap.add_argument("--bond-dim", type=int, default=32)
    ap.add_argument("--n-nuc", type=int, default=3, help="¹H per radical")
    ap.add_argument(
        "--serial", action="store_true",
        help="one Simulator run per trajectory (default: one batched "
        "shard_map program for the whole ensemble)",
    )
    args = ap.parse_args()

    basis, mpo, ele_site = radical_pair_hamiltonian(
        hfcs_1=[(2, 0.4)] * args.n_nuc,
        hfcs_2=[(2, 0.5)] * args.n_nuc,
    )
    samples = sobol_samples(args.ntraj, 2 * (len(basis) - 1))

    if args.serial:
        rho = run_serial(args, basis, mpo, ele_site, samples)
    else:
        rho = run_batched(args, basis, mpo, ele_site, samples)

    p_singlet = np.einsum(
        "tij,ji->t", rho, np.outer(SINGLET, np.conj(SINGLET))
    ).real
    for t, p in enumerate(p_singlet):
        print(f"step {t:4d}  P_S = {p:.6f}  trace = {np.trace(rho[t]).real:.6f}")


if __name__ == "__main__":
    main()
