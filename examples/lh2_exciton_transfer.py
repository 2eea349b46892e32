"""LH2 exciton delocalization — B850/B800 three-ring antenna model.

TPU-native analog of the reference workflow ``docs/notebook/lh2.ipynb``:
9 molecules × (γ, β, α) chromophores with 2 Holstein bath modes each
(81 sites), the B800 γ excitons of the first and last molecule excited,
propagated with adaptive bond dimension while tracking per-chromophore
excited-state populations.

Run:  python examples/lh2_exciton_transfer.py  [--maxstep 100]
Outputs land in lh2_prop/ (expectations.dat, populations ...).
"""

from __future__ import annotations

import argparse

import numpy as np

from pytdscf_tpu import Model, Simulator
from pytdscf_tpu.models.lh2 import lh2_chain, lh2_initial_weights
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxstep", type=int, default=100)
    ap.add_argument("--stepsize-fs", type=float, default=0.2)
    ap.add_argument("--nmol", type=int, default=9)
    ap.add_argument("--nfock", type=int, default=10)
    ap.add_argument("--bond-dim", type=int, default=40)
    args = ap.parse_args()

    basis, ham, site_map = lh2_chain(nmol=args.nmol, nfock=args.nfock)
    nsite = len(basis)

    # per-chromophore excited-state projectors (the notebook's
    # "{i}gamma"/"{i}beta"/"{i}alpha" observables)
    operators = {"hamiltonian": ham}
    proj = np.zeros((1, 2, 2, 1))
    proj[0, 1, 1, 0] = 1.0
    for kind in ("gamma", "beta", "alpha"):
        for imol, s in enumerate(site_map[kind]):
            operators[f"{imol}{kind}"] = TensorHamiltonian(
                ndof=nsite,
                potential=[[{(s, s): TensorOperator(mpo=[proj], legs=(s, s))}]],
                kinetic=None,
            )

    model = Model(basis, operators, bond_dim=args.bond_dim)
    model.init_HartreeProduct = [lh2_initial_weights(basis, site_map)]

    sim = Simulator("lh2", model, verbose=2)
    sim.propagate(
        maxstep=args.maxstep,
        stepsize=args.stepsize_fs,
        energy=True,
        autocorr=False,
        observables=True,
        observables_per_step=10,
        adaptive=True,
        adaptive_Dmax=args.bond_dim,
        adaptive_p_svd=1.0e-20,
        adaptive_p_proj=1.0e-09,
    )
    print("done: see lh2_prop/expectations.dat")


if __name__ == "__main__":
    main()
