"""Donor–acceptor exciton dissociation — LE/CS LVC model with a 99-mode bath.

TPU-native analog of the reference workflow
``docs/notebook/donor-acceptor.ipynb`` (model A of Dorfner et al.,
JCTC 20, 8767 (2024)): start in |LE⟩ ⊗ vacuum, propagate the 101-site
chain, and track the LE population (electronic reduced density) plus the
per-mode boson occupations ⟨N̂_i⟩.

Run:  python examples/donor_acceptor_relaxation.py  [--maxstep 1000]
Outputs land in donor_acceptor_prop/ (reduced_density.nc,
expectations.dat, ...).
"""

from __future__ import annotations

import argparse

from pytdscf_tpu import Model, Simulator
from pytdscf_tpu.models.donor_acceptor import (
    donor_acceptor,
    mode_number_operators,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxstep", type=int, default=1000)
    ap.add_argument("--stepsize-fs", type=float, default=0.2)
    ap.add_argument("--n-bath", type=int, default=None)
    ap.add_argument("--nfock", type=int, default=28)
    ap.add_argument("--bond-dim", type=int, default=20)
    args = ap.parse_args()

    basis, ham = donor_acceptor(n_bath=args.n_bath, nfock=args.nfock)
    operators = {"hamiltonian": ham}
    operators.update(mode_number_operators(basis))

    model = Model(basis, operators, bond_dim=args.bond_dim)
    vac = [1.0] + [0.0] * (args.nfock - 1)
    model.init_HartreeProduct = [
        [[1.0, 0.0]] + [vac] * (len(basis) - 1)  # |LE⟩ ⊗ vacuum
    ]

    sim = Simulator("donor_acceptor", model, verbose=2)
    sim.propagate(
        maxstep=args.maxstep,
        stepsize=args.stepsize_fs,
        reduced_density=([(0, 0)], 10),
        energy=True,
        autocorr=False,
        observables=True,
        observables_per_step=10,
    )
    print("done: see donor_acceptor_prop/")


if __name__ == "__main__":
    main()
