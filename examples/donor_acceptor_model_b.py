"""Donor–acceptor model B — 13-fragment LE/CS ladder with F/OT baths.

TPU-native analog of the reference workflow
``docs/notebook/donor-acceptor_B.ipynb`` ("example 14"; model B of
Dorfner et al., JCTC 20, 8767 (2024)): a 26-level electronic site
(CS₁₃…CS₁, LE₁…LE₁₃), one reaction mode, 8 fragment bath modes and 8
oligothiophene modes per fragment (114 sites).  Start in |LE₁⟩ ⊗ vacuum,
propagate, and track the per-level electron populations ⟨N̂_k⟩ (the
notebook's heat-map observable) plus the electronic reduced density.

Run:  python examples/donor_acceptor_model_b.py  [--maxstep 1000]
Outputs land in donor_acceptor_b_prop/ (reduced_density.nc,
expectations.dat, ...).
"""

from __future__ import annotations

import argparse

from pytdscf_tpu import Model, Simulator
from pytdscf_tpu.models.donor_acceptor import (
    donor_acceptor_b,
    electron_level_projectors,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxstep", type=int, default=1000)
    ap.add_argument("--stepsize-fs", type=float, default=0.2)
    ap.add_argument("--n-frag", type=int, default=13)
    ap.add_argument("--n-f", type=int, default=8)
    ap.add_argument("--n-ot", type=int, default=8)
    ap.add_argument("--nfock", type=int, default=28)
    ap.add_argument("--bond-dim", type=int, default=20)
    args = ap.parse_args()

    basis, ham = donor_acceptor_b(
        n_frag=args.n_frag, n_f=args.n_f, n_ot=args.n_ot, nfock=args.nfock
    )
    operators = {"hamiltonian": ham}
    operators.update(electron_level_projectors(basis))

    model = Model(basis, operators, bond_dim=args.bond_dim)
    # |LE₁⟩ ⊗ vacuum (level order [CS_N..CS_1, LE_1..LE_N])
    ele0 = [0.0] * args.n_frag + [1.0] + [0.0] * (args.n_frag - 1)
    vac = [1.0] + [0.0] * (args.nfock - 1)
    model.init_HartreeProduct = [[ele0] + [vac] * (len(basis) - 1)]

    sim = Simulator("donor_acceptor_b", model, verbose=2)
    sim.propagate(
        maxstep=args.maxstep,
        stepsize=args.stepsize_fs,
        reduced_density=([(0, 0)], 10),
        energy=True,
        autocorr=False,
        observables=True,
        observables_per_step=10,
    )
    print("done: see donor_acceptor_b_prop/")


if __name__ == "__main__":
    main()
