"""Example: open-system (Liouville-space MPDO) spin dynamics.

A 3-site spin chain — bath-1/2, central spin-1, bath-1/2 — with Haberkorn
damping and Lindblad dephasing/amplitude damping on the central site,
propagated as a vectorised density matrix with a non-Hermitian Liouvillian
(short-iterative Arnoldi).  The same model family as the reference's
radical-pair Liouville workflow (``docs/notebook/radicalpair-liouville``).

    python examples/radical_pair_mpdo.py
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

from pytdscf_tpu import units
from pytdscf_tpu.basis import Exciton
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.symbolic import (
    AssignManager, OpSite, SumOfProducts, get_eye_site,
)
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util import read_nc

SX = np.array([[0, 1], [1, 0]]) / 2
SY = np.array([[0, -1j], [1j, 0]]) / 2
SZ = np.array([[1, 0], [0, -1]]) / 2
IZ = np.diag([1.0, 0.0, -1.0]) / 2
IP = np.array([[0, math.sqrt(2), 0], [0, 0, math.sqrt(2)], [0, 0, 0]]) / 2
IX, IY = 0.5 * (IP + IP.T), -0.5j * (IP - IP.T)
E2, E3 = np.eye(2), np.eye(3)

J01, J12, B, K_HAB, K_DEPH = 0.8, 0.6, 1.0, 0.05, 2.0


def twin_l(op):
    return np.kron(op, np.eye(op.shape[0]))


def twin_r(op):
    return np.kron(np.eye(op.shape[0]), op.T)


def main() -> None:
    sop = SumOfProducts()
    O = lambda n, s, v: OpSite(n, s, value=v)  # noqa: E731
    for mat in (IX, IY, IZ):
        sop += B * (O(f"L{id(mat)}", 1, twin_l(mat)) - O(f"R{id(mat)}", 1, twin_r(mat)))
    for (J, sa, ma, sb, mb) in (
        (J01, 0, (SX, SY, SZ), 1, (IX, IY, IZ)),
        (J12, 1, (IX, IY, IZ), 2, (SX, SY, SZ)),
    ):
        for A_, B_ in zip(ma, mb):
            sop += J * (
                O(f"l{sa}{id(A_)}", sa, twin_l(A_)) * O(f"l{sb}{id(B_)}", sb, twin_l(B_))
                - O(f"r{sa}{id(A_)}", sa, twin_r(A_)) * O(f"r{sb}{id(B_)}", sb, twin_r(B_))
            )
    sop += (-1.0j * K_HAB) * O("e", 1, np.kron(E3, E3))
    L = IZ * math.sqrt(K_DEPH)
    sop += 1.0j * O("LL", 1, np.kron(L, L.conj()))
    sop += (-0.5j) * O("LLd", 1, np.kron(L.conj().T @ L, E3))
    sop += (-0.5j) * O("dLL", 1, np.kron(E3, L.T @ L.conj()))
    sop += 0.0 * (get_eye_site(0, 4) * get_eye_site(1, 9) * get_eye_site(2, 4))
    am = AssignManager(sop.simplify())
    am.assign()
    mpo = am.numerical_mpo()

    basis = [Exciton(4), Exciton(9), Exciton(4)]
    pini = np.diag([0.0, 0.0, 1.0]).astype(complex)
    model = Model(basis, {"hamiltonian": mpo}, space="liouville", bond_dim=16)
    model.init_HartreeProduct = [
        [E2.reshape(-1), pini.reshape(-1), E2.reshape(-1)]
    ]
    sim = Simulator("radical_pair", model, verbose=0)
    sim.propagate(
        reduced_density=([(1, 1)], 1), maxstep=60,
        stepsize=0.2 * units.au_in_fs, autocorr=False, energy=False,
        norm=False, populations=False, conserve_norm=False,
        integrator="arnoldi",
    )
    rd = read_nc("radical_pair_prop/reduced_density.nc", [(1, 1)])
    rho_t = rd[(1, 1)]
    print("central-spin populations over time (every 10 steps):")
    for k in range(0, 60, 10):
        pops = np.real(np.diag(rho_t[k]))
        print(f"  step {k:3d}: {np.round(pops, 4)}  trace={pops.sum():.4f}")


if __name__ == "__main__":
    main()
