"""Liouville subspace projection of operators (reference
``hamiltonian_cls.py:852-879``): restricting physical legs at chosen sites
must equal slicing the fused MPO cores, and a dynamics check — with no
coupling to the projected bath site, the projected MPDO reproduces the full
run's central-site RDM exactly."""

import numpy as np
import pytest

from pytdscf_tpu.basis import Exciton
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator


def _ham(nsite=2, d0=4, d1=9):
    rng = np.random.default_rng(3)
    h1 = rng.normal(size=(d1, d1)) + 1j * rng.normal(size=(d1, d1))
    pot = {
        (1, 1): TensorOperator(mpo=[h1[None, :, :, None]], legs=(1, 1)),
        (0, 0): TensorOperator(
            mpo=[np.eye(d0)[None, :, :, None] * 0.5], legs=(0, 0)
        ),
    }
    return TensorHamiltonian(nsite, [[pot]], kinetic=None)


def test_project_subspace_slices_cores():
    from pytdscf_tpu.operators.mpo_algebra import mpo_to_dense

    ham = _ham()
    full = mpo_to_dense(ham.fused_mpo([4, 9])[0][0])
    ham2 = _ham()
    keep = (0, 3)
    ham2.project_subspace({0: keep})
    proj = mpo_to_dense(ham2.fused_mpo([2, 9])[0][0])
    # dense projection: keep bath indices {0,3} ⊗ all spin indices
    idx = [k * 9 + j for k in keep for j in range(9)]
    np.testing.assert_allclose(proj, full[np.ix_(idx, idx)], atol=1e-12)


def test_projected_dynamics_matches(tmp_path):
    import os

    os.chdir(tmp_path)
    from pytdscf_tpu import units
    from pytdscf_tpu.simulator import Simulator

    # twin-space sites: bath (2² = 4) ⊗ spin (3² = 9); H acts only on spin.
    rng = np.random.default_rng(5)
    h = rng.normal(size=(3, 3))
    h = h + h.T
    h_l = np.kron(h, np.eye(3)) - np.kron(np.eye(3), h.T)
    pot = {
        (1, 1): TensorOperator(mpo=[h_l[None, :, :, None]], legs=(1, 1))
    }

    def run(subspace):
        ham = TensorHamiltonian(2, [[pot]], kinetic=None)
        basis = [Exciton(nstate=4), Exciton(nstate=9)]
        model = Model(
            basis, {"hamiltonian": ham}, space="liouville", bond_dim=4,
            subspace_inds=subspace,
        )
        pini = np.diag([0.2, 0.3, 0.5]).astype(complex)
        bath = (np.eye(2) / 2).reshape(-1)
        if subspace:
            bath = bath[list(subspace[0])]
        model.init_HartreeProduct = [[bath, pini.reshape(-1)]]
        sim = Simulator(f"proj_{bool(subspace)}", model, verbose=0)
        sim.propagate(
            reduced_density=([(1, 1)], 1), maxstep=5,
            stepsize=0.1 * units.au_in_fs, autocorr=False, energy=False,
            norm=False, populations=False, conserve_norm=False,
            integrator="arnoldi",
        )
        import h5py

        from pytdscf_tpu.util.nc4 import as_complex

        with h5py.File(f"proj_{bool(subspace)}_prop/reduced_density.nc") as f:
            return as_complex(np.asarray(f["rho_(1, 1)_0"]))

    full = run(None)
    # bath site restricted to its diagonal Liouville indices |0⟩⟨0|,|1⟩⟨1|
    proj = run({0: (0, 3)})
    # trace-normalise (projected bases renormalise the initial vec)
    f = full[-1] / np.trace(full[-1])
    p = proj[-1] / np.trace(proj[-1])
    np.testing.assert_allclose(p, f, atol=1e-08)
