"""Batched (dp-sharded) SSE trajectory ensembles.

TPU-native replacement for the reference SSE workflow's serial
trajectory loop (``/root/reference/docs/notebook/radicalpair-sse.ipynb``):
the whole ensemble advances in one scan-compiled shard_map program
(`parallel.batched.batched_sse_propagate`).  Dense references are built
independently of the SOP/MPO route.
"""

import numpy as np
from scipy.linalg import expm

import jax
import jax.numpy as jnp

from pytdscf_tpu.model import Model
from pytdscf_tpu.models.radical_pair import (
    radical_pair_hamiltonian,
    spin_coherent_weights,
)
from pytdscf_tpu.mps import functional as F
from pytdscf_tpu.mps.lattice import alloc_hartree_product
from pytdscf_tpu.parallel import batched_sse_propagate, make_mesh

from tests.test_radical_pair_sse import _dense_h, B0, J, D0, KS, KT, SCALE

DT = 5.0  # ns
NSTEP = 6
SINGLET = np.array([0.0, 1 / np.sqrt(2), -1 / np.sqrt(2), 0.0])


def _fused_and_basis(hfcs_1, hfcs_2):
    basis, mpo, ele_site = radical_pair_hamiltonian(
        hfcs_1=hfcs_1, hfcs_2=hfcs_2, B0=B0, J=J, D0=D0, kS=KS, kT=KT,
        scale=SCALE,
    )
    model = Model(basis, {"hamiltonian": mpo}, bond_dim=4)
    phys = [b.nstate for b in basis]
    fused = model.hamiltonian.fused_mpo(phys)[0][0]
    return basis, phys, fused, ele_site


def _stack_trajectories(phys, bond_dim, hartree_products):
    percore = [
        alloc_hartree_product(phys, bond_dim, hp)
        for hp in hartree_products
    ]
    return tuple(
        jnp.asarray(np.stack([t[p] for t in percore]))
        for p in range(len(phys))
    )


def test_site_rdm_and_norm_sq_direct():
    """functional.site_rdm / norm_sq vs direct dense contraction of a
    random (non-canonical, non-normalised) 3-site MPS."""
    rng = np.random.default_rng(3)
    dims = [2, 4, 3]
    cores = [
        rng.normal(size=(1, dims[0], 2)) + 1j * rng.normal(size=(1, dims[0], 2)),
        rng.normal(size=(2, dims[1], 2)) + 1j * rng.normal(size=(2, dims[1], 2)),
        rng.normal(size=(2, dims[2], 1)) + 1j * rng.normal(size=(2, dims[2], 1)),
    ]
    psi = np.einsum("anb,bmc,ckd->nmk", *cores).ravel()
    jcores = tuple(jnp.asarray(c) for c in cores)
    np.testing.assert_allclose(
        float(F.norm_sq(jcores)), np.vdot(psi, psi).real, rtol=1e-12
    )
    full = np.outer(psi, psi.conj()).reshape(2, 4 * 3, 2, 4 * 3)
    want1 = np.einsum("maka->mk", full.reshape(2, 12, 2, 12))
    got1 = np.asarray(F.site_rdm(jcores, 0))
    np.testing.assert_allclose(got1, want1, atol=1e-12)
    full2 = np.outer(psi, psi.conj()).reshape(2, 4, 3, 2, 4, 3)
    want2 = np.einsum("ambanb->mn", full2)
    got2 = np.asarray(F.site_rdm(jcores, 1))
    np.testing.assert_allclose(got2, want2, atol=1e-12)


def test_sse_ensemble_matches_dense():
    """2 projection trajectories batched over a dp=2 mesh == dense
    evolution of ρ₀ = 1/2 ⊗ |S⟩⟨S| under the non-Hermitian H_eff."""
    basis, phys, fused, ele_site = _fused_and_basis([(2, 0.4)], [])
    assert ele_site == 1 and phys == [2, 4]

    H = _dense_h()
    U = expm(-1.0j * H * DT)
    rho = np.kron(np.eye(2) / 2, np.outer(SINGLET, SINGLET.conj()))
    want = []
    for _ in range(NSTEP):
        rho = U @ rho @ U.conj().T
        want.append(np.einsum("abad->bd", rho.reshape(2, 4, 2, 4)))
    want = np.array(want)

    bcores = _stack_trajectories(
        phys, 4,
        [[[1.0, 0.0], SINGLET], [[0.0, 1.0], SINGLET]],
    )
    Ws = tuple(jnp.asarray(w) for w in fused)
    mesh = make_mesh({"dp": 2}, devices=jax.devices()[:2])
    new_b, rdms = batched_sse_propagate(
        mesh, bcores, Ws, -0.5j * DT, NSTEP, ele_site, thresh=1e-10,
    )
    got = np.asarray(rdms) / 2.0
    np.testing.assert_allclose(got, want, atol=1e-7)
    # CAP physics: ensemble survival probability decays
    assert np.trace(got[-1]).real < np.trace(got[0]).real < 1.0


def test_sse_ensemble_sharding_invariance():
    """8 coherent-state trajectories on dp=8 == the same batch on dp=1
    (sharding must not change the math) and == per-trajectory serial
    functional steps."""
    basis, phys, fused, ele_site = _fused_and_basis(
        [(2, 0.4)], [(3, 0.5)]
    )
    rng = np.random.default_rng(11)
    hps = []
    for _ in range(8):
        hp = []
        for s, b in enumerate(basis):
            if s == ele_site:
                hp.append(SINGLET)
            else:
                hp.append(
                    spin_coherent_weights(b.nstate, rng.random(), rng.random())
                )
        hps.append(hp)
    bcores = _stack_trajectories(phys, 4, hps)
    Ws = tuple(jnp.asarray(w) for w in fused)
    nstep = 3

    mesh8 = make_mesh({"dp": 8})
    _, rdms8 = batched_sse_propagate(
        mesh8, bcores, Ws, -0.5j * DT, nstep, ele_site, thresh=1e-10
    )
    mesh1 = make_mesh({"dp": 1}, devices=jax.devices()[:1])
    _, rdms1 = batched_sse_propagate(
        mesh1, bcores, Ws, -0.5j * DT, nstep, ele_site, thresh=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(rdms8), np.asarray(rdms1), atol=1e-10
    )

    # serial reference: one trajectory at a time through the same
    # functional step
    acc = np.zeros((nstep, 4, 4), dtype=complex)
    for itraj in range(8):
        cores = tuple(c[itraj] for c in bcores)
        for t in range(nstep):
            cores = F.tdvp_step(
                cores, Ws, -0.5j * DT, thresh=1e-10,
                conserve_norm=False, arnoldi=True,
            )
            acc[t] += np.asarray(F.site_rdm(cores, ele_site))
    np.testing.assert_allclose(np.asarray(rdms8), acc, atol=1e-9)
