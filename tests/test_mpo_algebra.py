"""Unit tests: MPO fusion algebra against dense reference arithmetic."""

import numpy as np

from pytdscf_tpu.operators import mpo_algebra as alg
from pytdscf_tpu.operators.tensor_op import TensorOperator


def _random_mpo(rng, phys, bonds):
    cores = []
    for i, n in enumerate(phys):
        a, b = bonds[i], bonds[i + 1]
        cores.append(
            rng.normal(size=(a, n, n, b)) + 1j * rng.normal(size=(a, n, n, b))
        )
    return cores


def test_direct_sum_matches_dense():
    rng = np.random.default_rng(1)
    phys = [3, 4, 2]
    a = _random_mpo(rng, phys, [1, 2, 3, 1])
    b = _random_mpo(rng, phys, [1, 3, 2, 1])
    dense = alg.mpo_to_dense(a) + alg.mpo_to_dense(b)
    summed = alg.mpo_direct_sum(a, b)
    np.testing.assert_allclose(alg.mpo_to_dense(summed), dense, atol=1e-12)


def test_compress_preserves_operator():
    rng = np.random.default_rng(2)
    phys = [3, 3, 3]
    mpos = [_random_mpo(rng, phys, [1, 2, 2, 1]) for _ in range(5)]
    dense = sum(alg.mpo_to_dense(m) for m in mpos)
    fused = alg.mpo_sum(mpos)
    np.testing.assert_allclose(alg.mpo_to_dense(fused), dense, atol=1e-10)
    # Summing the same MPO five times must not grow the bond dimension.
    same = alg.mpo_sum([mpos[0]] * 5)
    assert max(alg.mpo_bond_dims(same)) <= max(alg.mpo_bond_dims(mpos[0]))
    np.testing.assert_allclose(
        alg.mpo_to_dense(same), 5 * alg.mpo_to_dense(mpos[0]), atol=1e-10
    )


def test_extend_to_full_chain_identity_gaps():
    rng = np.random.default_rng(3)
    phys = [2, 3, 2, 3]
    # Term acting on sites 0 and 2 only (gap at 1, outside at 3).
    w0 = rng.normal(size=(1, 2, 2, 2))
    w2 = rng.normal(size=(2, 2, 2, 1))
    full = alg.extend_to_full_chain({0: w0, 2: w2}, 4, phys)
    assert len(full) == 4
    dense = alg.mpo_to_dense(full)
    # Expected operator: W0 ⊗ I ⊗ W2 ⊗ I with the MPO bond contracted.
    w_contr = np.einsum("aijb,bklc->ikjl", w0, w2)  # (i0, k2, j0, l2)
    full_dense = np.einsum(
        "ikjl,mn,pq->imkpjnlq", w_contr, np.eye(3), np.eye(3)
    ).reshape(36, 36)
    np.testing.assert_allclose(dense, full_dense, atol=1e-12)


def test_tensor_operator_decompose_roundtrip():
    rng = np.random.default_rng(4)
    # Diagonal grid tensor over 3 DOFs.
    tensor = rng.normal(size=(4, 5, 3))
    top = TensorOperator(tensor=tensor, only_diag=True, legs=(0, 1, 2))
    cores = top.decompose()
    recon = np.einsum("aib,bjc,ckd->ijk", *cores)
    np.testing.assert_allclose(recon, tensor, atol=1e-12)


def test_interaction_picture():
    """H ← U†HU with site-local unitaries equals the dense sandwich."""
    import numpy as np
    from scipy.stats import ortho_group

    from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
    from pytdscf_tpu.operators.mpo_algebra import mpo_to_dense
    from pytdscf_tpu.operators.tensor_op import TensorOperator

    rng = np.random.default_rng(2)
    n = 3
    h1 = rng.normal(size=(n, n)); h1 = h1 + h1.T
    h2 = rng.normal(size=(n, n)); h2 = h2 + h2.T
    pot = {
        (0, 0): TensorOperator(mpo=[h1[None, :, :, None]], legs=(0, 0)),
        (0, 0, 1, 1): TensorOperator(
            mpo=[h2[None, :, :, None], h2[None, :, :, None]],
            legs=(0, 0, 1, 1),
        ),
    }
    ham = TensorHamiltonian(2, [[pot]], kinetic=None)
    dense_before = mpo_to_dense(ham.fused_mpo([n, n])[0][0])

    u0 = ortho_group.rvs(n, random_state=1)
    u1 = ortho_group.rvs(n, random_state=2)
    upot = {
        (0, 0): TensorOperator(mpo=[u0[None, :, :, None]], legs=(0, 0)),
        (1, 1): TensorOperator(mpo=[u1[None, :, :, None]], legs=(1, 1)),
    }
    U = TensorHamiltonian(2, [[upot]], kinetic=None)
    ham.interaction_picture(U)
    dense_after = mpo_to_dense(ham.fused_mpo([n, n])[0][0])
    big_u = np.kron(u0, u1)
    np.testing.assert_allclose(
        dense_after, big_u.conj().T @ dense_before @ big_u, atol=1e-12
    )
