"""Unit tests: gauge moves preserve the state and yield canonical tensors.

Mirrors the assertion style of the reference ``tests/test_gauge.py``.
"""

import jax.numpy as jnp
import numpy as np

from pytdscf_tpu.mps import kernels as K
from pytdscf_tpu.mps.lattice import alloc_hartree_product, right_canonicalize


def _contract_all(cores):
    full = np.asarray(cores[0])
    for c in cores[1:]:
        full = np.einsum("...a,anb->...nb", full, np.asarray(c))
    return full.squeeze()


def test_qr_right_canonical_and_invariant():
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.normal(size=(3, 4, 2)) + 1j * rng.normal(size=(3, 4, 2)))
    a, s = K.qr_right(psi)
    # A is left-orthogonal: Σ_{l,n} A*(l,n,r) A(l,n,r') = δ.
    gram = jnp.einsum("lnr,lns->rs", a.conj(), a)
    np.testing.assert_allclose(np.asarray(gram), np.eye(a.shape[2]), atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("lnk,kr->lnr", a, s)), np.asarray(psi), atol=1e-13
    )


def test_lq_left_canonical_and_invariant():
    rng = np.random.default_rng(1)
    psi = jnp.asarray(rng.normal(size=(2, 4, 3)) + 1j * rng.normal(size=(2, 4, 3)))
    s, b = K.lq_left(psi)
    gram = jnp.einsum("lnr,knr->lk", b.conj(), b)
    np.testing.assert_allclose(np.asarray(gram), np.eye(b.shape[0]), atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("lk,knr->lnr", s, b)), np.asarray(psi), atol=1e-13
    )


def test_right_canonicalize_preserves_state():
    rng = np.random.default_rng(2)
    cores = [
        rng.normal(size=(1, 3, 2)) + 1j * rng.normal(size=(1, 3, 2)),
        rng.normal(size=(2, 3, 2)) + 1j * rng.normal(size=(2, 3, 2)),
        rng.normal(size=(2, 3, 1)) + 1j * rng.normal(size=(2, 3, 1)),
    ]
    before = _contract_all(cores)
    after_cores = right_canonicalize(cores)
    after = _contract_all(after_cores)
    np.testing.assert_allclose(after, before, atol=1e-12)


def test_hartree_product_alloc_is_exact_product_state():
    vecs = [np.array([1.0, 2.0, 0.5]), np.array([0.0, 1.0]), np.array([1.0, 1.0, 1.0, 1.0])]
    cores = alloc_hartree_product([3, 2, 4], m_max=2, hartree_vecs=vecs)
    full = _contract_all(cores)
    expect = np.einsum(
        "i,j,k->ijk",
        vecs[0] / np.linalg.norm(vecs[0]),
        vecs[1] / np.linalg.norm(vecs[1]),
        vecs[2] / np.linalg.norm(vecs[2]),
    )
    np.testing.assert_allclose(full, expect, atol=1e-13)
    assert abs(np.linalg.norm(full.ravel()) - 1.0) < 1e-13


def test_cholesky_qr_matches_mgs_semantics():
    """CholeskyQR³ (the large-bond TPU gauge kernel): orthonormal live
    columns, exact-zero dead channels, Q·R = A — at f64 on CPU and at the
    f32-representative conditioning of a decaying Schmidt spectrum."""
    rng = np.random.default_rng(7)
    N, r, dead = 96, 48, 8
    u, _ = np.linalg.qr(rng.normal(size=(N, r)) + 1j * rng.normal(size=(N, r)))
    v, _ = np.linalg.qr(rng.normal(size=(r, r)) + 1j * rng.normal(size=(r, r)))
    sv = np.logspace(0, -6, r)
    a = (u * sv) @ v.conj().T
    a[:, -dead:] = 0.0
    q, R = K._cholesky_qr(jnp.asarray(a))
    q, R = np.asarray(q), np.asarray(R)
    live = np.abs(a).sum(axis=0) > 0
    gram = q.conj().T @ q
    np.testing.assert_allclose(
        gram[np.ix_(live, live)], np.eye(live.sum()), atol=5e-9
    )
    assert np.abs(q[:, ~live]).max() == 0.0
    assert np.abs(R[~live, :]).max() == 0.0
    np.testing.assert_allclose(q @ R, a, atol=1e-9)


def test_cholesky_qr_inside_site_shapes():
    """(l·n, r) shapes of a χ=256 site factor round-trip exactly."""
    rng = np.random.default_rng(8)
    l, n, r = 256, 4, 256
    psi = rng.normal(size=(l * n, r)) + 1j * rng.normal(size=(l * n, r))
    q, R = K._cholesky_qr(jnp.asarray(psi))
    np.testing.assert_allclose(
        np.asarray(q.conj().T @ q), np.eye(r), atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(q @ R), psi, atol=1e-10)


def test_cholesky_qr_conditional_final_round(monkeypatch):
    """PYTDSCF_CHQR_COND: the final round's Cholesky+solve runs only when
    the Gram certificate says repair is needed.  Ill-conditioned inputs
    get the identical full 3-round result; near-orthonormal inputs skip
    the solve but stay within the certificate tolerance, and Q·R = A and
    dead-channel exactness hold in both regimes."""
    rng = np.random.default_rng(13)
    N, r, dead = 96, 48, 8

    def make(cond_kappa):
        u, _ = np.linalg.qr(
            rng.normal(size=(N, r)) + 1j * rng.normal(size=(N, r))
        )
        v, _ = np.linalg.qr(
            rng.normal(size=(r, r)) + 1j * rng.normal(size=(r, r))
        )
        sv = np.logspace(0, -np.log10(cond_kappa), r)
        a = (u * sv) @ v.conj().T
        a[:, -dead:] = 0.0
        return a

    for kappa in (1e6, 1.0001):  # stress and near-isometry inputs
        a = make(kappa)
        q3, R3 = K._cholesky_qr(jnp.asarray(a))
        monkeypatch.setattr(K, "CHQR_COND", True)
        qc, Rc = K._cholesky_qr(jnp.asarray(a))
        monkeypatch.setattr(K, "CHQR_COND", False)
        qc, Rc = np.asarray(qc), np.asarray(Rc)
        live = np.abs(a).sum(axis=0) > 0
        gram = qc.conj().T @ qc
        np.testing.assert_allclose(
            gram[np.ix_(live, live)], np.eye(live.sum()),
            atol=2 * K.CHQR_COND_TOL,
        )
        assert np.abs(qc[:, ~live]).max() == 0.0
        assert np.abs(Rc[~live, :]).max() == 0.0
        np.testing.assert_allclose(qc @ Rc, a, atol=1e-9)
        if kappa > 10:
            # repair branch fired → identical to the unconditional path
            np.testing.assert_allclose(qc, np.asarray(q3), atol=1e-12)


def test_cholesky_qr_fast_rounds(monkeypatch):
    """PYTDSCF_CHQR_FAST: early rounds via (r,r) inverse + bf16x3 matmul.

    Refinement repairs the early-round q errors, so delivered
    orthogonality matches the exact-solve body and dead channels stay
    exactly zero (the round-4 CHQR amortisation lever, BASELINE.md)."""
    monkeypatch.setattr(K, "CHQR_FAST", True)
    rng = np.random.default_rng(11)
    N, r, dead = 96, 48, 8
    u, _ = np.linalg.qr(
        rng.normal(size=(N, r)) + 1j * rng.normal(size=(N, r))
    )
    v, _ = np.linalg.qr(
        rng.normal(size=(r, r)) + 1j * rng.normal(size=(r, r))
    )
    sv = np.logspace(0, -6, r)
    a = (u * sv) @ v.conj().T
    a[:, -dead:] = 0.0
    q, R = K._cholesky_qr(jnp.asarray(a))
    q, R = np.asarray(q), np.asarray(R)
    live = np.abs(a).sum(axis=0) > 0
    gram = q.conj().T @ q
    np.testing.assert_allclose(
        gram[np.ix_(live, live)], np.eye(live.sum()), atol=5e-9
    )
    assert np.abs(q[:, ~live]).max() == 0.0
    assert np.abs(R[~live, :]).max() == 0.0
    # CPU f64: the HIGH-precision einsum is exact there, so Q·R = A holds
    # tightly; the on-chip accuracy contract is A/B'd in bench_chi
    np.testing.assert_allclose(q @ R, a, atol=1e-8)
