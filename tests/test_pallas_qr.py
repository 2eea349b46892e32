"""Pallas MGS gauge kernel vs `kernels._mgs_qr` (interpret mode).

The kernel must reproduce the XLA MGS(×2) EXACTLY in structure: same
orthonormality, same Q·R = A reconstruction, same deterministic
completion of rank-deficient columns (zero R diagonal), on the
near-degenerate Schmidt spectra the fixed-D sweep actually carries.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from pytdscf_tpu.mps import kernels as K
from pytdscf_tpu.mps import pallas_qr as PQ


def _check(m, tol_match=5e-6):
    q_ref, r_ref = K._mgs_qr(m)
    q_k, r_k = PQ.mgs_qr_fused(m)
    n, r = m.shape
    eye = jnp.eye(r, dtype=m.dtype)
    orth = float(jnp.linalg.norm(eye - q_k.conj().T @ q_k))
    rec = float(jnp.linalg.norm(q_k @ r_k - m))
    assert orth < 1e-5 * r, orth
    assert rec < 1e-5 * float(jnp.linalg.norm(m)) + 1e-7, rec
    # structural parity with the XLA MGS (same algorithm, f32 rounding)
    dq = float(jnp.linalg.norm(q_k - q_ref))
    dr = float(jnp.linalg.norm(r_k - r_ref))
    assert dq < tol_match * np.sqrt(q_ref.size), dq
    assert dr < tol_match * np.sqrt(r_ref.size) * float(
        jnp.linalg.norm(m)
    ) + 1e-6, dr


def _cx(rng, *shape):
    a = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    return jnp.asarray(a / np.linalg.norm(a), jnp.complex64)


def test_well_conditioned():
    rng = np.random.default_rng(0)
    _check(_cx(rng, 48, 12))


def test_rank_deficient_exact_zero_columns():
    rng = np.random.default_rng(1)
    m = np.array(np.asarray(_cx(rng, 40, 10)))
    m[:, 3] = 0.0
    m[:, 7] = 0.0
    m = jnp.asarray(m)
    q_ref, r_ref = K._mgs_qr(m)
    q_k, r_k = PQ.mgs_qr_fused(m)
    # dead columns: zero R diagonal, completed orthonormal Q column
    assert abs(complex(r_k[3, 3])) < 1e-6
    assert abs(complex(r_k[7, 7])) < 1e-6
    assert abs(float(jnp.linalg.norm(q_k[:, 3])) - 1.0) < 1e-5
    eye = jnp.eye(10, dtype=m.dtype)
    assert float(jnp.linalg.norm(eye - q_k.conj().T @ q_k)) < 1e-4
    assert float(jnp.linalg.norm(q_k - q_ref)) < 1e-4
    assert float(jnp.linalg.norm(q_k @ r_k - m)) < 1e-6


def test_rank1_plus_tail():
    """The early-trajectory Schmidt spectrum: one big value + tiny tail —
    the case that breaks CholeskyQR (orth ≈ 4.9 measured on-chip)."""
    rng = np.random.default_rng(2)
    u = rng.standard_normal((60, 1)) + 1j * rng.standard_normal((60, 1))
    v = rng.standard_normal((1, 12)) + 1j * rng.standard_normal((1, 12))
    tail = rng.standard_normal((60, 12)) + 1j * rng.standard_normal((60, 12))
    m = jnp.asarray((u @ v + 1e-7 * tail), jnp.complex64)
    m = m / jnp.linalg.norm(m)
    q_k, r_k = PQ.mgs_qr_fused(m)
    eye = jnp.eye(12, dtype=m.dtype)
    orth = float(jnp.linalg.norm(eye - q_k.conj().T @ q_k))
    assert orth < 1e-4, orth
    rec = float(jnp.linalg.norm(q_k @ r_k - m))
    assert rec < 1e-5, rec


@pytest.mark.parametrize("shape", [(240, 30), (64, 30), (30, 30)])
def test_gauge_shapes(shape):
    rng = np.random.default_rng(4)
    _check(_cx(rng, *shape))
