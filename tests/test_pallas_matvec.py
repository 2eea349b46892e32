"""Pallas-fused relaxed-matvec kernels (interpret mode on CPU).

The fused kernel keeps the whole L·W·R·ψ chain in VMEM (no HBM
intermediates).  On CPU ``pallas_call(interpret=True)`` executes the same
program semantics, so these tests pin the kernel math; the TPU wall-clock
A/B lives in scripts/TPU_RUNBOOK.md.  Parity target: the reference's
un-fused ``multiplyH_MPS_direct`` chain
(``/root/reference/pytdscf/_contraction.py:1038-1176``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pytdscf_tpu.mps import kernels as K
from pytdscf_tpu.mps import pallas_matvec as PM

RNG = np.random.default_rng(7)


def _c(*sh):
    return jnp.asarray(
        RNG.normal(size=sh) + 1j * RNG.normal(size=sh), jnp.complex128
    )


@pytest.mark.parametrize("b,k,x,w,d", [(256, 256, 128, 8, 4), (128, 128, 256, 5, 3)])
def test_heff_pallas_matches_exact(b, k, x, w, d):
    L, W, R, psi = _c(b, w, k), _c(w, d, d, w), _c(x, w, x), _c(k, d, x)
    exact = K.heff_apply(L, W, R, psi, "highest")
    Lt, Wb, Rt = PM.heff_operands(L, W, R)
    got = PM.heff_pallas(Lt, Wb, Rt, psi)
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < 2e-2, rel


def test_keff_pallas_matches_exact():
    b = k = x = 256
    w = 8
    L, R, sig = _c(b, w, k), _c(x, w, x), _c(k, x)
    exact = K.keff_apply(L, R, sig, "highest")
    Lt, Rt = PM.keff_operands(L, R)
    got = PM.keff_pallas(Lt, Rt, sig)
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < 2e-2, rel


def test_builder_dispatch_mixes_pallas_and_fallback():
    """make_hmatvec_lo with use_pallas routes tile-divisible pairs through
    the fused kernel and edge shapes through the planar einsum — the sum
    over pairs must still match the exact matvec to bf16 accuracy."""
    w, d = 4, 4
    # pair 0: divisible (128); pair 1: edge (24) → fallback
    L0, W0, R0, psi0 = _c(128, w, 128), _c(w, d, d, w), _c(128, w, 128), _c(128, d, 128)
    L1, W1, R1, psi1 = _c(24, w, 24), _c(w, d, d, w), _c(24, w, 24), _c(24, d, 24)
    pairs = ((0, 0), (1, 1))
    shapes = (psi0.shape, psi1.shape)
    assert PM.heff_shapes_ok(L0, W0, R0, psi0.shape)
    assert not PM.heff_shapes_ok(L1, W1, R1, psi1.shape)
    mv = K.make_hmatvec_lo(
        pairs, [L0, L1], [W0, W1], [R0, R1], shapes, psi0.dtype,
        use_pallas=True,
    )
    got = mv(K.stack_states([psi0, psi1]))
    exact = K.stack_states(
        [
            K.heff_apply(L0, W0, R0, psi0, "highest"),
            K.heff_apply(L1, W1, R1, psi1, "highest"),
        ]
    )
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < 2e-2, rel


def test_wbig_encodes_complex_product():
    """The planar-mixing matrix reproduces W-contraction of a complex T1
    exactly (structure test, f64 reference)."""
    w, d = 3, 2
    W = np.asarray(RNG.normal(size=(w, d, d, w)) + 1j * RNG.normal(size=(w, d, d, w)))
    big = np.asarray(PM.wbig_from_mpo(jnp.asarray(W)), dtype=np.float64)
    t1 = RNG.normal(size=(d, w)) + 1j * RNG.normal(size=(d, w))
    t1_rows = np.zeros((d * w * 2,))
    t1_rows[0::2] = t1.real.reshape(-1)
    t1_rows[1::2] = t1.imag.reshape(-1)
    out = big @ t1_rows  # rows (a, i, plane)
    want = np.einsum("aijc,jc->ai", W, t1)
    got = out[0::2].reshape(w, d) + 1j * out[1::2].reshape(w, d)
    # bf16-free structure check — W is rounded to f32 inside wbig_from_mpo
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
