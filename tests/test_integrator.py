"""Krylov integrator unit tests.

Covers the relaxed (inexact) Krylov mode: iterations ≥ ``relax_after``
apply a cheaper matvec whose error enters ``exp(T)e₀`` weighted by the
late (small) expansion coefficients — van den Eshof & Hochbruck, SISC
2005.  Parity target: the reference's exact SIL/Arnoldi semantics
(``/root/reference/pytdscf/_integrator.py:453-655``) must be reproduced
when relaxation is off, and stay within the integrator threshold's order
when on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm as dense_expm

from pytdscf_tpu.mps.integrator import krylov_expm


def _random_hermitian(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    return (a + a.conj().T) / 2


def _random_general(n, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))


@pytest.mark.parametrize("arnoldi", [False, True])
def test_relaxed_krylov_stays_within_threshold(arnoldi):
    """A 1e-3-relative perturbation of matvec iterations ≥ 2 moves the
    result by ≲ the late-coefficient weight — orders below the
    perturbation itself — while the 2 leading iterations pin the answer."""
    n = 64
    h = _random_general(n, 3) if arnoldi else _random_hermitian(n, 3)
    h = h / np.linalg.norm(h, 2)
    rng = np.random.default_rng(4)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    v = jnp.asarray(v / np.linalg.norm(v))
    hj = jnp.asarray(h)
    scale = -0.4j

    def mv(x):
        return hj @ x

    # deterministic ~1e-3 relative error, mimicking a single-bf16-pass
    # matvec on TPU
    delta = jnp.asarray(_random_general(n, 5) / np.linalg.norm(h, 2) * 1e-3)

    def mv_lo(x):
        return (hj + delta) @ x

    exact = dense_expm(scale * h) @ np.asarray(v)

    out_ref = krylov_expm(
        mv, v, scale, 1e-12, max_dim=30, conserve_norm=False,
        arnoldi=arnoldi,
    )
    out_rel = krylov_expm(
        mv, v, scale, 1e-12, max_dim=30, conserve_norm=False,
        arnoldi=arnoldi, matvec_lo=mv_lo, relax_after=2,
    )
    err_ref = np.linalg.norm(np.asarray(out_ref) - exact)
    err_rel = np.linalg.norm(np.asarray(out_rel) - exact)
    assert err_ref < 1e-11
    # the injected error is 1e-3·‖H‖ per late matvec; the result moves by
    # the coefficient-weighted sum, at least an order below that
    assert err_rel < 1e-4
    # and relaxation must actually have been exercised (≥3 iterations)
    _, k_used, _ = krylov_expm(
        mv, v, scale, 1e-12, max_dim=30, conserve_norm=False,
        arnoldi=arnoldi, return_iterations=True,
    )
    assert int(k_used) > 2


@pytest.mark.parametrize("arnoldi", [False, True])
def test_relaxed_mode_with_identical_matvec_is_exact(arnoldi):
    """matvec_lo == matvec reproduces the unrelaxed path bit-for-bit
    (the CPU situation, where precision flags are no-ops) — validates the
    lax.cond plumbing around the while_loop carry."""
    n = 48
    h = _random_general(n, 11) if arnoldi else _random_hermitian(n, 11)
    hj = jnp.asarray(h / np.linalg.norm(h, 2))
    rng = np.random.default_rng(12)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    v = jnp.asarray(v / np.linalg.norm(v))

    def mv(x):
        return hj @ x

    a = krylov_expm(mv, v, -0.3j, 1e-10, max_dim=20, arnoldi=arnoldi)
    b = krylov_expm(
        mv, v, -0.3j, 1e-10, max_dim=20, arnoldi=arnoldi,
        matvec_lo=mv, relax_after=2,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("relaxed", [False, True])
def test_arnoldi_live_prefix_gs_matches_full_buffer(relaxed, monkeypatch):
    """The live-prefix (fori-loop MGS) Arnoldi GS reproduces the padded-
    buffer matmul form: same exp(scale·H)v to the integrator threshold
    and the same iteration count (the round-4 GS-read lever)."""
    import pytdscf_tpu.mps.integrator as I

    n = 96
    h = _random_general(n, 21)
    hj = jnp.asarray(h / np.linalg.norm(h, 2))
    rng = np.random.default_rng(22)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    v = jnp.asarray(v / np.linalg.norm(v))

    def mv(x):
        return hj @ x

    kwargs = dict(
        scale=-0.35j, thresh=1e-10, max_dim=18, conserve_norm=False,
        arnoldi=True, return_iterations=True,
    )
    if relaxed:
        kwargs.update(matvec_lo=mv, relax_after=2)
    a, ka, _ = krylov_expm(mv, v, **kwargs)
    monkeypatch.setattr(I, "GS_PREFIX_MIN_N", 1)
    b, kb, _ = krylov_expm(mv, v, **kwargs)
    assert int(ka) == int(kb)
    # MGS and CGS differ only in round-off; the result agrees far below
    # the integrator threshold
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    exact = dense_expm(-0.35j * np.asarray(hj)) @ np.asarray(v)
    assert np.linalg.norm(np.asarray(b) - exact) < 1e-8


@pytest.mark.parametrize("arnoldi", [True, False])
@pytest.mark.parametrize("relaxed", [False, True])
def test_tuple_rows_loops_match_buffer(arnoldi, relaxed, monkeypatch):
    """The tuple-of-rows Krylov carries (the round-4 copy-free loops used
    at large n) reproduce the padded-buffer loops: same iteration count,
    same result to round-off, and the dense-expm answer."""
    import pytdscf_tpu.mps.integrator as I

    n = 80
    h = _random_general(n, 31) if arnoldi else _random_hermitian(n, 31)
    hj = jnp.asarray(h / np.linalg.norm(h, 2))
    rng = np.random.default_rng(32)
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    v = jnp.asarray(v / np.linalg.norm(v))

    def mv(x):
        return hj @ x

    kwargs = dict(
        scale=-0.3j, thresh=1e-10, max_dim=16, conserve_norm=False,
        arnoldi=arnoldi, return_iterations=True,
    )
    if relaxed:
        kwargs.update(matvec_lo=mv, relax_after=2)
    monkeypatch.setattr(I, "GS_ROWS_MIN_N", 0)
    a, ka, _ = krylov_expm(mv, v, **kwargs)
    monkeypatch.setattr(I, "GS_ROWS_MIN_N", 1)
    b, kb, _ = krylov_expm(mv, v, **kwargs)
    assert int(ka) == int(kb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    exact = dense_expm(-0.3j * np.asarray(hj)) @ np.asarray(v)
    assert np.linalg.norm(np.asarray(b) - exact) < 1e-8


def test_planar_bf16_kernels_match_exact():
    """The relaxed matvec's planar bf16 kernels (bf16 operands AND chain
    intermediates — the HBM-traffic-halving form) reproduce the exact
    contraction to single-bf16-pass accuracy (~4e-3 relative)."""
    import jax.numpy as jnp

    from pytdscf_tpu.mps import kernels as K

    rng = np.random.default_rng(0)
    chi, w, d = 24, 5, 4

    def c(*sh):
        return jnp.asarray(
            rng.normal(size=sh) + 1j * rng.normal(size=sh), jnp.complex128
        )

    L, W, R, psi = c(chi, w, chi), c(w, d, d, w), c(chi, w, chi), c(chi, d, chi)
    exact = K.heff_apply(L, W, R, psi, "highest")
    lo = K.heff_apply_lo(
        K.planar_bf16(L), K.planar_bf16(W), K.planar_bf16(R), psi
    )
    assert float(
        jnp.linalg.norm(lo - exact) / jnp.linalg.norm(exact)
    ) < 2e-2
    sig = c(chi, chi)
    exact2 = K.keff_apply(L, R, sig, "highest")
    lo2 = K.keff_apply_lo(K.planar_bf16(L), K.planar_bf16(R), sig)
    assert float(
        jnp.linalg.norm(lo2 - exact2) / jnp.linalg.norm(exact2)
    ) < 2e-2


def test_engine_krylov_relaxed_tracks_exact():
    """Config.krylov_relaxed now runs GENUINE planar-bf16 matvecs on every
    backend (CPU included — the kernels round through bfloat16 explicitly,
    not via TPU-only precision flags), so relaxed engine energies track the
    exact run to the late-Krylov-coefficient weight, not bit-for-bit."""
    from pytdscf_tpu.config import Config
    from pytdscf_tpu.models.holstein import singlet_fission_chain
    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.mps.tdvp import TDVPEngine

    basis, ham = singlet_fission_chain(
        n_left=2, n_right=3, nlevels=3, nexciton=3
    )
    phys = [b.nprim for b in basis]
    vecs = []
    for k, d in enumerate(phys):
        v = np.zeros(d)
        v[1 if k == 2 else 0] = 1.0
        vecs.append(v)

    def build(relaxed):
        cores = [alloc_hartree_product(phys, 6, vecs)]
        return TDVPEngine(
            cores, ham,
            Config(jobname=f"rel{relaxed}", krylov_relaxed=relaxed,
                   thresh_exp=1e-10),
        )

    e0, e1 = build(False), build(True)
    for _ in range(3):
        e0.propagate(0.05)
        e1.propagate(0.05)
    assert complex(e0.expectation(ham)) == pytest.approx(
        complex(e1.expectation(ham)), abs=1e-6
    )
