"""Fused pallas Lanczos kernel vs the XLA `krylov_expm` reference path.

Interpret mode (CPU) pins the kernel's numerics; the on-chip Mosaic
compile is exercised by the TPU bench.  Tolerances are f32-scale: the
kernel runs planar-f32 with HIGHEST matmuls (same arithmetic as the
engine's complex64 path) but evaluates exp(scale·T)e0 by substepped
Taylor instead of eigh — identical to ~1e-6 relative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytdscf_tpu.mps import pallas_lanczos as PLZ
from pytdscf_tpu.mps import tdvp
from pytdscf_tpu.mps.integrator import krylov_expm


def _rand_site(rng, l, d, r, w, dtype=jnp.complex64):
    def cx(*shape):
        a = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        return jnp.asarray(a / np.linalg.norm(a), dtype)

    psi = cx(l, d, r)
    L = cx(l, w, l)
    R = cx(r, w, r)
    W = cx(w, d, d, w)
    # Hermitise H_eff: L/R blocks hermitian in (bra, ket), W in (i, j)
    L = 0.5 * (L + jnp.conj(jnp.transpose(L, (2, 1, 0))))
    R = 0.5 * (R + jnp.conj(jnp.transpose(R, (2, 1, 0))))
    W = 0.5 * (W + jnp.conj(jnp.transpose(W, (0, 2, 1, 3))))
    return psi, L, W, R


@pytest.mark.parametrize("scale_kind", ["prop", "imag"])
def test_heff_kernel_matches_krylov_expm(scale_kind):
    rng = np.random.default_rng(3)
    l, d, r, w = 6, 4, 6, 3
    psi, L, W, R = _rand_site(rng, l, d, r, w)
    shapes = ((l, d, r),)
    mv = tdvp._make_hmatvec(
        ((0, 0),), (L,), (W,), (R,), shapes, 1, jnp.complex64, None
    )
    vec = psi.reshape(-1)
    scale = jnp.asarray(-0.25j if scale_kind == "prop" else -0.25,
                        jnp.complex64)
    ref, k_ref, bad_ref = krylov_expm(
        mv, vec, scale, 1e-6, max_dim=10, conserve_norm=True,
        return_iterations=True,
    )
    ch = PLZ.heff_channels(L, W, R)
    out, k_k, bad_k = PLZ.lanczos_expm_fused(
        ch, vec, (l, d, r), scale, 1e-6, 10, True
    )
    assert not bool(bad_ref) and not bool(bad_k)
    # same Krylov dimension (stopping rule parity) and same state
    assert int(k_k) == int(k_ref)
    err = float(jnp.linalg.norm(out - ref))
    assert err < 5e-6, err


def test_heff_channels_matvec_identity():
    """Σ_c H_c (ψ R_cᵀ) == the engine's heff_apply contraction."""
    rng = np.random.default_rng(7)
    l, d, r, w = 5, 3, 4, 3
    psi, L, W, R = _rand_site(rng, l, d, r, w)
    from pytdscf_tpu.mps import kernels as K

    ref = K.heff_apply(L, W, R, psi)
    hre, him, rre, rim = PLZ.heff_channels(L, W, R)
    Hc = (hre + 1j * him).astype(jnp.complex64)
    Rt = (rre + 1j * rim).astype(jnp.complex64)
    pm = psi.reshape(l * d, r)
    out = sum(Hc[c] @ (pm @ Rt[c]) for c in range(w))
    assert float(jnp.linalg.norm(out.reshape(l, d, r) - ref)) < 1e-5


def test_keff_kernel_matches_krylov_expm():
    rng = np.random.default_rng(11)
    kdim, w = 8, 3

    def cx(*shape):
        a = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        return jnp.asarray(a / np.linalg.norm(a), jnp.complex64)

    L = cx(kdim, w, kdim)
    R = cx(kdim, w, kdim)
    L = 0.5 * (L + jnp.conj(jnp.transpose(L, (2, 1, 0))))
    R = 0.5 * (R + jnp.conj(jnp.transpose(R, (2, 1, 0))))
    sig = cx(kdim, kdim)
    kmv = tdvp._make_kmatvec(
        ((0, 0),), (L,), (R,), ((kdim, kdim),), 1, jnp.complex64, None
    )
    vec = sig.reshape(-1)
    scale = jnp.asarray(0.25j, jnp.complex64)
    ref, k_ref, _ = krylov_expm(
        kmv, vec, scale, 1e-6, max_dim=10, conserve_norm=True,
        return_iterations=True,
    )
    kch = PLZ.keff_channels(L, R)
    out, k_k, _ = PLZ.lanczos_expm_fused(
        kch, vec, (kdim, 1, kdim), scale, 1e-6, 10, True
    )
    assert int(k_k) == int(k_ref)
    assert float(jnp.linalg.norm(out - ref)) < 5e-6


def test_kernel_breakdown_exact_subspace():
    """An eigenvector start breaks down at k=1 with the exact phase."""
    rng = np.random.default_rng(5)
    l, d, r, w = 4, 3, 4, 2
    psi, L, W, R = _rand_site(rng, l, d, r, w)
    # build a true eigenvector of H_eff via dense diagonalisation
    from pytdscf_tpu.mps import kernels as K

    n = l * d * r
    eye = jnp.eye(n, dtype=jnp.complex64)
    cols = [
        K.heff_apply(L, W, R, eye[:, i].reshape(l, d, r)).reshape(n)
        for i in range(n)
    ]
    H = jnp.stack(cols, axis=1)
    wv, U = np.linalg.eigh(np.asarray(H))
    v = jnp.asarray(U[:, 0], jnp.complex64)
    scale = jnp.asarray(-0.3j, jnp.complex64)
    ch = PLZ.heff_channels(L, W, R)
    out, k_k, bad = PLZ.lanczos_expm_fused(
        ch, v, (l, d, r), scale, 1e-6, 10, True
    )
    expect = np.exp(-0.3j * wv[0]) * np.asarray(U[:, 0])
    # global phase is physical here (true eigenvector)
    got = np.asarray(out)
    err = np.linalg.norm(got - expect)
    assert err < 5e-5, (err, int(k_k), bool(bad))


def test_engine_integration_forced(monkeypatch, request):
    """Full TDVP steps with the kernel forced on (interpret mode) track
    the XLA path: same energies and cores on a small chain."""
    monkeypatch.setenv("PYTDSCF_PLZ_FORCE", "1")
    # pin BOTH engines to the MGS gauge convention (the TPU production
    # gauge).  The initial Hartree product is rank-deficient, so the
    # fixed-D trajectory depends on the dead-column completion frame:
    # LAPACK's Householder completions vs MGS's canonical-basis ones give
    # two VALID but different discretizations (~1e-4 apart, same energy).
    import pytdscf_tpu.mps.kernels as K

    monkeypatch.setattr(K, "_PALLAS_QR_FORCE", True)
    # the flag is read at trace time but is NOT part of any jit cache key:
    # drop traces made under the other convention, before AND after
    jax.clear_caches()
    request.addfinalizer(jax.clear_caches)
    import numpy as np

    from pytdscf_tpu import units
    from pytdscf_tpu.config import Config
    from pytdscf_tpu.models.holstein import singlet_fission_chain
    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.mps.tdvp import TDVPEngine

    basis, ham = singlet_fission_chain(n_left=2, n_right=3)
    phys = [b.nprim for b in basis]
    ham.fused_mpo(phys)
    vecs = []
    for i, b in enumerate(basis):
        v = np.zeros(b.nprim, dtype=complex)
        v[1 if i == 2 else 0] = 1.0
        vecs.append(v)

    def build(pallas_site):
        cores = [alloc_hartree_product(phys, 8, vecs)]
        cfg = Config(jobname="plz", thresh_exp=1e-9,
                     pallas_site=pallas_site)
        return TDVPEngine(cores, ham, cfg)

    dt = 0.2 / units.au_in_fs
    ref = build(False)
    fused = build(True)
    for _ in range(3):
        ref.propagate(dt)
        fused.propagate(dt)
    # kernel is f32 (planar) vs the CPU path's complex128: f32-scale parity
    assert fused.distance(ref) < 5e-5
    e1 = ref.expectation().real
    e2 = fused.expectation().real
    assert abs(e1 - e2) < 1e-6
