"""Parity tests for the fused whole-site-step pallas kernel.

``pallas_site.site_step_fused`` must reproduce ``tdvp._site_step_impl``
(the non-last, fixed-rank, single-pair Lanczos case) phase by phase:
H-Krylov, thin QR gauge, block renorm + log-scale, K-Krylov, absorb.
Runs in pallas interpret mode on CPU; the XLA reference path is pinned
to the same MGS gauge convention so cores compare directly (no phase
freedom between LAPACK and MGS factors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytdscf_tpu.mps.kernels as K
from pytdscf_tpu.mps import pallas_site as PS
from pytdscf_tpu.mps.tdvp import _site_step_impl


@pytest.fixture(autouse=True)
def _mgs_gauge(monkeypatch):
    # identical gauge convention on both paths (MGS positive-diagonal R)
    monkeypatch.setattr(K, "_PALLAS_QR_FORCE", True)
    jax.clear_caches()
    yield
    jax.clear_caches()


def _rand_case(seed, l, d, r, nc, d2, rn):
    rng = np.random.default_rng(seed)

    def cplx(*shape):
        return jnp.asarray(
            (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
            / np.sqrt(np.prod(shape)),
            jnp.complex64,
        )

    psi = cplx(l, d, r)
    W = cplx(nc, d, d, nc)
    W = W + jnp.transpose(W, (0, 2, 1, 3)).conj()  # hermitian phys
    L = cplx(l, nc, l)
    L = 0.5 * (L + jnp.transpose(L, (2, 1, 0)).conj())
    R = cplx(r, nc, r)
    R = 0.5 * (R + jnp.transpose(R, (2, 1, 0)).conj())
    L = L / jnp.linalg.norm(L)
    R = R / jnp.linalg.norm(R)
    return psi, W, L, R


@pytest.mark.parametrize("forward", [True, False])
@pytest.mark.parametrize("conserve", [True, False])
def test_site_step_parity(forward, conserve):
    l, d, r, nc = 4, 3, 5, 3
    psi, W, L, R = _rand_case(7 if forward else 11, l, d, r, nc, 3, 6)
    next_core = (
        _rand_case(23, r, 3, 6, nc, 3, 6)[0]
        if forward
        else jnp.transpose(_rand_case(29, l, 3, 6, nc, 3, 6)[0], (2, 1, 0))
    )
    scale = jnp.asarray(-0.05j, jnp.complex64)
    thresh = jnp.asarray(1e-9, jnp.float32)
    lL = jnp.asarray(0.37, jnp.float32)
    lR = jnp.asarray(-0.21, jnp.float32)

    assert PS.site_fits(psi.shape, W.shape, next_core.shape, 20)

    kw = dict(
        pairs=((0, 0),), nstate=1, mode="real", conserve_norm=conserve,
        arnoldi=False, max_dim=20, last=False, forward=forward,
    )
    sites_ref, nxt_ref, blocks_ref, logs_ref, kry_ref = _site_step_impl(
        (psi,), (next_core,), (L,), (W,), (R,), scale, thresh,
        (lL,), (lR,), **kw,
    )
    out, nxt, blocks, log_new, kry = PS.site_step_fused(
        psi, next_core, L, W, R, scale, thresh, lL, lR,
        forward=forward, max_dim=20, conserve=conserve,
    )

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(sites_ref[0]), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(nxt), np.asarray(nxt_ref[0]), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(blocks), np.asarray(blocks_ref[0]), atol=5e-6
    )
    assert abs(float(log_new) - float(logs_ref[0])) < 5e-6
    np.testing.assert_array_equal(np.asarray(kry), np.asarray(kry_ref))


def test_site_fits_gates():
    # non-square MPO bond -> reject (channel reuse assumption)
    assert not PS.site_fits((4, 3, 5), (2, 3, 3, 4), (5, 3, 6), 20)
    # max_dim beyond the padded coefficient buffer -> reject
    assert not PS.site_fits((4, 3, 5), (3, 3, 3, 3), (5, 3, 6), 64)
    # thin-QR shape violations -> reject
    assert not PS.site_fits((16, 1, 2), (3, 1, 1, 3), None, 20)
