"""DVR basis layer: grids, derivative matrices, unitary conventions."""

import numpy as np
import pytest

from pytdscf_tpu.basis import Exponential, HarmonicOscillator, Sine


def test_ho_dvr_grids_symmetric():
    ho = HarmonicOscillator(9, 1500.0)
    g = np.asarray(ho.get_grids())
    assert np.allclose(g, -g[::-1], atol=1e-10)
    u = ho.get_unitary()
    np.testing.assert_allclose(u.conj().T @ u, np.eye(9), atol=1e-12)


def test_ho_kinetic_eigenvalues():
    """−d²/2 + ω²q²/2 in the DVR must reproduce HO energies (low states)."""
    from pytdscf_tpu import units

    omega = 2000.0 / units.au_in_cm1
    ho = HarmonicOscillator(24, 2000.0)
    q = np.asarray(ho.get_grids())
    h = -0.5 * ho.get_2nd_derivative_matrix_dvr() + np.diag(
        0.5 * omega**2 * q**2
    )
    evals = np.linalg.eigvalsh(h)
    expected = omega * (np.arange(5) + 0.5)
    np.testing.assert_allclose(evals[:5], expected, rtol=1e-08)


def test_sine_dvr_particle_in_box():
    """Sine DVR second-derivative matrix gives box eigenvalues."""
    n = 40
    length = 10.0
    sin = Sine(n, length=length, x0=0.0, units="au", include_terminal=False)
    h = -0.5 * sin.get_2nd_derivative_matrix_dvr()
    evals = np.linalg.eigvalsh(h)
    k = np.arange(1, 6) * np.pi / length
    np.testing.assert_allclose(evals[:5], 0.5 * k**2, rtol=1e-10)


def test_exponential_dvr_free_rotor():
    """Periodic (exponential) DVR reproduces free-rotor m² levels."""
    n = 21
    expo = Exponential(n, length=2.0 * np.pi)
    h = -0.5 * expo.get_2nd_derivative_matrix_dvr()
    evals = np.sort(np.linalg.eigvalsh(h).real)
    ms = np.sort(np.abs(np.arange(-(n // 2), n // 2 + 1)))
    np.testing.assert_allclose(evals[:7], 0.5 * ms[:7] ** 2.0, atol=1e-08)


def test_exponential_pos_rep_matrix_quadrature():
    """Analytic ⟨φ_m|x̂|φ_n⟩ matches numerical quadrature (the reference
    leaves get_pos_rep_matrix NotImplemented; we provide the sawtooth-x
    Fourier matrix)."""
    n, L, x0 = 7, 3.5, -1.25
    expo = Exponential(n, length=L, x0=x0)
    M = expo.get_pos_rep_matrix()
    np.testing.assert_allclose(M, M.conj().T, atol=1e-14)  # Hermitian
    x = np.linspace(x0, x0 + L, 20001)
    ref = np.empty((n, n), dtype=complex)
    for m in range(n):
        fm = np.conjugate(expo.fbr_func(m, x))
        for k in range(n):
            ref[m, k] = np.trapezoid(fm * x * expo.fbr_func(k, x), x)
    np.testing.assert_allclose(M, ref, atol=1e-6)
