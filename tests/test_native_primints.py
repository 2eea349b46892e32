"""Native (C++) primitive integrals vs the numpy reference implementation."""

import numpy as np
import pytest

from pytdscf_tpu import native
from pytdscf_tpu.basis.op_matrix import (
    ho_d1_matrix,
    ho_d2_matrix,
    ho_overlap,
    ho_q_matrix,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ compiler available"
)

CASES = [
    (0.009, 0.0, 6, 0.009, 0.0, 6),      # identical bases
    (0.009, 0.0, 5, 0.005, 2.0, 7),      # shifted + different freq + dims
    (0.017, -1.3, 8, 0.017, 0.7, 8),     # same freq, shifted
]


@pytest.mark.parametrize("wl, al, nl, wr, ar, nr", CASES)
def test_overlap_matches_numpy(wl, al, nl, wr, ar, nr):
    got = native.ovi_HO_FBR(wl, al, nl, wr, ar, nr)
    ref = ho_overlap(wl, al, nl, wr, ar, nr)
    np.testing.assert_allclose(got, ref, atol=1.0e-09 * max(1.0, float(np.abs(ref).max())))


@pytest.mark.parametrize("wl, al, nl, wr, ar, nr", CASES)
@pytest.mark.parametrize("power", [1, 2, 3, 4])
def test_poly_matches_numpy(wl, al, nl, wr, ar, nr, power):
    got = native.poly_HO_FBR(wl, al, nl, wr, ar, nr, power)
    ov = ho_overlap(wl, al, nl, wr, ar, nr + power)
    import math

    dim = nr + power
    a = np.diag(np.sqrt(np.arange(1, dim)), 1)
    q = ar * np.eye(dim) + (a + a.T) / math.sqrt(2.0 * wr)
    ref = ov @ np.linalg.matrix_power(q, power)[:, :nr]
    np.testing.assert_allclose(got, ref, atol=1.0e-09 * max(1.0, float(np.abs(ref).max())))


def test_poly_same_basis_matches_ladder():
    got = native.poly_HO_FBR(0.009, 0.0, 6, 0.009, 0.0, 6, 2)
    ref = ho_q_matrix(0.009, 0.0, 6, 2)
    np.testing.assert_allclose(got, ref, atol=1.0e-09 * max(1.0, float(np.abs(ref).max())))


def test_deriv_same_basis():
    got1 = native.deriv_HO_FBR(0.009, 0.0, 6, 0.009, 0.0, 6, 1)
    np.testing.assert_allclose(got1, ho_d1_matrix(0.009, 6), atol=1.0e-12)
    got2 = native.deriv_HO_FBR(0.009, 0.0, 6, 0.009, 0.0, 6, 2)
    np.testing.assert_allclose(got2, ho_d2_matrix(0.009, 6), atol=1.0e-12)
