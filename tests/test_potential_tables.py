"""Bundled PES/dipole tables round-trip and feed the nMR reader.

Values are physical data that must match the reference's bundled tables
(``/root/reference/pytdscf/potentials/``) exactly for example workflows to
carry over.
"""

import numpy as np

from pytdscf_tpu.potentials import TABLES, load
from pytdscf_tpu.operators.sop import read_potential_nMR


def test_table_inventory():
    assert set(TABLES) == {
        "c2h4_potential",
        "c4h6_local_potential", "c4h6_local_dipole",
        "c6h8_local_potential", "c6h8_potential", "c6h8_local_dipole",
        "c8h10_local_potential", "c10h12_local_potential",
        "c12h14_local_potential", "c14h16_local_potential",
        "wat3_potential", "wat3_dipole", "wat6_potential", "wat6_dipole",
    }
    for name in TABLES:
        tab = load(name)
        assert ("k_orig" in tab) or ("mu" in tab)


def test_wat3_literals():
    k = load("wat3_potential")["k_orig"]
    # spot literals from the reference table (wat3_potential.py:3,14)
    assert k[(7,)] == -4.09675571370734e-07
    assert k[(7, 7)] == 5.9104142628140034e-05
    mu = load("wat3_dipole")["mu"]
    np.testing.assert_allclose(
        mu[(8, 9)],
        [5.827579489308e-05, 1.207737204756e-04, -1.694534728411e-04],
    )


def test_polyene_literals_and_sizes():
    k4 = load("c4h6_local_potential")["k_orig"]
    assert k4[(9,)] == 1.391298920264969e-08
    assert k4[(9, 9)] == 3.288988742845552e-05
    assert len(load("c14h16_local_potential")["k_orig"]) == 41158
    assert len(load("c2h4_potential")["k_orig"]) == 1324


def test_feeds_nmr_reader():
    k = load("wat3_potential")["k_orig"]
    ham = read_potential_nMR(k)
    # 9 active intramolecular modes (indices 7-9, 16-18, 25-27)
    assert ham.ndof == len({i for key in k for i in key}) == 9
    nterm = sum(
        len(ham.general[0][0]) + len(ham.onesite[0][0]) for _ in (0,)
    )
    assert nterm > 100
