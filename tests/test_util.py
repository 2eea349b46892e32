"""Util layer: format converters, normal-mode analysis, QFF fitting."""

import math

import numpy as np
import pytest

from pytdscf_tpu import units
from pytdscf_tpu.potentials import h2o_k_orig
from pytdscf_tpu.util.converters import (
    korig_to_mop,
    korig_to_op,
    mop_to_korig,
    op_to_korig,
)
from pytdscf_tpu.util.grid2qff import fit_qff
from pytdscf_tpu.util.hess_util import (
    harmonic_korig,
    normal_mode_analysis,
)


def test_mop_roundtrip(tmp_path):
    path = str(tmp_path / "test.mop")
    korig_to_mop(dict(h2o_k_orig), 3, path, level="B3LYP/cc-pVDZ")
    back = mop_to_korig(path, 3)
    for key, val in h2o_k_orig.items():
        assert back[key] == pytest.approx(val, rel=1e-12), key


def test_op_roundtrip(tmp_path):
    path = str(tmp_path / "test.op")
    korig_to_op(dict(h2o_k_orig), path)
    back = op_to_korig(path)
    for key, val in h2o_k_orig.items():
        assert back[tuple(sorted(key))] == pytest.approx(val, rel=1e-12), key


def test_normal_mode_analysis_diatomic():
    # two unit-charge masses on a spring along z: one vibration
    k = 0.5  # a.u. force constant
    m1, m2 = 1.0, 2.0  # amu
    hess = np.zeros((6, 6))
    hess[2, 2] = hess[5, 5] = k
    hess[2, 5] = hess[5, 2] = -k
    coords = np.array([[0, 0, 0], [0, 0, 1.8]])
    freqs, disp = normal_mode_analysis(hess, [m1, m2], coords)
    from pytdscf_tpu.util.hess_util import EMU_PER_AMU

    mu = (m1 * m2) / (m1 + m2) * EMU_PER_AMU
    expected = math.sqrt(k / mu) * units.au_in_cm1
    assert len(freqs) == 1
    assert freqs[0] == pytest.approx(expected, rel=1e-08)
    kq = harmonic_korig(freqs)
    assert kq[(1, 1)] == pytest.approx((expected / units.au_in_cm1) ** 2)


def test_fit_qff_recovers_polynomial():
    rng = np.random.default_rng(0)
    k22, k222, k2222 = 4.0e-4, -2.0e-5, 1.5e-6
    k12 = 3.0e-6
    q = np.linspace(-2, 2, 9)
    e1 = k22 / 2 * q**2 + k222 / 6 * q**3 + k2222 / 24 * q**4
    qq = np.array([(a, b) for a in q for b in q])
    e2 = k12 * qq[:, 0] * qq[:, 1]
    k = fit_qff({(2,): (q, e1), (1, 2): (qq, e2)})
    assert k[(2, 2)] == pytest.approx(k22, rel=1e-09)
    assert k[(2, 2, 2)] == pytest.approx(k222, rel=1e-09)
    assert k[(2, 2, 2, 2)] == pytest.approx(k2222, rel=1e-09)
    assert k[(1, 2)] == pytest.approx(k12, rel=1e-09)


def test_gout_parsers(tmp_path):
    """Synthetic Gaussian-format block exercises the table scanners."""
    from pytdscf_tpu.util.gout import AMU2EMU, gout_to_dipole, gout_to_korig

    log = """\
 Some header
 I J     Freq(I)    Freq(J)         K
  dummy separator follows

  1  1   1500.0   1500.0   0.123
  2  2   2000.0   2000.0   0.456
  1  1  1   0.0   0.0   0.002

 trailing
 Unit of the property: Debye
 header1
 header2
 header3
 1  0.1 0.0 0.2
 1 1  0.01 0.0 0.02

"""
    path = tmp_path / "g.log"
    path.write_text(log)
    k, freqs = gout_to_korig(str(path), 2)
    assert freqs[0] == 1500.0 and freqs[1] == 2000.0
    assert k[(1, 1)] == pytest.approx(0.123 / AMU2EMU)
    assert k[(1, 1, 1)] == pytest.approx(0.002 / AMU2EMU**1.5)
    mu = gout_to_dipole(str(path), 2)
    assert mu[(1,)][0] == pytest.approx(0.1 / math.sqrt(AMU2EMU))
    assert mu[(1, 1)][2] == pytest.approx(0.02 / AMU2EMU)


def test_plotting(tmp_path):
    from pytdscf_tpu.util.plotting import anim_density_matrix, plot_heatmap

    rho = np.einsum(
        "ti,tj->tij",
        np.exp(1j * np.linspace(0, 1, 5))[:, None] * np.eye(3)[0],
        np.conj(np.exp(1j * np.linspace(0, 1, 5))[:, None] * np.eye(3)[0]),
    )
    plot_heatmap(rho, filename=str(tmp_path / "h.png"))
    assert (tmp_path / "h.png").exists()
    # annotated phase-coloured Hinton animation (reference
    # anim_density_matrix.py parity: labels, timestamps, value text)
    anim_density_matrix(
        rho, filename=str(tmp_path / "a.gif"),
        times=np.linspace(0.0, 2.0, 5),
        row_names=["|0⟩", "|1⟩", "|2⟩"], col_names=["⟨0|", "⟨1|", "⟨2|"],
        add_text=True,
    )
    assert (tmp_path / "a.gif").exists()
    # component heatmap flavour still works
    anim_density_matrix(
        rho, filename=str(tmp_path / "re.gif"), component="real"
    )
    assert (tmp_path / "re.gif").exists()
    # validation errors
    from pytdscf_tpu.util.plotting import ComplexMatrixAnimation

    with pytest.raises(ValueError):
        ComplexMatrixAnimation(rho[0])
    with pytest.raises(ValueError):
        ComplexMatrixAnimation(rho, times=np.arange(3))
    with pytest.raises(ValueError):
        ComplexMatrixAnimation(rho, row_names=["a"])


def test_minfo_roundtrip(tmp_path):
    from pytdscf_tpu.util.minfo import minfo_to_gout, read_minfo

    sample = """[ Atomic Data ]
3
O, 8, 1.59994E+01, 0.00000E+00, 0.00000E+00, 1.20000E-01
H, 1, 1.00784E+00, 0.00000E+00, 7.50000E-01, -4.80000E-01
H, 1, 1.00784E+00, 0.00000E+00, -7.50000E-01, -4.80000E-01

Vibrational Frequency
3
1.64900E+03, 3.83200E+03, 3.94300E+03
Vibrational vector
Mode 1
0.00000E+00, 0.00000E+00, 7.00000E-02
0.00000E+00, 4.30000E-01, -5.60000E-01
0.00000E+00, -4.30000E-01, -5.60000E-01
Mode 2
0.00000E+00, 0.00000E+00, 5.00000E-02
0.00000E+00, 5.80000E-01, 4.00000E-01
0.00000E+00, -5.80000E-01, 4.00000E-01
Mode 3
0.00000E+00, 7.00000E-02, 0.00000E+00
0.00000E+00, -5.60000E-01, -4.30000E-01
0.00000E+00, -5.60000E-01, 4.30000E-01
"""
    path = tmp_path / "h2o.minfo"
    path.write_text(sample)
    d = read_minfo(str(path))
    assert d["atoms"] == ["O", "H", "H"]
    assert d["freqs_cm1"][1] == pytest.approx(3832.0)
    assert d["vectors"].shape == (3, 3, 3)
    out = tmp_path / "g.log"
    minfo_to_gout(str(path), str(out))
    assert "Frequencies --" in out.read_text()


def test_helper_input_exciton_builders():
    """matJ_1D (incl. genuine CT support — the reference's CT branch
    raises), matJ_2D, matJ_LH2 (reference helper_input.py:17/130/171;
    both reference 2D/LH2 bodies NameError on an undefined
    ndof_per_site — re-implemented working here)."""
    from pytdscf_tpu import units
    from pytdscf_tpu.basis import PrimBas_HO
    from pytdscf_tpu.util.helper_input import (
        matJ_1D_exciton,
        matJ_2D_exciton,
        matJ_LH2_exciton,
    )

    s0 = [PrimBas_HO(0.0, 1000.0, 4)]
    s1 = [PrimBas_HO(0.3, 1000.0, 4)]
    sh = [PrimBas_HO(-0.2, 1000.0, 4)]
    se = [PrimBas_HO(0.2, 1000.0, 4)]

    # FE-only: unchanged behaviour
    prim, spf, states, matJ = matJ_1D_exciton(3, 4, s0, s1, 0.01)
    assert len(prim) == 3 and states == [(0, 0), (1, 1), (2, 2)]
    assert matJ[0][1] == 0.01 and matJ[0][2] == 0.0

    # CT states: 3 FE + 6 CT, with deltaE/coupleH/coupleE structure
    prim, spf, states, matJ = matJ_1D_exciton(
        3, 4, s0, s1, 0.01, with_CT=True, s_hole=sh, s_elec=se,
        deltaE=0.05, coupleH=0.002, coupleE=0.003,
    )
    assert len(states) == 3 + 6 and len(prim) == 9
    m = np.asarray(matJ)
    assert m.shape == (9, 9)
    np.testing.assert_allclose(m, m.T)  # all couplings are symmetric
    i_ct = states.index((0, 1))
    assert m[i_ct, i_ct] == 0.05                     # CT diagonal
    assert m[i_ct, states.index((1, 1))] == 0.002    # hole hop to FE(1)
    assert m[i_ct, states.index((0, 0))] == 0.003    # electron hop to FE(0)
    # CT prim basis: hole mol uses s_hole, elec mol s_elec, rest s0
    row = prim[i_ct]
    assert row[0] is sh[0] and row[1] is se[0] and row[2] is s0[0]

    matJ2, prim2, spf2, nsites2 = matJ_2D_exciton(2, 3, 4, 0.02, s0, s1)
    m2 = np.asarray(matJ2)
    assert m2.shape == (6, 6)
    np.testing.assert_allclose(m2, m2.T)
    # 2x3 lattice: 7 undirected nearest-neighbour edges
    assert (m2 != 0).sum() == 2 * 7
    assert len(prim2) == 6 and nsites2 == [1] * 6

    matJL, primL, spfL, nsitesL = matJ_LH2_exciton(4)
    mL = np.asarray(matJL) * units.au_in_cm1
    assert mL.shape == (27, 27)
    np.testing.assert_allclose(mL, mL.T, atol=1e-9)
    # reordered chain: neighbours 0-1 keep the 27 cm-1 intra-unit coupling
    assert mL[0, 1] == pytest.approx(27.0)
    # ring-closure couplings (reference wrap block): pigment 0↔26 = −3,
    # 0↔24 = −25; after reorder 26 sits at chain idx 2 and 24 at idx 6
    assert mL[0, 2] == pytest.approx(-3.0)
    assert mL[0, 6] == pytest.approx(-25.0)
    # diagonal carries the Huang-Rhys-shifted site energies
    assert mL[0, 0] == pytest.approx(490.0 - 203.3 * 0.056)
    assert len(primL) == 27 and len(primL[0]) == 27
