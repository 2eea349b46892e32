"""Spectrum FFT pipeline (reference style: ``/root/reference/tests/test_spectra.py``).

Instead of a stored dat fixture, the autocorrelation here is analytic —
a(t) = Σ w_k·e^{-iω_k t} — so the expected peak positions/ordering are known
exactly, plus a full end-to-end dat-file roundtrip through
``load_autocorr``/``export_spectrum``.
"""

import numpy as np
import pytest

from pytdscf_tpu import spectra, units


def _write_autocorr(path, t_fs, a):
    with open(path, "w") as f:
        f.write("# time [fs]\t auto-correlation\n")
        for tt, aa in zip(t_fs, a):
            f.write(f"{tt:6.9f}\t{aa.real: 6.9f}{aa.imag:+6.9f}j\n")


def test_ifft_autocorr_peak_positions(tmp_path):
    # two-line "spectrum": strong 1600 cm-1, weak 3700 cm-1
    w1 = 1600.0 / units.au_in_cm1 / units.au_in_fs  # rad/fs
    w2 = 3700.0 / units.au_in_cm1 / units.au_in_fs
    t = np.arange(0, 2000.05, 0.4)
    a = 0.7 * np.exp(-1j * w1 * t) + 0.3 * np.exp(-1j * w2 * t)
    a /= a[0]
    path = str(tmp_path / "autocorr.dat")
    _write_autocorr(path, t, a)

    t2, a2 = spectra.load_autocorr(path)
    assert np.allclose(t2, t)
    freq, inten = spectra.ifft_autocorr(t2, a2)
    sel = (freq > 500) & (freq < 4500)
    peak1 = freq[sel][np.argmax(inten[sel])]
    assert peak1 == pytest.approx(1600.0, abs=5.0)
    sel2 = (freq > 3000) & (freq < 4500)
    peak2 = freq[sel2][np.argmax(inten[sel2])]
    assert peak2 == pytest.approx(3700.0, abs=5.0)
    # absorption intensity scales with ω·weight: both peaks positive
    assert inten[sel].max() > 0

    spectra.export_spectrum(freq, inten, str(tmp_path / "spectrum.dat"))
    dat = np.loadtxt(tmp_path / "spectrum.dat")
    assert dat.shape[1] == 2

    spectra.plot_autocorr(t2, a2, gui=False, filename=str(tmp_path / "a.png"))
    spectra.plot_spectrum(
        freq, inten, 1000, 4000, gui=False,
        filename=str(tmp_path / "s.png"),
    )
    assert (tmp_path / "s.png").exists()


def test_power_spectrum_and_windows():
    w1 = 2000.0 / units.au_in_cm1 / units.au_in_fs
    t = np.arange(0, 1000.05, 0.5)
    a = np.exp(-1j * w1 * t)
    for window in ("cos", "cos2", None):
        freq, inten = spectra.ifft_autocorr(t, a, window=window, power=True)
        assert freq[np.argmax(inten)] == pytest.approx(2000.0, abs=10.0)


def test_load_autocorr_validates(tmp_path):
    path = str(tmp_path / "bad.dat")
    t = np.arange(0.0, 10.0, 0.5)
    a = 0.5 * np.exp(-1j * t)  # a(0) != 1
    _write_autocorr(path, t, a)
    with pytest.raises(ValueError):
        spectra.load_autocorr(path)


def test_reference_literal_h2o_peak():
    """Pin the full load→window→FFT pipeline to the reference's exact
    anchor: peak 2684.0796620397296 cm⁻¹ / intensity 28860.651565826236
    (``/root/reference/tests/test_spectra.py:20-21`` on its bundled
    ``tests/autocorr.dat`` H2O autocorrelation fixture — the fixture is
    physical run data, carried verbatim for parity)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "autocorr.dat"
    )
    t, a = spectra.load_autocorr(path)
    freq, inten = spectra.ifft_autocorr(t, a)
    assert max(inten) == pytest.approx(28860.651565826236)
    assert freq[np.argmax(inten)] == pytest.approx(2684.0796620397296)
