"""Gaussian anharmonic-output parsers (PES and dipole surfaces).

Functional counterparts of the reference's interactive scripts
``gout2mop.py`` / ``gout2dipole.py`` (``/root/reference/pytdscf/util/``):
parse the reduced-normal-coordinate derivative tables that Gaussian prints
with ``freq=(Anharm, HPModes) iop(4/34=1) iop(7/33=1)``.

Unit plumbing (derived from the reference's two-script composition): the
net conversion from Gaussian's reduced-coordinate derivatives K to
mass-weighted ``k_orig`` force constants is k = (1/1822.888…)^{n/2}·K —
scaling frequencies and factorials cancel between the gout→mop and
mop→k_orig passes.
"""

from __future__ import annotations

from collections import defaultdict
from math import sqrt

AMU2EMU = 1822.8889
CM1_TO_AU = 4.556335253e-06


def _force_constant_rows(lines: list[str]):
    """Yield (indices, freq_col, value) rows of the 'I J .. K' table."""
    in_table = started = False
    for line in lines:
        words = line.split()
        if (
            len(words) > 2
            and words[0] == "I"
            and words[1] == "J"
            and words[-1][0] == "K"
        ):
            in_table = True
            continue
        if in_table:
            if not words:
                if started:
                    return
                started = True
                continue
            if started:
                try:
                    idx = tuple(sorted(int(w) for w in words[:-3]))
                    yield idx, float(words[-3]), float(words[-1])
                except ValueError:
                    return


def gout_to_korig(
    path: str, n_frqs: int, cut_off: float = 1.0e-16
) -> tuple[dict[tuple[int, ...], float], list[float]]:
    """Parse anharmonic force constants.

    Returns ``(k_orig, freqs_cm1)`` with 1-based mode tuples in ascending
    Gaussian mode order.
    """
    with open(path) as f:
        lines = f.readlines()
    k_orig: dict[tuple[int, ...], float] = defaultdict(float)
    freqs = [0.0] * (n_frqs + 1)
    for idx, freq_col, value in _force_constant_rows(lines):
        if len(idx) == 2 and idx[0] == idx[1]:
            freqs[idx[0]] = freq_col
        k = value * (1.0 / sqrt(AMU2EMU)) ** len(idx)
        if abs(k) > cut_off:
            k_orig[idx] += k
    return dict(k_orig), freqs[1:]


def gout_to_dipole(
    path: str, n_frqs: int, cut_off: float = 1.0e-16
) -> dict[tuple[int, ...], list[float]]:
    """Parse anharmonic dipole derivatives (Debye table).

    Rows after the ``Unit of the property: Debye`` marker carry mode
    indices and (x, y, z) derivative components; converted to the
    mass-weighted ``mu`` convention of
    :func:`pytdscf_tpu.operators.sop.read_potential_nMR`.
    """
    with open(path) as f:
        lines = f.readlines()
    mu: dict[tuple[int, ...], list[float]] = {}
    in_block = False
    skip = 0
    for line in lines:
        if line.strip() == "Unit of the property: Debye":
            in_block = True
            skip = 3
            continue
        if in_block:
            if skip > 0:
                skip -= 1
                continue
            words = line.split()
            if not words:
                break
            try:
                n_idx = len(words) - 3
                idx = tuple(sorted(int(w) for w in words[:n_idx]))
                vec = [float(w) for w in words[n_idx:]]
            except ValueError:
                break
            scale = (1.0 / sqrt(AMU2EMU)) ** len(idx)
            if max(abs(v) for v in vec) * scale > cut_off:
                mu[idx] = [v * scale for v in vec]
    return mu


def gout_to_mop(
    path: str, n_frqs: int, mop_path: str, level: str = "gaussian"
) -> None:
    """Gaussian log → MIDAS ``.mop`` (composition with korig_to_mop)."""
    from pytdscf_tpu.util.converters import korig_to_mop

    k_orig, _ = gout_to_korig(path, n_frqs)
    korig_to_mop(k_orig, n_frqs, mop_path, level=level)
