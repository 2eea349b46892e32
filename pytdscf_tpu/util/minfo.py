"""SINDO ``.minfo`` reader and Gaussian-style output writer.

Counterpart of ``/root/reference/pytdscf/util/minfo2gout.py``: parse the
minfo sections (``[ Atomic Data ]`` with comma-separated rows, the
``Vibrational Frequency`` list and per-mode ``Vibrational vector`` blocks)
into structured data, and emit a Gaussian-frequency-style text block so
downstream tooling built around Gaussian logs can consume SINDO results.
"""

from __future__ import annotations

import numpy as np


def read_minfo(path: str) -> dict:
    """Parse a minfo file → {atoms, masses, coords, freqs_cm1, vectors}.

    ``atoms`` are element symbols, ``coords`` (natom, 3), ``vectors``
    (nmode, natom, 3) Cartesian normal-mode vectors.
    """
    atoms: list[str] = []
    masses: list[float] = []
    coords: list[list[float]] = []
    freqs: list[float] = []
    vectors: list[np.ndarray] = []

    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]

    def floats(line: str) -> list[float]:
        return [
            float(w) for w in line.replace(",", " ").replace("E", "e").split()
        ]

    i = 0
    while i < len(lines):
        line = lines[i]
        if line.strip() == "[ Atomic Data ]":
            natom = int(lines[i + 1].split()[0])
            for row in lines[i + 2 : i + 2 + natom]:
                w = row.replace(",", " ").split()
                atoms.append(w[0])
                masses.append(float(w[2].replace("E", "e")) if len(w) > 4 else float(w[1]))
                coords.append([float(x.replace("E", "e")) for x in w[-3:]])
            i += 2 + natom
            continue
        if line.strip() == "Vibrational Frequency":
            nmode = int(lines[i + 1].split()[0])
            i += 2
            while len(freqs) < nmode and i < len(lines):
                freqs.extend(floats(lines[i]))
                i += 1
            continue
        if line.strip() == "Vibrational vector":
            i += 1
            current: list[float] = []
            while i < len(lines):
                ln = lines[i].strip()
                if ln.startswith("Mode"):
                    if current:
                        vectors.append(
                            np.asarray(current).reshape(len(atoms), 3)
                        )
                        current = []
                    i += 1
                    continue
                if not ln or ln.startswith("["):
                    break
                current.extend(floats(lines[i]))
                i += 1
            if current:
                vectors.append(np.asarray(current).reshape(len(atoms), 3))
            continue
        i += 1

    return {
        "atoms": atoms,
        "masses": np.asarray(masses),
        "coords": np.asarray(coords),
        "freqs_cm1": np.asarray(freqs),
        "vectors": np.asarray(vectors) if vectors else np.zeros((0, len(atoms), 3)),
    }


def minfo_to_gout(minfo_path: str, out_path: str) -> None:
    """Write a Gaussian-frequency-style block from a minfo file."""
    data = read_minfo(minfo_path)
    freqs = data["freqs_cm1"]
    vecs = data["vectors"]
    atoms = data["atoms"]
    with open(out_path, "w") as f:
        f.write(" Entering Gaussian-style frequency block (from minfo)\n")
        for start in range(0, len(freqs), 3):
            grp = range(start, min(start + 3, len(freqs)))
            f.write("".join(f"{k + 1:>23d}" for k in grp) + "\n")
            f.write(
                " Frequencies --"
                + "".join(f"{freqs[k]:>12.4f}" for k in grp)
                + "\n"
            )
            f.write("  Atom  AN" + "      X      Y      Z" * len(list(grp)) + "\n")
            for a in range(len(atoms)):
                row = f"{a + 1:>6d}{a + 1:>4d}"
                for k in grp:
                    if k < len(vecs):
                        row += "".join(f"{vecs[k][a][c]:>7.2f}" for c in range(3))
                f.write(row + "\n")
