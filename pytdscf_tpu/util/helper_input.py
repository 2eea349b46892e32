"""Model-input helpers (Frenkel-exciton aggregates).

Parity target: ``/root/reference/pytdscf/util/helper_input.py:17-130``
(`matJ_1D_exciton`): build per-state primitive bases and the electronic
coupling matrix for a 1-D molecular aggregate where state i is the Frenkel
exciton localised on molecule i (its modes use the excited-state basis
``s1``, all other molecules the ground-state basis ``s0``), with
nearest-neighbour coupling ``coupleJ``.
"""

from __future__ import annotations

from itertools import chain


def matJ_1D_exciton(
    nmol: int,
    nspf: int,
    s0: list,
    s1: list,
    coupleJ: float,
    *,
    deltaE: float = 0.0,
    coupleE: float = 0.0,
    coupleH: float = 0.0,
    ndof_per_site: int = 1,
    with_CT: bool = False,
):
    """Returns (prim_info, spf_info, statelist, matJ) for an FE aggregate."""
    if with_CT:
        raise NotImplementedError("charge-transfer states are not supported")
    statelist = [(imol, imol) for imol in range(nmol)]
    prim_info = [
        list(
            chain.from_iterable(
                s1 if x == imol else s0 for x in range(nmol)
            )
        )
        for imol, _ in statelist
    ]
    matJ = [
        [
            coupleJ if abs(imol - jmol) == 1 else 0.0
            for jmol, _ in statelist
        ]
        for imol, _ in statelist
    ]
    spf_info = [[nspf for _ in row] for row in prim_info]
    return prim_info, spf_info, statelist, matJ
