"""H2CO (formaldehyde) 6-mode MPS-SM propagation (BASELINE workload #2).

Counterpart of the reference's H2CO workflows: read the bundled quartic
force field, propagate the 6-mode chain and check energy conservation and
physical ZPE; this is the model behind the "H2CO 6-mode propagation
wall-clock" baseline metric (BASELINE.md).
"""

import math
import os

import pytest

from pytdscf_tpu import units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import ch2o_k_orig
from pytdscf_tpu.simulator import Simulator


def test_h2co_6mode_propagate(tmp_path):
    os.chdir(tmp_path)
    prim_info = [
        [
            PrimBas_HO(
                0.0, math.sqrt(ch2o_k_orig[(i, i)]) * units.au_in_cm1, 6
            )
            for i in range(1, 7)
        ]
    ]
    basinfo = BasInfo(prim_info)
    ham = read_potential_nMR(ch2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=6)
    sim = Simulator("h2co", model, verbose=0)
    e0, _ = sim.propagate(maxstep=1, stepsize=0.1)
    e10, wf = sim.propagate(maxstep=10, stepsize=0.1)
    harm_zpe = sum(
        math.sqrt(ch2o_k_orig[(i, i)]) for i in range(1, 7)
    ) / 2
    # near-harmonic ZPE, anharmonicity shifts it slightly
    assert e0 == pytest.approx(harm_zpe, rel=2.0e-02)
    # 1-site TDVP conserves energy for the fixed manifold
    assert e10 == pytest.approx(e0, abs=1.0e-09)
    assert wf.norm() == pytest.approx(1.0, abs=1.0e-09)


def test_launch_bound_venue_advisory(tmp_path, monkeypatch):
    """Tiny models on an accelerator venue log the CPU-venue advisory
    (VERDICT r3 weak #5: no silent slow venue); large cores stay quiet."""
    import numpy as np

    import jax

    os.chdir(tmp_path)
    prim_info = [
        [
            PrimBas_HO(
                0.0, math.sqrt(ch2o_k_orig[(i, i)]) * units.au_in_cm1, 6
            )
            for i in range(1, 7)
        ]
    ]
    model = Model(
        BasInfo(prim_info),
        {"hamiltonian": read_potential_nMR(ch2o_k_orig)},
        bond_dim=6,
    )
    sim = Simulator("h2co_venue", model, verbose=0)
    small = [[np.zeros((6, 6, 6))]]
    big = [[np.zeros((64, 8, 64))]]

    def logged() -> str:
        for h in __import__("logging").getLogger(
            "pytdscf_tpu.h2co_venue"
        ).handlers:
            h.flush()
        try:
            with open("h2co_venue/main.log") as fh:
                return fh.read()
        except FileNotFoundError:
            return ""

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sim._warn_if_launch_bound(big)
    assert "launch-overhead-bound" not in logged()
    sim._warn_if_launch_bound(small)
    assert "launch-overhead-bound" in logged()
    # CPU backend: never warns (marker text appears exactly once)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    sim._warn_if_launch_bound(small)
    assert logged().count("launch-overhead-bound") == 1
