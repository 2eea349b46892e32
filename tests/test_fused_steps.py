"""Fused multi-step propagation (`TDVPEngine.propagate_steps`).

One `lax.fori_loop` dispatch per block must be bit-equivalent (up to jit
re-association noise) to the per-step driver loop: same cores, same
energies, same Krylov telemetry.  Parity target: the per-step path, which
itself carries the reference regression literals
(/root/reference/pytdscf/_mps_cls.py:441-497 propagation ordering).
"""

from __future__ import annotations

import numpy as np
import pytest

from pytdscf_tpu import units
from pytdscf_tpu.config import Config
from pytdscf_tpu.models.holstein import singlet_fission_chain
from pytdscf_tpu.mps.lattice import alloc_hartree_product
from pytdscf_tpu.mps.tdvp import TDVPEngine


def _build(relax: str = "none", scan: bool = False) -> TDVPEngine:
    basis, ham = singlet_fission_chain(n_left=3, n_right=4)
    phys_dims = [b.nprim for b in basis]
    ham.fused_mpo(phys_dims)
    vecs = []
    for i, b in enumerate(basis):
        v = np.zeros(b.nprim, dtype=complex)
        v[1 if i == 3 else 0] = 1.0
        vecs.append(v)
    cores = [alloc_hartree_product(phys_dims, 8, vecs)]
    config = Config(
        jobname="fused_test",
        relax=relax,
        thresh_exp=1.0e-09,
        scan_sweep=scan,
        scan_chunk=4,
        pytest_enabled=True,
    )
    return TDVPEngine(cores, ham, config)


@pytest.mark.parametrize("scan", [False, True])
def test_fused_matches_per_step(scan):
    dt = 0.2 / units.au_in_fs
    ref = _build(scan=scan)
    fused = _build(scan=scan)
    for _ in range(4):
        ref.propagate(dt)
    fused.propagate_steps(dt, 4)
    # identical program content => tiny re-association noise only
    assert fused.distance(ref) < 1e-10
    e_ref = ref.expectation().real
    e_fused = fused.expectation().real
    assert abs(e_ref - e_fused) < 1e-12
    a_ref, c_ref, cap_ref = ref.krylov_stats()
    a_fus, c_fus, cap_fus = fused.krylov_stats()
    assert c_fus == c_ref
    assert cap_fus == cap_ref
    assert abs(a_fus - a_ref) < 1e-12


def test_fused_blocks_continue_correctly():
    """Two fused blocks == one longer fused run == per-step loop."""
    dt = 0.15 / units.au_in_fs
    a = _build()
    b = _build()
    a.propagate_steps(dt, 2)
    a.propagate_steps(dt, 3)  # dynamic nsteps: must NOT recompile/diverge
    b.propagate_steps(dt, 5)
    assert a.distance(b) < 1e-10


def test_fused_imaginary_relaxation():
    dt = 0.1 / units.au_in_fs
    ref = _build(relax="imaginary")
    fused = _build(relax="imaginary")
    for _ in range(3):
        ref.propagate(dt)
    fused.propagate_steps(dt, 3)
    assert fused.distance(ref) < 1e-10
    assert abs(ref.expectation().real - fused.expectation().real) < 1e-12
