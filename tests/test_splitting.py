"""4th-order sweep-splitting compositions (suzuki4 / yoshida4).

The symmetric lt2 step (fwd+bwd half-sweeps) is composed with Suzuki /
Yoshida coefficient palindromes.  Order is verified against a fine
reference of the SAME bond dimension: composition reduces only the
dt-dependent splitting error of the projected (manifold) flow, so the
reference must share the manifold.  The initial state is a seeded
random full-rank MPS — from a Hartree product the flow starts at a
rank-deficient manifold point whose gauge regularisation adds
non-smooth O(1e-8) noise that masks the order (measured).  The
reference package has no higher-order splitting (its step is
hard-wired to fwd+bwd dt/2 sweeps,
``/root/reference/pytdscf/_mps_cls.py:452-503``) — this is a capability
extension, anchored by the same engine's own small-dt limit.
"""

from __future__ import annotations

import numpy as np
import pytest

from pytdscf_tpu import units
from pytdscf_tpu.config import Config
from pytdscf_tpu.models.holstein import singlet_fission_chain
from pytdscf_tpu.mps.lattice import bond_dims_for_site, right_canonicalize
from pytdscf_tpu.mps.tdvp import TDVPEngine, splitting_coeffs

DT_FS = 0.4
NSTEP = 2
D = 6

_basis, _ = singlet_fission_chain(n_left=3, n_right=4)
PHYS = [b.nprim for b in _basis]
_rng = np.random.default_rng(5)
_cores = []
for _p, _d in enumerate(PHYS):
    _l, _r = bond_dims_for_site(PHYS, _p, D)
    _cores.append(
        _rng.normal(size=(_l, _d, _r)) + 1j * _rng.normal(size=(_l, _d, _r))
    )
_cores = right_canonicalize(_cores)
_cores[0] = _cores[0] / np.linalg.norm(_cores[0])


def _build(splitting: str = "lt2") -> TDVPEngine:
    basis, ham = singlet_fission_chain(n_left=3, n_right=4)
    ham.fused_mpo(PHYS)
    config = Config(
        jobname="splitting_test",
        thresh_exp=1.0e-12,
        max_krylov=40,
        splitting=splitting,
    )
    return TDVPEngine([list(_cores)], ham, config)


def _err(splitting: str, dt_au: float, nstep: int, ref: TDVPEngine) -> float:
    eng = _build(splitting)
    for _ in range(nstep):
        eng.propagate(dt_au)
    return eng.distance(ref)


def test_splitting_coeffs_structure():
    for scheme in ("lt2", "suzuki4", "yoshida4"):
        c = splitting_coeffs(scheme)
        assert abs(sum(c) - 1.0) < 1e-14
        assert c == tuple(reversed(c))  # palindromic (symmetry => order)
    assert len(splitting_coeffs("suzuki4")) == 5
    assert len(splitting_coeffs("yoshida4")) == 3
    with pytest.raises(ValueError):
        splitting_coeffs("lt3")


def test_fourth_order_accuracy_and_convergence():
    """Measured ladder (f64 CPU): lt2 contracts 4.0× per dt halving
    (clean 2nd order); suzuki4 at dt is ~2000× below lt2 (at the ~1e-8
    sqrt-cancellation floor of the distance metric); yoshida4 contracts
    ~11× per halving (4th order, larger error constant)."""
    dt = DT_FS / units.au_in_fs
    ref = _build("suzuki4")
    for _ in range(NSTEP * 8):
        ref.propagate(dt / 8)

    e2 = _err("lt2", dt, NSTEP, ref)
    e2h = _err("lt2", dt / 2, 2 * NSTEP, ref)
    e4s = _err("suzuki4", dt, NSTEP, ref)
    e4y = _err("yoshida4", dt, NSTEP, ref)
    e4yh = _err("yoshida4", dt / 2, 2 * NSTEP, ref)

    assert 3.0 < e2 / e2h < 5.5, (e2, e2h)  # 2nd order baseline
    assert e4s < e2 / 300, (e4s, e2)
    assert e4y < e2 / 50, (e4y, e2)
    assert e4y / e4yh > 6.0, (e4y, e4yh)  # 4th-order contraction


def test_fused_steps_match_per_step_suzuki4():
    dt = 0.25 / units.au_in_fs
    a = _build("suzuki4")
    b = _build("suzuki4")
    for _ in range(3):
        a.propagate(dt)
    b.propagate_steps(dt, 3)
    # ‖Ψ−Φ‖ via overlaps floors at √(ε·‖Ψ‖²) ≈ 3e-8 (catastrophic
    # cancellation in n1+n2−2·Re⟨Ψ|Φ⟩); identical-path agreement IS the floor
    assert a.distance(b) < 1e-7


def test_splitting_rejects_relax_and_channels():
    eng = _build("suzuki4")
    eng.config = eng.config.replace(relax="imaginary")
    with pytest.raises(ValueError):
        eng.propagate(0.1)
    eng2 = _build("yoshida4")
    with pytest.raises(ValueError):
        eng2.propagate(0.1, one_gate_to_apply=[np.eye(2)])
