"""Deferred multi-step property fetches (``Config.fetch_stride``).

The driver may batch the device scalars of several steps into one packed
host fetch (amortising the ~30 ms axon-tunnel round trip that dominates
small-model TPU driver loops).  Two regimes:

- deferred fetch only (fused blocks gated off, e.g. by a per-step
  stride): the per-step device programs are unchanged, so rows and
  final properties are BIT-identical to stride 1;
- fused blocks (``simulator._execute`` runs each block as ONE
  scan-compiled device program): a different XLA program, so values may
  differ from the per-step loop at the last bit (~1 ulp) — exported
  .dat rows must still be text-identical and the final energy must
  agree to 1e-12.
"""

import numpy as np
import pytest

from pytdscf_tpu.model import Model
from pytdscf_tpu.simulator import Simulator

from tests.test_exciton_propagate import _build_hamiltonian, prim_info


def _run(tmp_path, jobname: str, stride: int, **kw) -> float:
    model = Model(prim_info, {"hamiltonian": _build_hamiltonian()}, bond_dim=2)
    model.init_HartreeProduct = [
        [ho.get_unitary()[0].tolist() for ho in prim_info[:3]]
        + [np.array([0.0, 1.0]).tolist()]
    ]
    simulator = Simulator(jobname, model, backend="numpy")
    ener, _ = simulator.propagate(
        stepsize=0.1, maxstep=7, fetch_stride=stride, **kw
    )
    return ener


def test_fetch_stride_rows_identical(tmp_path, monkeypatch):
    """stride 3 engages the fused-block driver: rows text-identical,
    final energy to 1e-12 (different XLA program → last-bit slack)."""
    monkeypatch.chdir(tmp_path)
    e1 = _run(tmp_path, "stride1", 1)
    e3 = _run(tmp_path, "stride3", 3)
    assert e1 == pytest.approx(0.010000180312707298, abs=5e-7)
    assert e3 == pytest.approx(e1, abs=1e-12)
    for name in ("autocorr", "populations"):
        a = (tmp_path / "stride1_prop" / f"{name}.dat").read_text()
        b = (tmp_path / "stride3_prop" / f"{name}.dat").read_text()
        assert a == b
        # one header + one row per step
        assert len(a.strip().splitlines()) == 1 + 7


def test_deferred_fetch_bit_identical(tmp_path, monkeypatch):
    """populations_per_step=2 gates the fused-block driver OFF while the
    deferred-fetch queue stays on — the per-step device programs are
    unchanged, so the result must be BIT-identical to stride 1."""
    monkeypatch.chdir(tmp_path)
    e1 = _run(tmp_path, "dstride1", 1, populations_per_step=2)
    e3 = _run(tmp_path, "dstride3", 3, populations_per_step=2)
    assert e1 == e3 == pytest.approx(0.010000180312707298, abs=5e-7)
    for name in ("autocorr", "populations"):
        a = (tmp_path / "dstride1_prop" / f"{name}.dat").read_text()
        b = (tmp_path / "dstride3_prop" / f"{name}.dat").read_text()
        assert a == b
