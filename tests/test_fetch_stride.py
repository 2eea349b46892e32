"""Deferred multi-step property fetches (``Config.fetch_stride``).

The driver may batch the device scalars of several steps into one packed
host fetch (amortising the ~30 ms axon-tunnel round trip that dominates
small-model TPU driver loops).  The exported .dat rows and final
properties must be BIT-identical to the stride-1 run — only the fetch is
deferred, never the math.
"""

import numpy as np
import pytest

from pytdscf_tpu.model import Model
from pytdscf_tpu.simulator import Simulator

from tests.test_exciton_propagate import _build_hamiltonian, prim_info


def _run(tmp_path, jobname: str, stride: int) -> float:
    model = Model(prim_info, {"hamiltonian": _build_hamiltonian()}, bond_dim=2)
    model.init_HartreeProduct = [
        [ho.get_unitary()[0].tolist() for ho in prim_info[:3]]
        + [np.array([0.0, 1.0]).tolist()]
    ]
    simulator = Simulator(jobname, model, backend="numpy")
    ener, _ = simulator.propagate(
        stepsize=0.1, maxstep=7, fetch_stride=stride
    )
    return ener


def test_fetch_stride_rows_identical(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    e1 = _run(tmp_path, "stride1", 1)
    e3 = _run(tmp_path, "stride3", 3)
    assert e1 == e3 == pytest.approx(0.010000180312707298, abs=5e-7)
    for name in ("autocorr", "populations"):
        a = (tmp_path / "stride1_prop" / f"{name}.dat").read_text()
        b = (tmp_path / "stride3_prop" / f"{name}.dat").read_text()
        assert a == b
        # one header + one row per step
        assert len(a.strip().splitlines()) == 1 + 7
