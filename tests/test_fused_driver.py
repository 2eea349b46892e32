"""Fused-block Simulator driver (`Properties.run_fused_block`).

With ``fetch_stride > 1`` the driver runs fetch_stride-long blocks as ONE
device program (propagate_steps_collect) with per-step properties collected
in-scan.  The .dat rows must match the per-step (stride 1) driver —
the reference's export semantics (properties of the PRE-step state, then
propagate; /root/reference/pytdscf/simulator_cls.py:418-470).
"""

from __future__ import annotations

import numpy as np

from pytdscf_tpu.model import Model
from pytdscf_tpu.simulator import Simulator

from tests.test_exciton_propagate import _build_hamiltonian, prim_info


def _run(tmp_path, jobname: str, stride: int, backup_interval: int = 1000):
    hamiltonian = _build_hamiltonian()
    model = Model(prim_info, {"hamiltonian": hamiltonian}, bond_dim=2)
    model.init_HartreeProduct = [
        [ho.get_unitary()[0].tolist() for ho in prim_info[:3]]
        + [np.array([0.0, 1.0]).tolist()]
    ]
    simulator = Simulator(jobname, model, backend="numpy", verbose=0)
    ener, _ = simulator.propagate(
        stepsize=0.1,
        maxstep=11,  # deliberately NOT a stride multiple: partial last block
        fetch_stride=stride,
        backup_interval=backup_interval,
    )
    return ener


def _rows(path: str) -> np.ndarray:
    """Parse a .dat export; complex columns become two real columns."""
    rows = []
    with open(path) as f:
        next(f)  # header
        for line in f:
            vals: list[float] = []
            for tok in line.split():
                c = complex(tok)
                vals.append(c.real)
                if "j" in tok:
                    vals.append(c.imag)
            rows.append(vals)
    return np.asarray(rows, dtype=np.float64)


def test_fused_driver_rows_match_per_step(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    e_ref = _run(tmp_path, "lvc_stride1", stride=1)
    e_fused = _run(tmp_path, "lvc_fused", stride=4)
    assert abs(e_ref - e_fused) < 1e-10
    for dat in ("autocorr.dat", "populations.dat", "energy.dat", "norm.dat"):
        import os

        ref_p = f"lvc_stride1_prop/{dat}"
        fus_p = f"lvc_fused_prop/{dat}"
        if not os.path.exists(ref_p):
            assert not os.path.exists(fus_p)
            continue
        r, f = _rows(ref_p), _rows(fus_p)
        assert r.shape == f.shape, dat
        np.testing.assert_allclose(f, r, atol=1e-10, rtol=0, err_msg=dat)


def test_fused_driver_respects_backup_boundary(tmp_path, monkeypatch):
    """Blocks must not span a backup step (its pre-step checkpoint)."""
    monkeypatch.chdir(tmp_path)
    e_ref = _run(tmp_path, "lvc_b1", stride=1, backup_interval=5)
    e_fused = _run(tmp_path, "lvc_b4", stride=4, backup_interval=5)
    assert abs(e_ref - e_fused) < 1e-10
    r = _rows("lvc_b1_prop/autocorr.dat")
    f = _rows("lvc_b4_prop/autocorr.dat")
    np.testing.assert_allclose(f, r, atol=1e-10, rtol=0)
