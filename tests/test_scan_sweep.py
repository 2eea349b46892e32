"""Scan-compiled bulk-site sweep parity vs the per-site Python loop.

The uniform bulk of a long chain compiles into one ``lax.scan`` program
(SURVEY §7: dispatch/warm-up amortisation); it must reproduce the per-site
path to numerical identity — same ops, same order, just scanned.
"""

import numpy as np
import pytest

from pytdscf_tpu.config import Config
from pytdscf_tpu.models.holstein import singlet_fission_chain
from pytdscf_tpu.mps import device_io as dio
from pytdscf_tpu.mps.lattice import alloc_hartree_product
from pytdscf_tpu.mps.tdvp import TDVPEngine


def _build(scan: bool, n_left=8, n_right=13, bond=8):
    basis, ham = singlet_fission_chain(
        n_left=n_left, n_right=n_right, nlevels=4, nexciton=3
    )
    phys = [b.nprim for b in basis]
    vecs = []
    for k, d in enumerate(phys):
        v = np.zeros(d)
        v[1 if k == n_left else 0] = 1.0
        vecs.append(v)
    cores = [alloc_hartree_product(phys, bond, vecs)]
    config = Config(
        jobname=f"scan{scan}", conserve_norm=True, scan_sweep=scan,
        scan_chunk=4,
        thresh_exp=1e-10,
    )
    return TDVPEngine(cores, ham, config)


def test_scan_sweep_parity():
    ref = _build(scan=False)
    scn = _build(scan=True)
    # the chain has uniform Boson bulks left and right of the exciton →
    # the scan partition must actually fire
    order = list(range(ref.nsite))
    ref.env_stack = None
    env = scn.build_right_env_stack()
    runs = scn._scan_runs(order, True, env)
    assert runs, "no scan runs detected on a uniform chain"
    # both uniform boson bulks (left + right of the exciton) must scan
    assert len(runs) >= 2 and sum(runs.values()) >= ref.nsite // 2

    dt = 0.2
    for _ in range(3):
        ref.propagate(dt)
        scn.propagate(dt)
    e_ref = ref.expectation(ref.hamiltonian)
    e_scn = scn.expectation(scn.hamiltonian)
    assert e_scn.real == pytest.approx(e_ref.real, abs=1e-10)
    np.testing.assert_allclose(
        scn.pop_states(), ref.pop_states(), atol=1e-10
    )
    for p in range(ref.nsite):
        np.testing.assert_allclose(
            dio.fetch(scn.cores[0][p]), dio.fetch(ref.cores[0][p]),
            atol=1e-9,
        )


def test_scan_sweep_relax_modes():
    """Scan path in imaginary-time relaxation also matches."""
    ref = _build(scan=False)
    scn = _build(scan=True)
    ref.config = ref.config.replace(relax="imaginary")
    scn.config = scn.config.replace(relax="imaginary")
    for _ in range(2):
        ref.propagate(0.5)
        scn.propagate(0.5)
    e_ref = ref.expectation(ref.hamiltonian)
    e_scn = scn.expectation(scn.hamiltonian)
    assert e_scn.real == pytest.approx(e_ref.real, abs=1e-10)


def test_per_site_krylov_telemetry():
    """Per-site Krylov counters (Config.per_site_telemetry) sum to the
    global telemetry, in both the scan-compiled and per-site sweeps."""
    import numpy as np

    from pytdscf_tpu.config import Config
    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.mps.tdvp import TDVPEngine
    from pytdscf_tpu.models.holstein import singlet_fission_chain

    basis, ham = singlet_fission_chain(n_left=3, n_right=4)
    phys = [b.nprim for b in basis]
    ham.fused_mpo(phys)
    vecs = []
    for i, b in enumerate(basis):
        v = np.zeros(b.nprim, complex)
        v[1 if i == 3 else 0] = 1.0
        vecs.append(v)
    for scan in (False, True):
        cfg = Config(jobname=f"kst{scan}", scan_sweep=scan,
                     per_site_telemetry=True, max_krylov=8)
        eng = TDVPEngine(
            [alloc_hartree_product(phys, 6, vecs)], ham, cfg
        )
        eng.propagate(0.05)
        site = eng.krylov_site_stats(reset=False)
        avg, calls, capped = eng.krylov_stats()
        assert site.shape == (len(basis), 3)
        assert site[:, 1].sum() == calls
        assert site[:, 0].sum() == round(avg * calls)
        # interior sites each ran H+K solves in both half-sweeps
        assert (site[1:-1, 1] >= 2).all()
