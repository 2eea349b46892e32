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


def test_scan_folded_property_chains_parity():
    """The per-step autocorr (and Liouville trace) chains scan-compile
    under Config.scan_sweep (``tdvp._fold_chain``) and must reproduce the
    per-site fold to numerical identity."""
    ref = _build(scan=False)
    scn = _build(scan=True)
    for _ in range(2):
        ref.propagate(0.2)
        scn.propagate(0.2)
    b_ref = ref.properties_bundle(ref.hamiltonian)
    b_scn = scn.properties_bundle(scn.hamiltonian)
    assert b_scn["autocorr"] == pytest.approx(b_ref["autocorr"], abs=1e-12)
    assert b_scn["energy"].real == pytest.approx(
        b_ref["energy"].real, abs=1e-10
    )

    # Liouville trace chain: a small radical-pair MPDO (the trace fold
    # rides _scan_trace under scan_sweep)
    from pytdscf_tpu.model import Model
    from pytdscf_tpu.models.radical_pair import (
        radical_pair_liouvillian,
        singlet_product_state,
    )

    # 6 spin-½ nuclei on radical 1 → a uniform d=4 bulk long enough for
    # the trace fold's scan chunks to actually fire
    basis, mpo, ele_site = radical_pair_liouvillian(
        hfcs_1=[(2, 0.3 + 0.05 * k) for k in range(6)],
        hfcs_2=[(3, 0.5)],
    )
    model = Model(basis, {"hamiltonian": mpo}, space="liouville", bond_dim=8)
    vecs = singlet_product_state(basis, ele_site)
    cores = alloc_hartree_product([b.nprim for b in basis], 8, vecs)
    trace_ref = None
    for scan in (False, True):
        cfg = Config(
            jobname=f"tr{scan}", space="liouville", integrator="arnoldi",
            conserve_norm=False, scan_sweep=scan, scan_chunk=4,
            thresh_exp=1e-08,
        )
        eng = TDVPEngine([list(cores)], model.hamiltonian, cfg)
        eng.propagate(0.5)
        out = eng.properties_bundle(
            model.hamiltonian, autocorr=False, populations=False
        )
        if scan:
            assert out["trace"] == pytest.approx(trace_ref, abs=1e-12)
        else:
            trace_ref = out["trace"]


def test_fold_chain_unit():
    """_fold_chain emits chunk / half-chunk / per-site pieces whose
    composition is identical to the plain per-site fold, with and
    without per-site aux constants."""
    import jax.numpy as jnp

    from pytdscf_tpu.mps.tdvp import _fold_chain, _scan_ovlp_noconj

    rng = np.random.default_rng(7)

    def core(l, n, r):
        return jnp.asarray(
            rng.normal(size=(l, n, r)) + 1j * rng.normal(size=(l, n, r))
        )

    # ramp + uniform run of 11 (chunk 4 → 2 chunks + half + 1 per-site)
    chain = [core(1, 3, 5)] + [core(5, 3, 5) for _ in range(11)] + [
        core(5, 2, 5), core(5, 3, 1)
    ]
    S0 = jnp.ones((1, 1), chain[0].dtype)
    ref = S0
    for c in chain:
        ref = np.einsum("lk,lnr,kns->rs", ref, c, c)
    got = _fold_chain(
        chain, S0,
        lambda S_, c: jnp.einsum("lk,lnr,kns->rs", S_, c, c),
        lambda S_, st: _scan_ovlp_noconj(S_, st),
        4,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-12)

    # aux variant: per-site weight vectors folding a trace-like chain
    from pytdscf_tpu.mps.tdvp import _scan_trace

    chain2 = [core(1, 4, 6)] + [core(6, 4, 6) for _ in range(9)] + [
        core(6, 4, 1)
    ]
    # aux contract: one value per core SHAPE (a run shares its first
    # site's aux) — exactly how the trace weights behave
    w4 = jnp.asarray(rng.normal(size=(4,)) + 0j)
    ws = [w4 for _ in chain2]
    S0 = jnp.ones((1, 1), chain2[0].dtype)
    ref2 = S0
    for c, w in zip(chain2, ws):
        ref2 = np.einsum("lk,lnr,n->rk", ref2, c, w)
    got2 = _fold_chain(
        chain2, S0,
        lambda S_, c, w: jnp.einsum("lk,lnr,n->rk", S_, c, w),
        _scan_trace,
        4,
        aux=ws,
    )
    np.testing.assert_allclose(np.asarray(got2), ref2, rtol=1e-12)


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
