"""Bond-dimension (χ) tensor parallelism: sharded state, serial numerics.

The BondTPEngine places the TDVP state with NamedShardings over a "tp"
mesh and lets XLA's SPMD partitioner distribute the unmodified site-step
programs (parallel/bond_tp.py).  These tests run on the virtual 8-device
CPU mesh (conftest.py) and assert (a) numerics identical to the serial
engine to reduction-order tolerance, (b) the state is genuinely sharded
(per-device bytes ≈ total/P), for both the Hermitian/Lanczos MPS path and
the north-star non-Hermitian Liouville-MPDO/Arnoldi path.
"""

import jax
import numpy as np
import pytest

from pytdscf_tpu.config import Config
from pytdscf_tpu.mps.lattice import alloc_hartree_product
from pytdscf_tpu.mps.tdvp import TDVPEngine
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator
from pytdscf_tpu.parallel import make_mesh
from pytdscf_tpu.parallel.bond_tp import (
    BondTPEngine,
    state_bytes_per_device,
    tp_spec,
)


def _coupled_boson_chain(nsite: int, nlev: int):
    """Anharmonic coupled-boson TensorHamiltonian (same family as the
    dryrun's chain-sharded observable check)."""
    from pytdscf_tpu.basis import Boson

    nmat = Boson(nlev).get_number_matrix()
    qmat = Boson(nlev).get_q_matrix()
    pot = {
        (s, s): TensorOperator(
            mpo=[(0.01 * (s + 1) * nmat)[None, :, :, None]], legs=(s, s)
        )
        for s in range(nsite)
    }
    for s in range(nsite - 1):
        pot[(s, s, s + 1, s + 1)] = TensorOperator(
            mpo=[(0.02 * qmat)[None, :, :, None], qmat[None, :, :, None]],
            legs=(s, s, s + 1, s + 1),
        )
    return TensorHamiltonian(nsite, [[pot]], kinetic=None)


def _random_cores(nsite, nlev, bond, seed=3):
    rng = np.random.default_rng(seed)
    return alloc_hartree_product(
        [nlev] * nsite, bond,
        [rng.normal(size=nlev) + 1j * rng.normal(size=nlev)
         for _ in range(nsite)],
    )


def test_tp_spec_picks_largest_divisible_bond_axis():
    assert tp_spec((16, 4, 16), 4, "tp", bond_axes=(0, 2))[2] == "tp"
    assert tp_spec((16, 4, 9), 4, "tp", bond_axes=(0, 2))[0] == "tp"
    # nothing divisible -> fully replicated
    assert tp_spec((9, 4, 9), 4, "tp", bond_axes=(0, 2)) == \
        jax.sharding.PartitionSpec(None, None, None)
    # physical axis never sharded even when divisible
    assert tp_spec((9, 4, 9), 4, "tp", bond_axes=(0, 2)) == \
        jax.sharding.PartitionSpec(None, None, None)


def test_bond_tp_matches_serial_hilbert():
    nsite, nlev, bond, P = 6, 4, 16, 4
    ham = _coupled_boson_chain(nsite, nlev)
    cores = _random_cores(nsite, nlev, bond)
    cfg = Config(jobname="tp_h", thresh_exp=1e-10, scan_sweep=False)

    ser = TDVPEngine([[c.copy() for c in cores]], ham, cfg)
    ser.right_canonicalize()
    mesh = make_mesh({"tp": P})
    tp = BondTPEngine([[c.copy() for c in cores]], ham, cfg, mesh)
    tp.right_canonicalize()

    # bulk cores really live sharded on the mesh
    spec = tp.cores[0][2].sharding.spec
    assert "tp" in tuple(spec), spec

    for _ in range(3):
        ser.propagate(0.05)
        tp.propagate(0.05)

    e_s = complex(ser.expectation())
    e_t = complex(tp.expectation())
    assert abs(e_s - e_t) < 1e-10 * max(1.0, abs(e_s)), (e_s, e_t)
    n_s, n_t = ser.norm(), tp.norm()
    assert abs(n_s - n_t) < 1e-11, (n_s, n_t)
    r_s = np.asarray(ser.reduced_density((2,)))
    r_t = np.asarray(tp.reduced_density((2,)))
    assert np.max(np.abs(r_s - r_t)) < 1e-11

    # the resident state is genuinely distributed: per-device bytes well
    # under the total (bulk cores + env blocks shard /P; edges replicate)
    total, per_dev = state_bytes_per_device(tp)
    t2, p2 = state_bytes_per_device(ser)
    assert t2 == p2  # serial: everything on the one device
    assert per_dev < 0.45 * total, (per_dev, total)


def test_bond_tp_mpdo_arnoldi_matches_serial():
    """North-star workload class: Liouville MPDO + Arnoldi, χ-sharded."""
    from pytdscf_tpu.models.radical_pair import (
        radical_pair_liouvillian,
        singlet_product_state,
    )
    from pytdscf_tpu.model import Model
    from pytdscf_tpu.mps.lattice import bond_dims_for_site

    hfc = [0.2, 0.3]
    basis, mpo, ele_site = radical_pair_liouvillian(
        hfcs_1=[(2, a) for a in hfc], hfcs_2=[(2, a) for a in hfc],
        split_electron=True,
    )
    mpo = Model(
        basis, {"hamiltonian": mpo}, space="liouville", bond_dim=16
    ).hamiltonian
    phys = [b.nstate for b in basis]
    vecs = singlet_product_state(basis, ele_site, split_electron=True)
    cores = alloc_hartree_product(phys, 4, vecs, space="liouville")
    bond = 16
    rng = np.random.default_rng(11)
    full = []
    for p, c in enumerate(cores):
        m_l, m_r = bond_dims_for_site(phys, p, bond)
        fc = np.zeros((m_l, phys[p], m_r), dtype=complex)
        fc[: c.shape[0], :, : c.shape[2]] = c
        fc += 1e-5 * (rng.normal(size=fc.shape) + 1j * rng.normal(size=fc.shape))
        full.append(fc)
    cfg = Config(
        jobname="tp_mpdo", space="liouville", integrator="arnoldi",
        conserve_norm=False, thresh_exp=1e-10, max_krylov=12,
        scan_sweep=False,
    )
    ser = TDVPEngine([[c.copy() for c in full]], mpo, cfg)
    ser.right_canonicalize()
    mesh = make_mesh({"tp": 4})
    tp = BondTPEngine([[c.copy() for c in full]], mpo, cfg, mesh)
    tp.right_canonicalize()
    for _ in range(2):
        ser.propagate(0.2)
        tp.propagate(0.2)
    tr_s = complex(ser.trace(0))
    tr_t = complex(tp.trace(0))
    assert abs(tr_s - tr_t) < 1e-11, (tr_s, tr_t)
    legs = (0,) * ele_site + (2, 2)
    rdm_s = np.asarray(ser.reduced_density_liouville(legs, 0))
    rdm_t = np.asarray(tp.reduced_density_liouville(legs, 0))
    assert np.max(np.abs(rdm_s - rdm_t)) < 1e-11


def _radical_pair_case(n_nuc: int, chi: int, seed: int = 11):
    """(model hamiltonian, χ-noise-filled MPDO cores, ele_site) for the
    split-electron radical-pair Liouvillian — the bench_chi recipe."""
    from pytdscf_tpu.model import Model
    from pytdscf_tpu.models.radical_pair import (
        radical_pair_liouvillian,
        singlet_product_state,
    )
    from pytdscf_tpu.mps.lattice import bond_dims_for_site

    hfc = [round(0.15 + 0.07 * k, 4) for k in range(n_nuc)]
    basis, mpo, ele_site = radical_pair_liouvillian(
        hfcs_1=[(2, a) for a in hfc], hfcs_2=[(2, a) for a in hfc],
        split_electron=True,
    )
    ham = Model(
        basis, {"hamiltonian": mpo}, space="liouville", bond_dim=chi
    ).hamiltonian
    phys = [b.nstate for b in basis]
    vecs = singlet_product_state(basis, ele_site, split_electron=True)
    cores = alloc_hartree_product(phys, 4, vecs, space="liouville")
    rng = np.random.default_rng(seed)
    full = []
    for p, c in enumerate(cores):
        m_l, m_r = bond_dims_for_site(phys, p, chi)
        fc = np.zeros((m_l, phys[p], m_r), dtype=complex)
        fc[: c.shape[0], :, : c.shape[2]] = c
        fc += 1e-5 * (
            rng.normal(size=fc.shape) + 1j * rng.normal(size=fc.shape)
        )
        full.append(fc)
    return ham, full, ele_site


def test_bond_tp_chi256_arnoldi_mpdo_matches_serial():
    """χ=256 Liouville-MPDO runtime parity — the largest χ the virtual
    CPU mesh executes in test time (VERDICT r4 #1; the χ=4096 capacity
    claim itself is certified by AOT `memory_analysis` in
    scripts/bond_tp_memcheck.py and the driver dryrun).  Exercises the
    χ-sharded chain kernels (heff/keff/renorm `*_tp`) at a bond where
    the (χ,w,d,χ) chain transients dwarf the cores, with CholeskyQR
    gauge bonds ≥ 192."""
    ham, full, ele_site = _radical_pair_case(n_nuc=3, chi=256)
    cfg = Config(
        jobname="tp_chi256", space="liouville", integrator="arnoldi",
        conserve_norm=False, thresh_exp=1e-10, max_krylov=10,
        scan_sweep=False,
    )
    ser = TDVPEngine([[c.copy() for c in full]], ham, cfg)
    ser.right_canonicalize()
    mesh = make_mesh({"tp": 4})
    tp = BondTPEngine([[c.copy() for c in full]], ham, cfg, mesh)
    tp.right_canonicalize()
    # the 256-bond bulk cores genuinely live sharded (left bond)
    mid = len(full) // 2
    assert "tp" in tuple(tp.cores[0][mid].sharding.spec)
    ser.propagate(0.2)
    tp.propagate(0.2)
    tr_s = complex(ser.trace(0))
    tr_t = complex(tp.trace(0))
    assert abs(tr_s - tr_t) < 1e-10, (tr_s, tr_t)
    legs = (0,) * ele_site + (2, 2)
    rdm_s = np.asarray(ser.reduced_density_liouville(legs, 0))
    rdm_t = np.asarray(tp.reduced_density_liouville(legs, 0))
    assert np.max(np.abs(rdm_s - rdm_t)) < 1e-10
    total, per_dev = state_bytes_per_device(tp)
    assert per_dev < 0.45 * total, (per_dev, total)


def test_bond_tp_relaxed_krylov_matches_serial():
    """Relaxed (bf16-pass) Krylov under bond-TP: the shipping large-χ
    matvec config routes through the planar `heff_apply_lo(tp_c=...)`
    chain; parity vs the serial engine running the IDENTICAL relaxed
    algorithm (differences are cross-device f32 reduction order only)."""
    ham, full, ele_site = _radical_pair_case(n_nuc=2, chi=16)
    cfg = Config(
        jobname="tp_relaxed", space="liouville", integrator="arnoldi",
        conserve_norm=False, thresh_exp=1e-8, max_krylov=10,
        scan_sweep=False, krylov_relaxed=True, relax_after=1,
    )
    ser = TDVPEngine([[c.copy() for c in full]], ham, cfg)
    ser.right_canonicalize()
    mesh = make_mesh({"tp": 4})
    tp = BondTPEngine([[c.copy() for c in full]], ham, cfg, mesh)
    tp.right_canonicalize()
    for _ in range(2):
        ser.propagate(0.2)
        tp.propagate(0.2)
    tr_s, tr_t = complex(ser.trace(0)), complex(tp.trace(0))
    # bf16 matvec passes: identical rounding except cross-device
    # accumulation order of the f32 partial sums
    assert abs(tr_s - tr_t) < 5e-6, (tr_s, tr_t)
    legs = (0,) * ele_site + (2, 2)
    rdm_s = np.asarray(ser.reduced_density_liouville(legs, 0))
    rdm_t = np.asarray(tp.reduced_density_liouville(legs, 0))
    assert np.max(np.abs(rdm_s - rdm_t)) < 5e-6


def test_simulator_bond_tp_matches_serial(tmp_path):
    """End-to-end ``Simulator.propagate(bond_tp_devices=...)``: the χ-axis
    parallelism is a driver feature (dat export, checkpoints), not a
    library demo, and numerics match the serial driver to reduction
    order (unlike the chain axis there is no splitting error)."""
    import os

    from pytdscf_tpu.simulator import Simulator
    from tests.test_simulator_parallel import _model, _read_dat

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    os.chdir(tmp_path)
    nsteps = 4
    e_s, _ = Simulator("bser", _model(), verbose=0).propagate(
        stepsize=0.2, maxstep=nsteps, loadfile_ext="", autocorr=True,
    )
    e_t, _ = Simulator("btp", _model(), verbose=0).propagate(
        stepsize=0.2, maxstep=nsteps, loadfile_ext="", autocorr=True,
        bond_tp_devices=2,
    )
    assert e_t == pytest.approx(e_s, abs=1e-8)
    for name in ("autocorr", "populations"):
        ser = _read_dat(f"bser_prop/{name}.dat")
        par = _read_dat(f"btp_prop/{name}.dat")
        assert ser.shape == par.shape, name
        np.testing.assert_allclose(par, ser, atol=1e-8, err_msg=name)
    assert os.path.exists("wf_btp.pkl")


def test_simulator_bond_tp_validates(tmp_path):
    import os

    from pytdscf_tpu.simulator import Simulator
    from tests.test_simulator_parallel import _model

    os.chdir(tmp_path)
    sim = Simulator("btp_bad", _model(), verbose=0)
    with pytest.raises(ValueError):
        sim.propagate(maxstep=1, loadfile_ext="", bond_tp_devices=1)
    with pytest.raises(NotImplementedError):
        sim.propagate(
            maxstep=1, loadfile_ext="", bond_tp_devices=2,
            parallel_split_indices=[(0, 1), (2, 3)],
        )
    with pytest.raises(NotImplementedError):
        sim.propagate(
            maxstep=1, loadfile_ext="",
            bond_tp_devices=10_000,  # more than any test mesh has
        )


def test_bond_tp_rejects_retracing_adaptive():
    nsite, nlev, bond = 4, 3, 6
    ham = _coupled_boson_chain(nsite, nlev)
    cores = _random_cores(nsite, nlev, bond)
    cfg = Config(jobname="tp_bad", adaptive=True, adaptive_masked=False)
    with pytest.raises(NotImplementedError):
        BondTPEngine([cores], ham, cfg, make_mesh({"tp": 2}))


def test_bond_tp_with_tuple_rows_krylov(monkeypatch):
    """The tuple-of-rows Krylov loops (auto-on at n ≥ 2^20 in production)
    must survive GSPMD partitioning: force them on at small n and check
    the χ-sharded engine still matches serial — the lax.switch row swaps
    and fused per-row GS chains have to partition like the buffer form."""
    import pytdscf_tpu.mps.integrator as I

    monkeypatch.setattr(I, "GS_ROWS_MIN_N", 1)
    nsite, nlev, bond, P = 6, 4, 16, 4
    ham = _coupled_boson_chain(nsite, nlev)
    cores = _random_cores(nsite, nlev, bond)
    for integ in ("lanczos", "arnoldi"):
        cfg = Config(
            jobname=f"tp_rows_{integ}", thresh_exp=1e-10,
            scan_sweep=False, integrator=integ,
            conserve_norm=integ == "lanczos",
        )
        ser = TDVPEngine([[c.copy() for c in cores]], ham, cfg)
        ser.right_canonicalize()
        tp = BondTPEngine(
            [[c.copy() for c in cores]], ham, cfg, make_mesh({"tp": P})
        )
        tp.right_canonicalize()
        for _ in range(2):
            ser.propagate(0.05)
            tp.propagate(0.05)
        e_s = complex(ser.expectation())
        e_t = complex(tp.expectation())
        assert abs(e_s - e_t) < 1e-9 * max(1.0, abs(e_s)), (integ, e_s, e_t)
