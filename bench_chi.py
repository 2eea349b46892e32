"""North-star benchmark: radical-pair Liouville-space MPDO at large χ.

The reference's headline claim is "benchmarking for bond dimension > 1000"
on the radical-pair spin-dynamics MPDO (README.md:90-96, JCP 164, 084101
(2026); workflow ``/root/reference/docs/notebook/radicalpair-liouville.ipynb``).
This bench builds the same physics — two radical electrons (one 16-dim
Liouville site) hyperfine-coupled to a register of nuclear spins (4-dim
Liouville sites each), isotropic hyperfine + Zeeman + exchange + Haberkorn
recombination — and times the 1-site TDVP sweep at a FIXED bond dimension χ
with the non-Hermitian short-iterative Arnoldi integrator, complex64, on one
TPU chip.  This is the regime where the (χ·d·χ) effective-operator einsums
saturate the MXU.

Prints ONE JSON line with sec/step and a sustained-TFLOP/s estimate.

Env knobs:
  BENCH_CHI    — bond dimension (default 1024)
  BENCH_NNUC   — nuclear spins per radical (default 6 → 13 sites)
  BENCH_STEPS  — timed steps (default 3)
  BENCH_DT_NS  — step size in ns (default 0.5, the notebook value)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


SCALE = 1.0e-09  # time unit = 1 ns (the reference notebook's SCALE)
GAMMA_E = -0.176085963  # rad/(mT·ns) electron gyromagnetic ratio
GAMMA_H = 2.6752e-04    # 1H, rad/(mT·ns)
GAMMA_N = -1.9331e-05   # 14N, rad/(mT·ns)


def _spin_half():
    sx = np.array([[0, 1], [1, 0]], dtype=complex) / 2
    sy = np.array([[0, -1j], [1j, 0]], dtype=complex) / 2
    sz = np.array([[1, 0], [0, -1]], dtype=complex) / 2
    return sx, sy, sz


def build_radical_pair_mpo(n_nuc: int, ele_site: int):
    """Liouvillian MPO: H_eff with exp(-i·H_eff·t) ≡ exp(L·t).

    Sites 0..n_nuc-1: radical-1 nuclear spins (1H); site ``ele_site``:
    two-electron pair (4² Liouville); sites ele_site+1..: radical-2 nuclear
    spins (14N).  Same term structure as the reference notebook (hyperfine,
    Zeeman, exchange, Haberkorn singlet/triplet sinks).
    """
    from pytdscf_tpu.operators.symbolic import (
        AssignManager,
        OpSite,
        SumOfProducts,
        get_eye_site,
    )

    sx, sy, sz = _spin_half()
    e2 = np.eye(2)
    # two-electron operators on the 4-dim electron-pair Hilbert space
    S1 = [np.kron(m, e2) for m in (sx, sy, sz)]
    S2 = [np.kron(e2, m) for m in (sx, sy, sz)]
    S1S2 = sum(a @ b for a, b in zip(S1, S2))
    Qs = 0.25 * np.eye(4) - S1S2  # singlet projector
    Qt = np.eye(4) - Qs

    # Row-major vectorisation (the convention of this engine's trace/RDMs):
    # vec(AρB) = (A ⊗ Bᵀ)·vec(ρ), so left-multiplication is op ⊗ 1 and
    # right-multiplication is 1 ⊗ opᵀ; H_eff = H⊗1 − 1⊗Hᵀ.
    def Lm(op):
        return np.kron(op, np.eye(op.shape[0], dtype=complex))

    def Rm(op):
        return np.kron(np.eye(op.shape[0], dtype=complex), op.T)

    nsite = 2 * n_nuc + 1
    A1, A2 = 0.4, 0.5        # mT isotropic hyperfine (notebook small case)
    B0 = 0.2                  # mT, along z
    J = 0.1                   # mT exchange
    kS = kT = 1.0e06 * SCALE  # Haberkorn rates, s⁻¹ → ns⁻¹

    sop = SumOfProducts()
    O = lambda n, s, v: OpSite(n, s, value=v)  # noqa: E731

    paul = (sx, sy, sz)
    for j in range(nsite):
        if j == ele_site:
            continue
        i_rad = 0 if j < ele_site else 1
        # hyperfine ω = A·|γ_e| in rad/ns (the notebook's subs convention)
        A = (A1 if i_rad == 0 else A2) * abs(GAMMA_E)
        Se = S1 if i_rad == 0 else S2
        for k in range(3):
            sop += A * (
                O(f"LS{k}{i_rad}", ele_site, Lm(Se[k]))
                * O(f"LI{k}{j}", j, Lm(paul[k]))
            )
            sop -= A * (
                O(f"RS{k}{i_rad}", ele_site, Rm(Se[k]))
                * O(f"RI{k}{j}", j, Rm(paul[k]))
            )
        gn = GAMMA_H if i_rad == 0 else GAMMA_N
        sop += (-B0 * gn) * O(f"LIz{j}", j, Lm(paul[2]))
        sop -= (-B0 * gn) * O(f"RIz{j}", j, Rm(paul[2]))
    for i_rad, Se in enumerate((S1, S2)):
        sop += (-B0 * GAMMA_E) * O(f"LSz{i_rad}", ele_site, Lm(Se[2]))
        sop -= (-B0 * GAMMA_E) * O(f"RSz{i_rad}", ele_site, Rm(Se[2]))
    # exchange −J(2 S₁·S₂ + ½)
    Jx = -J * abs(GAMMA_E)
    sop += Jx * O("LSS", ele_site, Lm(2 * S1S2 + 0.5 * np.eye(4)))
    sop -= Jx * O("RSS", ele_site, Rm(2 * S1S2 + 0.5 * np.eye(4)))
    # Haberkorn −(k/2){Q, ρ}: H_eff += −i(k/2)(Q⊗1 + 1⊗Qᵀ)
    for kk, Q, tag in ((kS, Qs, "s"), (kT, Qt, "t")):
        sop += (-0.5j * kk) * O(f"LQ{tag}", ele_site, Lm(Q))
        sop += (-0.5j * kk) * O(f"RQ{tag}", ele_site, Rm(Q))
    # spectator identities define every site
    eye_prod = get_eye_site(0, 4)
    for s in range(1, nsite):
        eye_prod = eye_prod * get_eye_site(s, 16 if s == ele_site else 4)
    sop += 0.0 * eye_prod
    am = AssignManager(sop.simplify())
    am.assign()
    return am.numerical_mpo()


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from pytdscf_tpu import units
    from pytdscf_tpu.config import Config
    from pytdscf_tpu.model import Model
    from pytdscf_tpu.basis import Exciton
    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.mps.tdvp import TDVPEngine

    chi = int(os.environ.get("BENCH_CHI", "1024"))
    n_nuc = int(os.environ.get("BENCH_NNUC", "6"))
    steps = int(os.environ.get("BENCH_STEPS", "3"))
    dt_ns = float(os.environ.get("BENCH_DT_NS", "0.5"))

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    dtype = "complex64" if on_tpu else "complex128"
    ele_site = n_nuc
    nsite = 2 * n_nuc + 1
    log(f"bench_chi: platform={platform} dtype={dtype} chi={chi} "
        f"sites={nsite} (ele at {ele_site})")

    t0 = time.time()
    mpo = build_radical_pair_mpo(n_nuc, ele_site)
    basis = [Exciton(nstate=16 if s == ele_site else 4) for s in range(nsite)]
    model = Model(basis, {"hamiltonian": mpo}, space="liouville", bond_dim=chi)
    phys = [b.nprim for b in basis]
    fused = model.hamiltonian.fused_mpo(phys)[0][0]
    log(f"bench_chi: MPO fused in {time.time() - t0:.1f} s; bond dims "
        f"{[w.shape[0] for w in fused] + [1]}")

    # singlet electron pair ⊗ maximally mixed nuclear register
    sx, sy, sz = _spin_half()
    S1S2 = sum(
        np.kron(m, np.eye(2)) @ np.kron(np.eye(2), m) for m in (sx, sy, sz)
    )
    Qs = 0.25 * np.eye(4) - S1S2
    vecs = [
        (Qs if s == ele_site else np.eye(2)).reshape(-1).astype(complex)
        for s in range(nsite)
    ]
    # liouville normalisation: trace 1
    vecs = [
        v / np.trace(v.reshape(int(np.sqrt(v.size)), -1)) for v in vecs
    ]
    cores = [alloc_hartree_product(phys, chi, vecs, space="liouville")]
    bonds = [c.shape[2] for c in cores[0][:-1]]
    log(f"bench_chi: MPS bond dims {bonds}")

    config = Config(
        jobname="bench_chi",
        integrator="arnoldi",
        conserve_norm=False,
        space="liouville",
        thresh_exp=1.0e-06 if on_tpu else 1.0e-09,
        max_krylov=int(os.environ.get("BENCH_KRYLOV", "12")),
        dtype=dtype,
    )
    engine = TDVPEngine(cores, model.hamiltonian, config)
    # frequencies are in rad/ns, so the time unit IS the ns: dt = dt_ns
    dt_au = dt_ns * 1e-9 / SCALE
    del units  # (time axis is in scaled units, not fs)

    t0 = time.time()
    engine.propagate(dt_au)
    engine.cores[0][0].block_until_ready()
    log(f"bench_chi: warmup (compile) {time.time() - t0:.1f} s")

    t0 = time.time()
    for _ in range(steps):
        engine.propagate(dt_au)
    engine.cores[0][0].block_until_ready()
    sec_per_step = (time.time() - t0) / steps
    avg_k, calls, capped = engine.krylov_stats()
    trace = engine.trace().real
    log(f"bench_chi: {sec_per_step:.3f} s/step over {steps} steps "
        f"(AVG Krylov {avg_k:.2f}, cap hits {capped}, trace {trace:.6f})")

    # FLOP estimate: per Krylov iteration at site p, heff_apply costs
    # ~ 8·(D_l² D_r w n + D_l D_r² w n + D_l D_r w² n²) complex MACs
    # (three-stage contraction); K-step analogous on (D, D).
    flop_site = 0.0
    Ds = [1] + bonds + [1]
    for p in range(nsite):
        dl, dr, n = Ds[p], Ds[p + 1], phys[p]
        w1, w2 = fused[p].shape[0], fused[p].shape[-1]
        flop_site += 8.0 * n * dl * dr * (dl * w1 + dr * w2 + n * w1 * w2)
    flops_step = 2 * flop_site * max(avg_k, 1.0)  # two half-sweeps
    tflops = flops_step / sec_per_step / 1e12
    log(f"bench_chi: ~{tflops:.1f} sustained TFLOP/s (H-matvec estimate)")

    print(json.dumps({
        "metric": f"radical_pair_mpdo_chi{chi}_tdvp_sec_per_step",
        "value": round(sec_per_step, 4),
        "unit": "s/step",
        "vs_baseline": round(tflops, 2),
    }))


if __name__ == "__main__":
    main()
