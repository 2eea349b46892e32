"""Prove bond-TP partitions the χ=4096 MPDO below per-device HBM — by AOT.

The single-chip ceiling for the 14-site radical-pair Liouville MPDO is
χ=3072 (χ=4096 needs 18.53 GB vs the v5e's 15.75 GB — BASELINE.md round-4
ladder).  `parallel/bond_tp.py` exists to break that ceiling, but until
round 5 every correctness check ran at toy bonds.  This script compiles
the REAL χ=4096 site-step program — the exact `_site_step` the engine
dispatches, with the exact bench_chi χ=4096 static config — under
BondTPEngine's `tp_spec` shardings on a virtual CPU mesh, then reads
`compiled.memory_analysis()` (per-device numbers) and the collective ops
from the optimized HLO.  No 18 GB of state is ever materialised: inputs
are `jax.ShapeDtypeStruct`s carrying NamedShardings.

Checked claims (asserted, exit 1 on failure):
  * per-device peak = sharded resident state + XLA temp + outputs
    < 15.75 GB on a 2-device mesh (and with margin on 4);
  * the big transients (Krylov rows, heff chain, CholeskyQR Gram)
    genuinely shard: temp bytes shrink ≈ P× going 2 → 4 devices.

Usage:  python scripts/bond_tp_memcheck.py [--chi 4096] [--devices 2 4]
The same check runs (at reduced size) inside `__graft_entry__.dryrun_multichip`
so every round's MULTICHIP artifact certifies it.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import jax  # backend not initialized until first use
import numpy as np

HBM_BYTES = 15.75 * 2**30  # TPU v5e


def _standalone_init() -> None:
    """Pin an 8-virtual-device CPU backend (standalone runs only — when
    imported by ``__graft_entry__.dryrun_multichip`` the host already set
    the platform up and config mutation here would leak)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def build_site_step_case(chi: int, nshard: int, *, n_nuc: int = 6,
                         krylov: int = 6, site: int | None = None,
                         forward: bool = True, last: bool = False):
    """(jitted fn, abstract args, static kwargs, mesh) for the real mid-chain
    site step of the 14-site split-electron radical-pair MPDO at bond χ.

    Mirrors bench_chi.py's χ=4096 configuration: Arnoldi, relaxed Krylov
    with relax_after=1, bf16x3 matvec+env precision, einsum matvec path
    (the pallas kernel's VMEM guard rejects χ=4096 shapes —
    `pallas_matvec.heff_shapes_ok` — and a pallas_call would not be
    GSPMD-partitionable anyway), per-site programs (BENCH_SCAN=0).
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytdscf_tpu.model import Model
    from pytdscf_tpu.models.radical_pair import radical_pair_liouvillian
    from pytdscf_tpu.mps.lattice import bond_dims_for_site
    from pytdscf_tpu.mps.tdvp import _site_step
    from pytdscf_tpu.parallel import make_mesh
    from pytdscf_tpu.parallel.bond_tp import tp_spec

    hfc = [round(0.15 + 0.07 * k, 4) for k in range(n_nuc)]
    basis, mpo, _ele = radical_pair_liouvillian(
        hfcs_1=[(2, a) for a in hfc], hfcs_2=[(2, a) for a in hfc],
        split_electron=True,
    )
    phys = [b.nstate for b in basis]
    nsite = len(phys)
    model = Model(basis, {"hamiltonian": mpo}, space="liouville",
                  bond_dim=chi)
    Ws = model.hamiltonian.fused_mpo(phys)[0][0]

    if site is None:
        site = nsite // 2
    p = site
    mesh = make_mesh({"tp": nshard})
    cdtype = jnp.complex64
    rdtype = jnp.float32

    def shaped(shape, *, bond_axes=None, dtype=cdtype, prefer="right"):
        spec = tp_spec(shape, nshard, "tp", bond_axes=bond_axes,
                       prefer=prefer)
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, spec)
        )

    def rep(shape, dtype=cdtype):
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, P())
        )

    ml, mr = bond_dims_for_site(phys, p, chi)
    q = p + 1 if forward else p - 1
    nl, nr = bond_dims_for_site(phys, q, chi)
    w_p = Ws[p].shape
    # env blocks: (χ_bra, w, χ_ket) on both sides of site p
    wl = Ws[p].shape[0]
    wr = Ws[p].shape[3]

    psis = (shaped((ml, phys[p], mr), bond_axes=(0, 2), prefer="left"),)
    nxt = None if last else (
        shaped((nl, phys[q], nr), bond_axes=(0, 2), prefer="left"),
    )
    Lb = (shaped((ml, wl, ml), bond_axes=(0, 2)),)
    Rb = (shaped((mr, wr, mr), bond_axes=(0, 2)),)
    Wc = (rep(w_p),)
    scale = rep((), cdtype)
    thresh = rep((), rdtype)
    lL = (rep((), rdtype),)
    lR = (rep((), rdtype),)

    static = dict(
        pairs=((0, 0),), nstate=1, mode="prop", conserve_norm=False,
        arnoldi=True, max_dim=krylov, last=last, forward=forward,
        mv_prec="high", env_prec="high", relaxed=True, relax_after=1,
        pallas=False, pallas_small=False, pallas_env=False,
        tp_mesh=mesh, tp_axis="tp",
    )
    args = (psis, nxt, Lb, Wc, Rb, scale, thresh, lL, lR)
    return _site_step, args, static, mesh, (phys, Ws, nsite)


def resident_state_bytes(phys, Ws, chi: int, nshard: int) -> tuple[int, int]:
    """(total, max-per-device) bytes of the engine-resident state at χ.

    Cores for every site + the env-stack blocks (one (χ,w,χ) block per
    chain position — during a sweep env_stack + sys_stack together hold
    ≈ nsite blocks) + replicated MPO cores, sharded per `tp_spec`.
    """
    from pytdscf_tpu.mps.lattice import bond_dims_for_site
    from pytdscf_tpu.parallel.bond_tp import tp_spec

    total = 0
    per_dev = 0
    nsite = len(phys)
    for p in range(nsite):
        ml, mr = bond_dims_for_site(phys, p, chi)
        shape = (ml, phys[p], mr)
        b = int(np.prod(shape)) * 8  # complex64
        spec = tp_spec(shape, nshard, "tp", bond_axes=(0, 2), prefer="left")
        shard = nshard if any(s == "tp" for s in spec) else 1
        total += b
        per_dev += b // shard
        # env block to the right of site p (bond mr, MPO width at p+1)
        if p < nsite - 1:
            w = Ws[p].shape[3]
            eshape = (mr, w, mr)
            eb = int(np.prod(eshape)) * 8
            espec = tp_spec(eshape, nshard, "tp", bond_axes=(0, 2))
            eshard = nshard if any(s == "tp" for s in espec) else 1
            total += eb
            per_dev += eb // eshard
    for Wc in Ws:
        total += int(np.prod(Wc.shape)) * 8
        per_dev += int(np.prod(Wc.shape)) * 8
    return total, per_dev


_DTYPE_BYTES = {"c64": 8, "c128": 16, "f64": 8, "f32": 4, "bf16": 2,
                "f16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def collective_stats(hlo: str) -> dict[str, tuple[int, int]]:
    """Per collective kind: (op count, total result bytes) from the
    optimized HLO — the per-device ICI volume of one site step (tuples
    and -start/-done forms counted once via the -start/plain def line)."""
    out: dict[str, tuple[int, int]] = {}
    for kind in ("all-gather", "all-reduce", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        count = 0
        nbytes = 0
        # result type(s) precede the op name: "  %x = c64[a,b]{...} kind("
        # or tuple results "(c64[..], f32[..]) kind("
        pat = re.compile(
            rf"=\s*(\(?[a-z0-9\[\],{{}}:\s]*?\)?)\s*{kind}(?:-start)?\(",
        )
        for mm in pat.finditer(hlo):
            count += 1
            for tm in re.finditer(
                r"(c64|c128|f64|f32|bf16|f16|s32|u32|pred|s8|u8)\[([0-9,]*)\]",
                mm.group(1),
            ):
                dims = [int(x) for x in tm.group(2).split(",") if x]
                nbytes += int(np.prod(dims)) * _DTYPE_BYTES[tm.group(1)] \
                    if dims else _DTYPE_BYTES[tm.group(1)]
        out[kind] = (count, nbytes)
    return out


def check(chi: int, nshard: int, *, last: bool = False,
          forward: bool = True, krylov: int = 6, quiet: bool = False):
    fn, args, static, mesh, (phys, Ws, nsite) = build_site_step_case(
        chi, nshard, krylov=krylov, last=last, forward=forward
    )
    lowered = fn.lower(*args, **static)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    hlo = compiled.as_text()
    coll = collective_stats(hlo)
    res_total, res_dev = resident_state_bytes(phys, Ws, chi, nshard)
    gib = 2**30
    # args are part of the resident state (this site's core/envs); don't
    # double-count them — peak = resident + temps + (new) outputs
    peak = res_dev + ma.temp_size_in_bytes + ma.output_size_in_bytes
    row = dict(
        chi=chi, devices=nshard,
        temp_gib=ma.temp_size_in_bytes / gib,
        arg_gib=ma.argument_size_in_bytes / gib,
        out_gib=ma.output_size_in_bytes / gib,
        resident_gib=res_dev / gib,
        resident_total_gib=res_total / gib,
        peak_gib=peak / gib,
        fits=bool(peak < HBM_BYTES),
        collectives=coll,
    )
    if not quiet:
        print(
            f"chi={chi} P={nshard}: per-device temp "
            f"{row['temp_gib']:.2f} GiB, args {row['arg_gib']:.2f}, "
            f"out {row['out_gib']:.2f}, resident {row['resident_gib']:.2f} "
            f"(total {row['resident_total_gib']:.2f}) -> peak "
            f"{row['peak_gib']:.2f} GiB / 15.75 "
            f"[{'FITS' if row['fits'] else 'OOM'}]  collectives: "
            + ", ".join(
                f"{k}={c} ({b / 2**20:.0f} MiB)"
                for k, (c, b) in coll.items() if c
            )
        )
    return row


def main() -> int:
    _standalone_init()
    ap = argparse.ArgumentParser()
    ap.add_argument("--chi", type=int, default=4096)
    ap.add_argument("--devices", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--krylov", type=int, default=6)
    args = ap.parse_args()

    rows = []
    for P in args.devices:
        rows.append(check(args.chi, P, krylov=args.krylov))
    ok = all(r["fits"] for r in rows)
    # sharding sanity: temps must SHRINK with the mesh (GSPMD actually
    # partitioning, not replicating) — allow slack for replicated
    # small intermediates
    if len(rows) >= 2 and rows[0]["temp_gib"] > 0.5:
        shrink = rows[0]["temp_gib"] / max(rows[-1]["temp_gib"], 1e-9)
        want = rows[-1]["devices"] / rows[0]["devices"] * 0.6
        print(f"temp shrink {rows[0]['devices']}->{rows[-1]['devices']} "
              f"devices: {shrink:.2f}x (want >= {want:.2f}x)")
        ok = ok and shrink >= want
    print("BOND-TP MEMCHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
