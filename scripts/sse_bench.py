"""SSE ensemble benchmark: batched shard_map program vs serial trajectory loop.

The reference's SSE workflow (``docs/notebook/radicalpair-sse.ipynb``)
propagates wavefunction trajectories one full simulator run at a time; the
TPU-native design batches the whole ensemble through the MXU
(`parallel.batched.batched_sse_propagate`).  This script measures both on
the active backend and prints one JSON line.

Env knobs: BENCH_TRAJ (64), BENCH_BD (32), BENCH_STEPS (10), BENCH_NNUC (3),
BENCH_SERIAL_TRAJ (#trajectories actually timed on the serial path,
default 4 — it is extrapolated linearly, the loop is embarrassingly serial).

CPU smoke:
  BENCH_TRAJ=8 BENCH_BD=8 BENCH_STEPS=2 JAX_PLATFORMS=cpu \
      python scripts/sse_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
else:
    import jax

from pytdscf_tpu.config import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from pytdscf_tpu.model import Model  # noqa: E402
from pytdscf_tpu.models.radical_pair import (  # noqa: E402
    radical_pair_hamiltonian,
    spin_coherent_weights,
)
from pytdscf_tpu.mps import device_io as dio  # noqa: E402
from pytdscf_tpu.mps import functional as F  # noqa: E402
from pytdscf_tpu.mps.lattice import alloc_hartree_product  # noqa: E402
from pytdscf_tpu.parallel import batched_sse_propagate, make_mesh  # noqa: E402

NTRAJ = int(os.environ.get("BENCH_TRAJ", "64"))
BD = int(os.environ.get("BENCH_BD", "32"))
NSTEP = int(os.environ.get("BENCH_STEPS", "10"))
NNUC = int(os.environ.get("BENCH_NNUC", "3"))
NSER = min(NTRAJ, int(os.environ.get("BENCH_SERIAL_TRAJ", "4")))
DT = 0.5  # ns

SINGLET = np.array([0.0, 1 / np.sqrt(2), -1 / np.sqrt(2), 0.0])


def log(msg: str) -> None:
    print(f"sse_bench: {msg}", file=sys.stderr, flush=True)


@jax.jit
def _trace_last(rdms):
    # complex eager dispatches/transfers are UNIMPLEMENTED on this TPU —
    # reduce to a real scalar INSIDE a jitted program before fetching.
    return jnp.trace(rdms[-1]).real


def main() -> None:
    on_tpu = jax.devices()[0].platform == "tpu"
    cdtype = jnp.complex64 if on_tpu else (
        jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
    )
    basis, mpo, ele_site = radical_pair_hamiltonian(
        hfcs_1=[(2, 0.4)] * NNUC, hfcs_2=[(2, 0.5)] * NNUC
    )
    phys = [b.nstate for b in basis]
    model = Model(basis, {"hamiltonian": mpo}, bond_dim=BD)
    fused = model.hamiltonian.fused_mpo(phys)[0][0]
    Ws = tuple(dio.put(np.asarray(w), cdtype) for w in fused)

    rng = np.random.default_rng(7)
    hps = []
    for _ in range(NTRAJ):
        hp = []
        for s, b in enumerate(basis):
            hp.append(
                SINGLET if s == ele_site
                else spin_coherent_weights(b.nstate, rng.random(), rng.random())
            )
        hps.append(hp)
    percore = [alloc_hartree_product(phys, BD, hp) for hp in hps]
    hstacks = [np.stack([t[p] for t in percore]) for p in range(len(phys))]
    bcores = tuple(dio.put(h, cdtype) for h in hstacks)
    scale = complex(-0.5j * DT)  # converted device-side by _as_scale

    ndev = len(jax.devices())
    ndp = max(d for d in range(1, ndev + 1) if NTRAJ % d == 0)
    mesh = make_mesh({"dp": ndp})
    log(
        f"{len(phys)} sites, D={BD}, {NTRAJ} trajectories on dp={ndp}, "
        f"{NSTEP} steps, dtype={np.dtype(cdtype).name}"
    )

    # ---- batched: one program for the whole ensemble ----
    t0 = time.perf_counter()
    _, rdms = batched_sse_propagate(mesh, bcores, Ws, scale, NSTEP, ele_site)
    tr_last = float(_trace_last(rdms))  # value fetch = honest sync
    t_compile = time.perf_counter() - t0
    log(f"batched warmup (compile + run) {t_compile:.1f} s")
    t0 = time.perf_counter()
    _, rdms = batched_sse_propagate(mesh, bcores, Ws, scale, NSTEP, ele_site)
    tr2 = float(_trace_last(rdms))
    t_batched = time.perf_counter() - t0
    assert abs(tr2 - tr_last) < 1e-5
    log(
        f"batched: {t_batched:.3f} s for {NSTEP} steps x {NTRAJ} traj "
        f"({t_batched / NSTEP * 1e3:.1f} ms/ensemble-step); "
        f"survival {tr2 / NTRAJ:.6f}"
    )

    # ---- serial: one jitted per-trajectory step program, looped ----
    # Ws/scale ride as ARGUMENTS: complex device arrays closed over by a
    # new jit are constant-folded via a host fetch -> UNIMPLEMENTED here.
    @jax.jit
    def one_traj_run(cores, Ws, sc):
        def body(cs, _):
            new = F.tdvp_step(
                cs, Ws, sc, conserve_norm=False, arnoldi=True
            )
            return new, F.site_rdm(new, ele_site)

        _, rdms = jax.lax.scan(body, cores, None, length=NSTEP)
        return rdms

    scale_dev = dio.put(np.asarray(scale), cdtype)
    cores0 = tuple(dio.put(h[0], cdtype) for h in hstacks)
    tr_w = float(_trace_last(one_traj_run(cores0, Ws, scale_dev)))  # compile
    t0 = time.perf_counter()
    acc = 0.0
    for itraj in range(NSER):
        out = one_traj_run(
            tuple(dio.put(h[itraj], cdtype) for h in hstacks), Ws, scale_dev
        )
        acc += float(_trace_last(out))
    t_serial_part = time.perf_counter() - t0
    t_serial = t_serial_part / NSER * NTRAJ
    log(
        f"serial: {t_serial_part:.3f} s for {NSER} traj -> "
        f"{t_serial:.3f} s extrapolated for {NTRAJ} "
        f"(first-traj survival {tr_w:.6f})"
    )

    speedup = t_serial / t_batched
    print(json.dumps({
        "metric": "sse_ensemble_batched_speedup",
        "value": round(speedup, 2),
        "unit": f"x vs serial trajectory loop ({NTRAJ} traj, D={BD})",
        "vs_baseline": round(speedup, 2),
    }))


if __name__ == "__main__":
    main()
