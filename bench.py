"""Benchmark: TDVP sec/step on the 184-site singlet-fission chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference propagates the equivalent 184-site model at
~3.23 s/step on CPU (1 MPI rank, adaptive D<=30) — BASELINE.md.  Here the
model runs at fixed bond dimension D=30 (an upper bound of the reference's
adaptive rank) on one TPU chip.  ``vs_baseline`` is the speedup factor
(baseline sec/step divided by measured sec/step; >1 means faster).

Env knobs (for smoke-testing only):
  BENCH_NL / BENCH_NR  — boson counts left/right of the exciton site
  BENCH_STEPS          — timed steps (default 3)
  BENCH_BOND           — bond dimension (default 30)
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_SEC_PER_STEP = 3.23


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    # The environment may pre-import JAX (sitecustomize), so JAX_PLATFORMS in
    # os.environ can be ignored — honor it via jax.config instead.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_enable_x64", True)
    # persistent compilation cache (platform- and, on CPU, machine-
    # fingerprint-suffixed: cross-machine XLA:CPU AOT entries can SIGILL)
    from pytdscf_tpu.config import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    warm_cache = bool(
        cache_dir and os.path.isdir(cache_dir) and os.listdir(cache_dir)
    )
    log(f"bench: compilation cache {cache_dir} "
        f"({'warm' if warm_cache else 'cold'})")

    import numpy as np

    from pytdscf_tpu.config import Config
    from pytdscf_tpu.models.holstein import singlet_fission_chain
    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.mps.tdvp import TDVPEngine
    from pytdscf_tpu import units

    n_left = int(os.environ.get("BENCH_NL", "61"))
    n_right = int(os.environ.get("BENCH_NR", "122"))
    # ≥100 timed steps: SIL depth grows along the trajectory (reference
    # telemetry 0.04 → 4.77), so short cold-start timings flatter the
    # result; 100 steps gives an honest steady-state average.
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    bond = int(os.environ.get("BENCH_BOND", "30"))
    scan = os.environ.get("BENCH_SCAN", "1") != "0"
    # fused block driver: each timed block is ONE lax.fori_loop dispatch
    # (propagate_steps), so per-dispatch tunnel latency — which varies
    # ~0.5-10 ms with the axon VM's placement and dominates this
    # dispatch-bound D=30 model at ~40+ dispatches/step — is paid once
    # per block instead of dozens of times per step
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    # pallas site kernels (Lanczos krylov_expm + MGS gauge); BENCH_PLZ=0
    # reverts to the XLA per-op path for A/B
    plz = os.environ.get("BENCH_PLZ", "1") != "0"
    if os.environ.get("BENCH_PLZ") == "0":
        os.environ["PYTDSCF_PALLAS_QR"] = "0"

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    dtype = "complex64" if on_tpu else "complex128"
    log(f"bench: platform={platform} dtype={dtype} "
        f"sites={n_left + 1 + n_right} bond={bond}")

    t0 = time.time()
    basis, ham = singlet_fission_chain(n_left=n_left, n_right=n_right)
    nsite = len(basis)
    phys_dims = [b.nprim for b in basis]
    ham.fused_mpo(phys_dims)
    log(f"bench: MPO built+fused in {time.time() - t0:.1f} s")

    # Initial state: exciton level 1 occupied, bosons in vacuum.
    vecs = []
    for i, b in enumerate(basis):
        v = np.zeros(b.nprim, dtype=complex)
        v[1 if i == n_left else 0] = 1.0
        vecs.append(v)
    cores = [alloc_hartree_product(phys_dims, bond, vecs)]

    config = Config(
        jobname="bench",
        thresh_exp=1.0e-06 if on_tpu else 1.0e-09,
        max_krylov=int(os.environ.get("BENCH_KRYLOV", "10")),
        dtype=dtype,
        scan_sweep=scan,
        pallas_site=plz,
    )
    engine = TDVPEngine(cores, ham, config)
    dt_au = 0.2 / units.au_in_fs

    import jax.numpy as jnp

    def sync() -> None:
        # jax.block_until_ready does NOT wait for device completion
        # through the axon TPU tunnel — force a VALUE fetch (real scalar:
        # complex device→host transfers are rejected by this backend)
        float(jnp.linalg.norm(engine.cores[0][0]).real)

    t0 = time.time()
    if fused:
        engine.propagate_steps(dt_au, 1)
    else:
        engine.propagate(dt_au)
    sync()
    warmup_s = time.time() - t0
    log(f"bench: warmup step (compile) {warmup_s:.1f} s "
        f"({'warm' if warm_cache else 'cold'} cache)")

    # median over blocks: single-pass timings on this VM scatter ~±30%
    # (tunnel hiccups, host migration); the per-block median is stable
    blocks = max(1, int(os.environ.get("BENCH_BLOCKS", "5")))
    per_block = max(1, steps // blocks)
    block_rates = []
    for b in range(blocks):
        t0 = time.time()
        if fused:
            engine.propagate_steps(dt_au, per_block)
        else:
            for _ in range(per_block):
                engine.propagate(dt_au)
        sync()
        block_rates.append((time.time() - t0) / per_block)
    sec_per_step = float(np.median(block_rates))
    avg_k, calls, capped = engine.krylov_stats()
    energy = float(engine.expectation().real)
    log(f"bench: per-block s/step {[round(r, 4) for r in block_rates]}")
    log(f"bench: {sec_per_step:.3f} s/step (median of {blocks} blocks × "
        f"{per_block} steps; energy={energy:.8f}, "
        f"AVG Krylov {avg_k:.2f}, cap hits {capped}/{calls})")

    # ---- accuracy self-check: perf artifacts fail LOUDLY on silent
    # on-chip precision loss (the convert-folding hazard, BASELINE.md).
    # The f64 literal is this model's ⟨H⟩ after 0.2 fs steps (energy is
    # conserved, so it holds at every step count); the c64/TPU tolerance
    # bounds the healthy paths (measured ~9e-7 drift) while any bf16-pass
    # degradation (~4e-3 relative) trips it.
    accuracy_ok = True
    if not np.isfinite(energy):
        log(f"bench: ACCURACY FAILURE — energy is not finite ({energy})")
        accuracy_ok = False
    elif (n_left, n_right) == (61, 122):
        e_ref = 0.0182253410
        tol = 5.0e-06 if dtype == "complex64" else 1.0e-07
        if abs(energy - e_ref) > tol:
            log(f"bench: ACCURACY FAILURE — energy {energy:.8f} vs "
                f"literal {e_ref:.8f} (tol {tol:g})")
            accuracy_ok = False

    print(json.dumps({
        "metric": "singlet_fission_184site_tdvp_sec_per_step",
        "value": round(sec_per_step, 4),
        "unit": "s/step",
        "vs_baseline": round(BASELINE_SEC_PER_STEP / sec_per_step, 2),
        "warmup_s": round(warmup_s, 1),
        "warm_cache": warm_cache,
        "accuracy_ok": accuracy_ok,
    }))
    if not accuracy_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
