"""Immutable run configuration.

Replaces the reference's mutable module-global singleton
(``/root/reference/pytdscf/_const_cls.py``) with an explicit, frozen dataclass
threaded through the engine.  All thresholds keep the reference defaults so
numerical regression literals match.
"""

from __future__ import annotations

import dataclasses
from typing import Literal


@dataclasses.dataclass(frozen=True)
class Config:
    """Run-type configuration, passed explicitly (never a global).

    Attributes mirror the semantics of ``const.set_runtype`` in the reference
    (``_const_cls.py:102-252``) but are immutable.
    """

    jobname: str = "job"
    #: "none" = real-time propagation; "imaginary" = imaginary-time relaxation;
    #: "improved" = improved (diagonalisation) relaxation.
    relax: Literal["none", "imaginary", "improved"] = "none"
    #: Apply an operator variationally instead of propagating.
    apply_dipole: bool = False
    #: Krylov exponential integrator for the local updates.
    integrator: Literal["lanczos", "arnoldi"] = "lanczos"
    #: SIL convergence threshold (reference ``thresh_exp``; ``thresh_sil`` kwarg).
    thresh_exp: float = 1.0e-09
    #: Maximum Krylov subspace dimension.
    max_krylov: int = 20
    #: Hilbert-space (MPS) or Liouville-space (MPDO) dynamics.
    space: Literal["hilbert", "liouville"] = "hilbert"
    #: Renormalise after each local exponential (valid for Hermitian H).
    conserve_norm: bool = True
    #: Adaptive bond dimension (a1TDVP).
    adaptive: bool = False
    adaptive_Dmax: int = 20
    adaptive_dD: int = 5
    adaptive_p_proj: float = 1.0e-04
    adaptive_p_svd: float = 1.0e-07
    #: Masked fixed-buffer a1TDVP: bonds padded to static caps, live rank
    #: carried as exact-zero channels — no host syncs or shape retraces
    #: inside the sweep (the TPU-native adaptive path).
    adaptive_masked: bool = False
    #: Matmul-pass precision for the Krylov matvecs only ("highest" =
    #: bf16x6/f32-exact, "high" = bf16x3 ~1e-6 rel at ~2× MXU speed,
    #: "default" = one bf16 pass).  Environment-block recursions always
    #: stay at HIGHEST (their error compounds over the chain).
    matvec_precision: str = "highest"
    #: Matmul-pass precision for the environment-block transfer
    #: contractions.  Default f32-exact (errors compound over the chain);
    #: "high" (bf16x3, ~1e-7 relative per transfer) is safe for short
    #: chains in the compute-bound large-χ regime — blocks are
    #: renormalised per site, so tens of sites compound to ≪ 1e-5.
    env_precision: str = "highest"
    #: Relaxed (inexact) Krylov: matvec iterations ≥ 2 run at a single
    #: bf16 pass.  Their errors enter ``exp(T)e₀`` weighted by the late
    #: expansion coefficients (van den Eshof & Hochbruck relaxation), so
    #: the result stays within the integrator threshold while the
    #: dominant large-χ cost — the Krylov matvec tail — runs ~3× faster
    #: on the MXU.  The relaxed matvec runs genuine planar-bf16 kernels on
    #: every backend (operands AND chain intermediates in bfloat16 — also
    #: halves their HBM traffic), so CPU runs emulate the TPU numerics.
    #: Honored by the fixed-rank serial sweep and both chain-parallel
    #: engines; the adaptive (a1TDVP) sweeps always run full precision.
    krylov_relaxed: bool = False
    #: First relaxed Krylov iteration: iterations ``< relax_after`` run
    #: the exact matvec, the rest the single-bf16-pass one.  2 is the
    #: conservative default (two exact iterations lock in the leading
    #: expansion coefficients); 1 halves the exact-matvec share — the
    #: relaxation bound still holds (only c₀ is locked exactly), but
    #: A/B the observables before adopting it on a new workload.
    relax_after: int = 2
    #: Route the relaxed matvec through the pallas-fused TPU kernel
    #: (``mps/pallas_matvec.py``): the whole L·W·R·ψ chain stays in VMEM,
    #: eliminating the two (χ,d,χ,w) HBM intermediates.  Applies to sites
    #: whose bonds divide the 128-tile grid (edges fall back to the planar
    #: einsum path).  Requires ``krylov_relaxed=True`` to have any effect.
    pallas_matvec: bool = False
    #: Route the env-block renormalisations through the pallas-fused
    #: bf16x3 kernel (``mps/pallas_renorm.py``): hi/lo-split operands and
    #: f32 VMEM chain intermediates reproduce ``env_precision="high"``
    #: semantics with zero HBM round-trips for the two (χ,w,d,χ)
    #: intermediates.  Engages only when ``env_precision == "high"`` and
    #: on tile-divisible bonds (edges fall back to the XLA einsum).
    pallas_env: bool = False
    #: Single-kernel pallas Lanczos for the Krylov exponentials at SMALL
    #: local dimension (``mps/pallas_lanczos.py``): the whole
    #: recurrence + tridiagonal exponential + convergence rule runs as one
    #: TPU program, removing the per-op sequencing that dominates the
    #: small-bond regime.  Engages only on the TPU backend, for Lanczos
    #: (Hermitian) updates of single-pair states at full matvec precision;
    #: everything else falls back to the XLA path.  Numerics: planar-f32
    #: HIGHEST matmuls (f32-exact) with a substepped-Taylor exponential —
    #: agrees with the XLA path to ~1e-7 with identical stopping.
    pallas_site: bool = True
    #: Fixed scan-run chunk length: every distinct scan length compiles
    #: its own XLA program, so uniform runs are cut into scan_chunk-sized
    #: pieces sharing one compilation (remainders go per-site).
    scan_chunk: int = 16
    #: Per-site Krylov iteration counters (reference per-site SIL logs);
    #: off by default — the accumulation ops cost dispatch time in the
    #: small-bond dispatch-bound regime.
    per_site_telemetry: bool = False
    #: Sweep-splitting composition for real-time propagation: "lt2" is
    #: the standard symmetric (Lubich) 2nd-order step — forward + backward
    #: half-sweeps; "suzuki4" / "yoshida4" compose that step into a
    #: 4th-order integrator (5 resp. 3 sub-steps, one with a negative
    #: coefficient).  4th order admits much larger dt at equal
    #: time-integration accuracy, amortising the per-site fixed costs
    #: (gauge moves, environment transfer, Krylov buffers) that dominate
    #: outside the matvec; suzuki4 has the smaller error constant and
    #: sub-step magnitudes (preferred).  Real-time propagation only —
    #: negative sub-steps are meaningless for relaxation.  The projection
    #: (finite-D manifold) error is unaffected: only the dt-dependent
    #: splitting error drops to O(dt⁴).
    splitting: Literal["lt2", "suzuki4", "yoshida4"] = "lt2"
    #: SVD regularisation floor for gauge moves (reference ``epsrho``).
    epsrho: float = 1.0e-08
    #: Display unit for exported time axes.
    display_time_unit: Literal["fs", "ps", "au"] = "fs"
    #: Extra numerical self-checks (canonicality asserts etc.).
    pytest_enabled: bool = False
    #: Computation dtype for the tensor network.
    dtype: str = "complex128"
    #: Compile uniform bulk-site runs of the TDVP half-sweep into one
    #: ``lax.scan`` program (amortises dispatch + warmup on long chains).
    scan_sweep: bool = False
    #: Defer per-step property fetches: the driver batches the device
    #: scalars of up to ``fetch_stride`` steps into ONE host sync
    #: (``device_io.fetch_many``), amortising the ~30 ms axon-tunnel round
    #: trip that dominates small-model driver loops.  Properties and .dat
    #: rows are bit-identical to stride 1 — only the fetch (and the norm
    #: -drift warning) is delayed by at most ``fetch_stride − 1`` steps.
    #: Checkpoints, observables-dict evaluations and reduced-density
    #: exports flush the queue first, so file ordering is preserved.
    fetch_stride: int = 1
    #: CMF (constant-mean-field) adaptive-step propagation for MCTDH
    #: (reference ``wavefunction.propagate_CMF``).
    cmf: bool = False
    #: CMF predictor/corrector error tolerance (reference ``const.tol_CMF``).
    tol_cmf: float = 1.0e-14
    #: Largest CMF step in a.u. (reference ``const.max_stepsize`` = 0.010 fs).
    max_stepsize: float = 0.010 / 0.024188843265857  # au (0.010 fs)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def with_precision_preset(self, preset: str) -> "Config":
        """Measured accuracy-vs-throughput rungs for large-χ TPU work.

        Every rung was chip-measured on the χ=1024 radical-pair MPDO
        north star (round-5 matrix, BASELINE.md); "drift" is the max
        electron-population deviation from the f32-exact gold anchor
        after 10 steps:

        * ``"throughput"`` — bf16x3 matvecs + env, single-bf16-pass
          relaxed Krylov tail from iteration 1, pallas fused matvec.
          0.962 s/step (79 TFLOP/s), drift 4.4e-5.  The bench default.
        * ``"balanced"`` — f32-exact iteration-0 matvecs and env
          transfer; iterations ≥ 1 stay single-bf16-pass.  1.224 s/step
          (62 TFLOP/s), drift 1.7e-5 — the exact-prefix matvec precision
          is the dominant drift carrier, so this buys ~2.6× accuracy for
          +27% wall-clock.
        * ``"precise"`` — two f32-exact prefix iterations + f32-exact
          env; only the Krylov tail (iterations ≥ 2) runs single-pass
          bf16.  Drift 5.8e-6 — at the gold anchor's own noise scale —
          for ~1.4 s/step (run J; measured 1.51 under host contention).
        * ``"exact"`` — every matmul f32-exact, no relaxation.
          2.557 s/step (30 TFLOP/s), reference-grade (the gold anchor
          itself; complex128 CPU runs remain the cross-check venue).
        """
        if preset == "throughput":
            return self.replace(
                matvec_precision="high", env_precision="high",
                krylov_relaxed=True, relax_after=1, pallas_matvec=True,
            )
        if preset == "balanced":
            return self.replace(
                matvec_precision="highest", env_precision="highest",
                krylov_relaxed=True, relax_after=1, pallas_matvec=True,
            )
        if preset == "precise":
            return self.replace(
                matvec_precision="highest", env_precision="highest",
                krylov_relaxed=True, relax_after=2, pallas_matvec=True,
            )
        if preset == "exact":
            return self.replace(
                matvec_precision="highest", env_precision="highest",
                krylov_relaxed=False, pallas_matvec=False,
            )
        raise ValueError(
            f"unknown precision preset {preset!r}: "
            "throughput | balanced | precise | exact"
        )

    @property
    def is_relax(self) -> bool:
        return self.relax != "none"


def enable_compilation_cache(base: str = "/tmp/jaxcache") -> str | None:
    """Point JAX at a persistent compilation cache (idempotent).

    Warm-start UX: first TPU compiles here run ~100 s (up to ~20 min for
    large-χ programs); the persistent cache cuts warm restarts to seconds.
    The cache dir is suffixed with the backend platform — and, on CPU,
    with a hash of the host's CPU feature flags — because XLA:CPU AOT
    entries compiled on a DIFFERENT machine type (VMs migrate) can SIGILL
    when reloaded.  Opt out with ``PYTDSCF_NO_COMPILE_CACHE=1``.  Returns
    the cache dir in use (None when disabled)."""
    import os

    if os.environ.get("PYTDSCF_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    tag = jax.devices()[0].platform
    if tag == "cpu":
        import hashlib

        try:
            with open("/proc/cpuinfo") as fh:
                flags = next(
                    (ln for ln in fh if ln.startswith("flags")), ""
                )
            if flags:
                tag += "-" + hashlib.sha1(flags.encode()).hexdigest()[:8]
        except OSError:
            pass
    path = f"{base}-{tag}"
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERY program: the engine dispatches ~50 small kernels whose
    # sub-second compiles are excluded by the default 1 s floor, yet
    # through the axon tunnel they dominate the warm-start tail
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
