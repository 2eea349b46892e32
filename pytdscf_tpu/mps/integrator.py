"""On-device Krylov propagators.

Short-iterative Lanczos / Arnoldi for ``exp(scale·H_eff)ψ`` implemented as
``lax.while_loop`` programs over a fixed-size Krylov buffer, so an entire
site update compiles to ONE XLA computation.  This removes the reference's
host↔device round trips per Krylov iteration and its CPU-resident Hessenberg
eigensolve (``/root/reference/pytdscf/_integrator.py:360-365,453-655``).

Semantics parity with the reference SIL:
* convergence when ‖ψ_next(k) − ψ_next(k−1)‖ < thresh, on Krylov breakdown
  (β≈0 ⇒ invariant subspace ⇒ exact), or at the max Krylov dimension;
* ``conserve_norm=True`` renormalises the result, otherwise the initial norm
  is factored out and restored (reference ``_normalize``/``_rescale``).

The padded-matrix trick: at iteration k only the leading (k+1)×(k+1) block
of the K×K reduced matrix is populated; the remainder is exactly zero, so the
matrix is block-diagonal and ``expm(scale·T)·e₀`` lives entirely in the active
block — no dynamic shapes needed.
"""

from __future__ import annotations

import os as _os
from typing import Callable

import jax
import jax.numpy as jnp

EPS = 1.0e-14

#: Arnoldi Gram–Schmidt live-prefix threshold: when the Krylov vectors are
#: at least this long, the full-buffer GS matmuls (which read every padded
#: slot — k_max·n complex loads per iteration) are replaced by a
#: ``fori_loop`` over the k+1 LIVE rows only (modified Gram–Schmidt;
#: identical in exact arithmetic).  OPT-IN (0 = disabled, the default):
#: chip-measured at χ=1024 MPDO shapes the sequential per-row reductions
#: LOSE ~0.11 s/step against the padded matmul's pipelined bandwidth
#: (1.416 vs ~1.30 — BASELINE.md round-4), so the matmul form stays the
#: default; set ``PYTDSCF_GS_PREFIX_N=<n>`` to enable above length n on
#: latency-tolerant backends.
GS_PREFIX_MIN_N = int(_os.environ.get("PYTDSCF_GS_PREFIX_N", "0"))

#: Tuple-of-rows Arnoldi carry threshold: vectors at least this long use
#: ``_arnoldi_loop_rows``, which carries the Krylov basis as SEPARATE
#: row arrays instead of one (k_max+1, n) buffer.  Chip-measured (round
#: 4, free-matvec probe at χ=1024 shapes): reading the stacked buffer
#: for Gram–Schmidt while writing its next row forces XLA to COPY the
#: whole buffer every iteration (+1.3 ms/iter on top of the 1.5 ms GS
#: reads); with tuple rows the row update is an SSA swap (``lax.switch``
#: branch) and the GS is per-row dots + one fused elementwise
#: subtraction — same bytes, no copy.  Identical algorithm (classical
#: GS, same formulas); small problems keep the buffer form whose
#: round-off the regression literals embed.  ``PYTDSCF_GS_ROWS_N``
#: overrides (0 disables).
GS_ROWS_MIN_N = int(_os.environ.get("PYTDSCF_GS_ROWS_N", str(1 << 20)))

#: Planar-bf16 Gram–Schmidt with late-iteration inexactness (round-5
#: structural lever, VERDICT r4 #3): iterations ≥ ``PYTDSCF_GS_LO_AFTER``
#: (default 2) run the CGS projections AND the subtraction from a carried
#: bf16 copy of the Krylov rows (f32-accumulated dots), halving the
#: row-read traffic that dominates the GS cost at χ=1024 (~3.4 ms/iter,
#: round-4 free-matvec probe).  The h-column and residual-orthogonality
#: errors (~4e-3 relative) enter ``exp(T)e₀`` weighted by the late
#: expansion coefficients — the same van den Eshof/Hochbruck relaxation
#: budget the single-bf16-pass matvecs (``relax_after``) already spend for
#: iterations ≥ 1.  Opt-in: ``PYTDSCF_GS_LO=1``.
GS_LO = _os.environ.get("PYTDSCF_GS_LO", "0") == "1"
GS_LO_AFTER = int(_os.environ.get("PYTDSCF_GS_LO_AFTER", "2"))

#: Convergence-check thinning (round-5, measured with GS_LO): the
#: per-iteration ``_expm_taylor_small`` + norm machinery (~5 ms/iter of
#: tiny sequenced ops at χ=1024) runs only on odd iterations and near the
#: cap; an unchecked iteration carries the previous coefficient vector.
#: Worst case one extra (already-paid-for) Krylov iteration when
#: convergence lands on an even k.  Opt-in: ``PYTDSCF_KRY_CHECK2=1``.
KRY_CHECK2 = _os.environ.get("PYTDSCF_KRY_CHECK2", "0") == "1"


def krylov_expm(
    matvec: Callable[[jax.Array], jax.Array],
    v_init: jax.Array,
    scale: jax.Array | complex,
    thresh: float,
    max_dim: int = 20,
    conserve_norm: bool = True,
    arnoldi: bool = False,
    return_iterations: bool = False,
    matvec_lo: Callable[[jax.Array], jax.Array] | None = None,
    relax_after: int = 2,
):
    """Approximate ``exp(scale·H)·v_init`` in a Krylov subspace (traceable).

    With ``return_iterations`` also returns the Krylov dimension used (the
    reference's per-site SIL telemetry, ``_helper._Debug.niter_krylov``) and
    a boolean flag that is True when the loop exhausted ``max_dim`` WITHOUT
    meeting ``thresh`` (and without an exact Krylov breakdown) — the case the
    reference raises on with shrink-dt advice
    (``/root/reference/pytdscf/_integrator.py:653-655``).

    ``matvec_lo`` enables RELAXED (inexact) Krylov: iterations
    ``k >= relax_after`` apply the cheaper low-precision matvec.  The
    classic relaxation bound (van den Eshof & Hochbruck, SISC 2005): the
    error a perturbed matvec at iteration k injects into ``exp(T)e₀`` is
    weighted by the k-th expansion coefficient ``|c_k|``, which for a
    converging series decays superlinearly — so once the leading
    coefficients are locked in at full precision, late iterations tolerate
    a ~1e-3-relative matvec (single-pass bf16 on TPU) while the result
    stays at ~|c_k|·1e-3 ≪ the integrator threshold.
    """
    n = v_init.shape[0]
    k_max = min(max_dim, n)
    dtype = v_init.dtype
    beta0 = jnp.linalg.norm(v_init)
    v0 = v_init / beta0

    if matvec_lo is None:
        mv = matvec
    else:
        def mv(k, v):
            return jax.lax.cond(k < relax_after, matvec, matvec_lo, v)

    if arnoldi:
        loop = (
            _arnoldi_loop_rows
            if GS_ROWS_MIN_N > 0 and n >= GS_ROWS_MIN_N
            else _arnoldi_loop
        )
        psi_next, k_used, bad = loop(
            mv, v0, scale, thresh, k_max, n, dtype,
            indexed=matvec_lo is not None,
        )
    else:
        loop = (
            _lanczos_loop_rows
            if GS_ROWS_MIN_N > 0 and n >= GS_ROWS_MIN_N
            else _lanczos_loop
        )
        psi_next, k_used, bad = loop(
            mv, v0, scale, thresh, k_max, n, dtype,
            indexed=matvec_lo is not None,
        )
    if k_max >= n:
        # the Krylov space spanned the WHOLE vector space: the result is
        # exact by construction, never a cap failure (the reference
        # declares `is_converged` at ldim + 1 == maxsize likewise,
        # ``_integrator.py:569,639-643``)
        bad = jnp.asarray(False)

    if conserve_norm:
        out = psi_next / jnp.linalg.norm(psi_next)
    else:
        out = psi_next * beta0
    if return_iterations:
        return out, k_used, bad
    return out


def _lanczos_loop(matvec, v0, scale, thresh, k_max, n, dtype, indexed=False):
    """SIL with the reference's recurrence (``_integrator.py:538-568``).

    Note the reduced-matrix diagonal is ``α_k = ⟨v₀|H·v_k⟩`` (projection onto
    the *initial* vector, not ``v_k``).  This is an oblique-projection
    variant, but it is exact by construction: ``β_k v_{k+1} ≝ H v_k − α_k v_k
    − β_{k−1} v_{k−1}`` makes ``H·Vᵀ = Vᵀ·T`` hold identically in the
    generated (normalised, non-orthogonal) basis, so ``expm(scale·T)e₀``
    reproduces the Krylov power series exactly.  We keep this convention —
    rather than Rayleigh–Ritz ``α_k = ⟨v_k|H v_k⟩`` — because every
    regression literal of the reference embeds its stopping behaviour
    (matching it reproduces reference RDMs to ~1e-10 instead of ~1e-8).
    """
    V = jnp.zeros((k_max + 1, n), dtype=dtype).at[0].set(v0)
    v0_conj = v0.conj()
    alpha = jnp.zeros((k_max,), dtype=dtype)
    beta = jnp.zeros((k_max,), dtype=jnp.float64)
    psi0 = jnp.zeros((n,), dtype=dtype)
    idx_d = jnp.arange(k_max)
    idx_o = jnp.arange(k_max - 1)

    def cond(carry):
        _, _, _, k, _, _, done = carry
        return ~done

    def body(carry):
        V, alpha, beta, k, psi_prev, _, _ = carry
        w = matvec(k, V[k]) if indexed else matvec(V[k])
        a = jnp.sum(v0_conj * w)
        beta_prev = jnp.where(k > 0, beta[k - 1], 0.0)
        w = w - a * V[k] - beta_prev.astype(dtype) * V[k - 1]
        b = jnp.linalg.norm(w).real
        V = V.at[k + 1].set(jnp.where(b > EPS, 1.0, 0.0) * w / jnp.where(b > EPS, b, 1.0))
        alpha = alpha.at[k].set(a)
        beta = beta.at[k].set(b)
        # Active-block tridiagonal, padded with exact zeros.  The reference
        # takes Re(α) in its Hermitian path (``_integrator.py:590-592``).
        # T in the state's REAL precision (f32 for complex64 — f64 would
        # hit the TPU's emulated-double path; β is accumulated in f64 but
        # the reduced matrix only needs the working precision)
        real = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        d_mask = (idx_d <= k).astype(real)
        o_mask = (idx_o < k).astype(real)
        off = beta[:-1].astype(real) * o_mask
        diag = alpha.real.astype(real) * d_mask
        T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
        # exp(scale·T)e₀ via the REAL-symmetric eigendecomposition — exact
        # (T is Hermitian by construction) and ~1.5× cheaper on TPU than
        # the general Padé expm, whose ~100 tiny ops dominate the
        # small-bond per-iteration cost.  Zero-padded dims are decoupled
        # (block-diagonal), and exact/near degeneracy with active
        # eigenvalues is harmless: within a degenerate subspace
        # exp(scale·λ) is constant, so the basis mixing cancels in
        # U·exp(scale·Λ)·Uᵀe₀.
        w_e, U = jnp.linalg.eigh(T)
        c = (U.astype(dtype) * jnp.exp(
            scale * w_e.astype(dtype))[None, :]) @ U[0].astype(dtype)
        psi_next = c @ V[:k_max]
        err = jnp.linalg.norm(psi_next - psi_prev)
        conv = (k > 0) & (err < thresh)
        breakdown = b < EPS
        capped = k + 1 >= k_max
        done = conv | breakdown | capped
        bad = capped & ~conv & ~breakdown
        return V, alpha, beta, k + 1, psi_next, bad, done

    carry = (
        V, alpha, beta, jnp.asarray(0), psi0,
        jnp.asarray(False), jnp.asarray(False),
    )
    *_, k_fin, psi_next, bad, _ = jax.lax.while_loop(cond, body, carry)
    return psi_next, k_fin, bad


def _expm_taylor_small(A):
    """exp(A) of a TINY (k×k) matrix by scaling-and-squaring Taylor.

    Matmul-only: no LU/pivoting — ``jax.scipy.linalg.expm``'s Padé solve
    runs sequential scalar pivoting on TPU, measured at ~3 ms per Arnoldi
    iteration at χ=1024 (the dominant non-matvec cost of the MPDO step;
    the Lanczos path dodged it via eigh, this is the non-Hermitian
    analog).  Fixed Taylor order 12 after scaling ‖A‖₁ below 1/8:
    truncation ~(1/8)¹³/13! ≈ 4e-22, far under f32/f64 round-off.
    """
    k = A.shape[0]
    norm1 = jnp.max(jnp.sum(jnp.abs(A), axis=0))
    # s = max(0, ceil(log2(norm1)) + 3)  → ‖A/2^s‖ ≤ 1/8.  Clamped to 64
    # squarings, and forced to 0 on a non-finite ‖A‖₁ so NaN/Inf leaking
    # into H_eff propagates out immediately instead of saturating the
    # float→int32 cast (~2^31) and spinning the squaring loop for hours.
    s_raw = jnp.ceil(jnp.log2(jnp.maximum(norm1, 1e-30))) + 3
    s_raw = jnp.where(jnp.isfinite(norm1), s_raw, 0.0)
    s = jnp.clip(s_raw, 0.0, 64.0).astype(jnp.int32)
    As = A / (2.0 ** s.astype(A.real.dtype)).astype(A.dtype)
    eye = jnp.eye(k, dtype=A.dtype)
    # reverse Horner: p ← I + As·p/c for c = 12, 11, …, 1
    p = eye
    for c in range(12, 0, -1):
        p = eye + (As @ p) / jnp.asarray(c, A.dtype)
    return jax.lax.fori_loop(
        jnp.asarray(0, jnp.int32), s, lambda _, m: m @ m, p
    )


def _arnoldi_loop(matvec, v0, scale, thresh, k_max, n, dtype, indexed=False):
    V = jnp.zeros((k_max + 1, n), dtype=dtype).at[0].set(v0)
    H = jnp.zeros((k_max + 1, k_max), dtype=dtype)
    c0 = jnp.zeros((k_max,), dtype=dtype)
    row = jnp.arange(k_max)[:, None]
    col = jnp.arange(k_max)[None, :]
    live_prefix = GS_PREFIX_MIN_N > 0 and n >= GS_PREFIX_MIN_N

    def cond(carry):
        _, _, k, _, _, done = carry
        return ~done

    def body(carry):
        V, H, k, c_prev, _, _ = carry
        w = matvec(k, V[k]) if indexed else matvec(V[k])
        if live_prefix:
            # Modified GS over the k+1 LIVE rows only (traced fori bound):
            # the padded-buffer matmul form streams all k_max+1 rows from
            # HBM every iteration — at χ=1024 MPDO shapes that read is a
            # measurable share of the step (BASELINE.md cost model).
            def gs_row(j, st):
                w_, h_ = st
                hj = jnp.vdot(V[j], w_)
                return w_ - hj * V[j], h_.at[j].set(hj)

            w, h = jax.lax.fori_loop(
                0, k + 1, gs_row,
                (w, jnp.zeros((k_max + 1,), dtype)),
            )
        else:
            # Full Gram–Schmidt (inactive rows are zero — harmless
            # projections).  Conjugate the SINGLE new vector, not the
            # (k_max+1, n) buffer: ⟨V|w⟩ = conj(V·conj(w)) — V.conj()
            # would stream/materialise the whole padded buffer.
            h = jnp.einsum("in,n->i", V, w.conj()).conj()
            w = w - h @ V
        b = jnp.linalg.norm(w).real
        V = V.at[k + 1].set(jnp.where(b > EPS, 1.0, 0.0) * w / jnp.where(b > EPS, b, 1.0))
        H = H.at[:, k].set(h)
        H = H.at[k + 1, k].set(b.astype(dtype))
        # Active upper-left (k+1)×(k+1) block only.
        mask = ((row <= k) & (col <= k)).astype(dtype)
        T = H[:k_max, :k_max] * mask
        c = _expm_taylor_small(scale * T)[:, 0]
        # V is orthonormal (full GS), so ‖ψ(k) − ψ(k−1)‖ = ‖c_k − c_{k−1}‖:
        # the convergence test runs in the k_max-dim coefficient space and
        # the n-dim iterate is materialised ONCE after the loop — at large
        # bond dimension the per-iteration c·V readback of the Krylov
        # buffer (k_max·n complex) dominated the non-matvec cost.
        err = jnp.linalg.norm(c - c_prev)
        conv = (k > 0) & (err < thresh)
        breakdown = b < EPS
        capped = k + 1 >= k_max
        done = conv | breakdown | capped
        bad = capped & ~conv & ~breakdown
        return V, H, k + 1, c, bad, done

    carry = (
        V, H, jnp.asarray(0), c0, jnp.asarray(False), jnp.asarray(False)
    )
    V, _, k_fin, c_fin, bad, _ = jax.lax.while_loop(cond, body, carry)
    if live_prefix:
        # c is exactly zero beyond the active block — accumulate only the
        # k_fin live rows
        psi_next = jax.lax.fori_loop(
            0,
            jnp.minimum(k_fin, k_max),
            lambda j, acc: acc + c_fin[j] * V[j],
            jnp.zeros((n,), dtype),
        )
    else:
        psi_next = c_fin @ V[:k_max]
    return psi_next, k_fin, bad


def _lanczos_loop_rows(
    matvec, v0, scale, thresh, k_max, n, dtype, indexed=False
):
    """SIL with the Krylov basis carried as SEPARATE row arrays.

    Same oblique-projection recurrence and stopping rule as
    :func:`_lanczos_loop` (the reference-parity convention); the tuple
    carry removes the per-iteration buffer copy at large n (see
    ``GS_ROWS_MIN_N``).  The recurrence only ever touches v_k and
    v_{k−1}, which ride the carry directly; the full row set is kept for
    the per-iteration ψ readback the reference's convergence test
    defines (V is non-orthogonal here, so the coefficient-space shortcut
    of the Arnoldi loop does not apply).
    """
    zero = jnp.zeros((n,), dtype)
    rows0 = (v0,) + (zero,) * k_max
    v0_conj = v0.conj()
    alpha0 = jnp.zeros((k_max,), dtype=dtype)
    beta0 = jnp.zeros((k_max,), dtype=jnp.float64)
    idx_d = jnp.arange(k_max)
    idx_o = jnp.arange(k_max - 1)

    def set_row(rows, k, w):
        branches = [
            (lambda j: (lambda rs, x: rs[:j] + (x,) + rs[j + 1:]))(j)
            for j in range(1, k_max + 1)
        ]
        return jax.lax.switch(k, branches, rows, w)

    def cond(carry):
        return ~carry[-1]

    def body(carry):
        rows, vk, vkm1, alpha, beta, k, psi_prev, _, _ = carry
        w = matvec(k, vk) if indexed else matvec(vk)
        a = jnp.sum(v0_conj * w)
        beta_prev = jnp.where(k > 0, beta[k - 1], 0.0)
        w = w - a * vk - beta_prev.astype(dtype) * vkm1
        b = jnp.linalg.norm(w).real
        vnext = jnp.where(b > EPS, 1.0, 0.0) * w / jnp.where(
            b > EPS, b, 1.0
        )
        rows = set_row(rows, k, vnext)
        alpha = alpha.at[k].set(a)
        beta = beta.at[k].set(b)
        real = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        d_mask = (idx_d <= k).astype(real)
        o_mask = (idx_o < k).astype(real)
        off = beta[:-1].astype(real) * o_mask
        diag = alpha.real.astype(real) * d_mask
        T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
        w_e, U = jnp.linalg.eigh(T)
        c = (U.astype(dtype) * jnp.exp(
            scale * w_e.astype(dtype))[None, :]) @ U[0].astype(dtype)
        psi_next = zero
        for j in range(k_max):
            psi_next = psi_next + c[j] * rows[j]
        err = jnp.linalg.norm(psi_next - psi_prev)
        conv = (k > 0) & (err < thresh)
        breakdown = b < EPS
        capped = k + 1 >= k_max
        done = conv | breakdown | capped
        bad = capped & ~conv & ~breakdown
        return rows, vnext, vk, alpha, beta, k + 1, psi_next, bad, done

    carry = (
        rows0, v0, zero, alpha0, beta0, jnp.asarray(0), zero,
        jnp.asarray(False), jnp.asarray(False),
    )
    *_, k_fin, psi_next, bad, _ = jax.lax.while_loop(cond, body, carry)
    return psi_next, k_fin, bad


def _arnoldi_loop_rows(
    matvec, v0, scale, thresh, k_max, n, dtype, indexed=False
):
    """Arnoldi with the Krylov basis carried as SEPARATE row arrays.

    Same classical-GS algorithm and stopping rule as
    :func:`_arnoldi_loop`; the tuple carry removes the per-iteration
    whole-buffer copy XLA emits when one array is both streamed (GS
    reads) and row-updated in a ``while_loop`` body (see
    ``GS_ROWS_MIN_N``).  The current Krylov vector rides the carry
    directly, so no dynamic row read is needed either.
    """
    zero = jnp.zeros((n,), dtype)
    rows0 = (v0,) + (zero,) * k_max
    H0 = jnp.zeros((k_max + 1, k_max), dtype=dtype)
    c0 = jnp.zeros((k_max,), dtype=dtype)
    row_i = jnp.arange(k_max)[:, None]
    col_i = jnp.arange(k_max)[None, :]
    f32 = jnp.float32

    def to_lo(v):
        return v.real.astype(jnp.bfloat16), v.imag.astype(jnp.bfloat16)

    def set_row(rows, k, w):
        # replace row k+1 (k ∈ [0, k_max−1]); unchanged rows pass through
        # as SSA values — no data movement
        branches = [
            (lambda j: (lambda rs, x: rs[:j] + (x,) + rs[j + 1:]))(j)
            for j in range(1, k_max + 1)
        ]
        return jax.lax.switch(k, branches, rows, w)

    def gs_exact(rows, rows_lo, w):
        # classical GS: all projections from the same w (⟨r|w⟩ =
        # conj(Σ r·conj(w)) — conjugate the one new vector, not the rows)
        wc = w.conj()
        h = jnp.stack([jnp.sum(r * wc).conj() for r in rows])
        for j in range(k_max + 1):
            w = w - h[j] * rows[j]
        return h, w

    def gs_lo(rows, rows_lo, w):
        # same CGS formulas from the carried bf16 row planes (row reads
        # halved), f32-accumulated dots; errors sit inside the relaxed-
        # Krylov budget for iterations ≥ GS_LO_AFTER (see GS_LO note)
        wr = w.real.astype(jnp.bfloat16)
        wi = w.imag.astype(jnp.bfloat16)
        hs = []
        for rr, ri in rows_lo:
            # ⟨r|w⟩ = Σ (rr − i·ri)(wr + i·wi)
            re = jnp.einsum(
                "n,n->", rr, wr, preferred_element_type=f32
            ) + jnp.einsum("n,n->", ri, wi, preferred_element_type=f32)
            im = jnp.einsum(
                "n,n->", rr, wi, preferred_element_type=f32
            ) - jnp.einsum("n,n->", ri, wr, preferred_element_type=f32)
            hs.append(jax.lax.complex(re, im))
        h = jnp.stack(hs).astype(dtype)
        for j, (rr, ri) in enumerate(rows_lo):
            rj = jax.lax.complex(
                rr.astype(f32), ri.astype(f32)
            ).astype(dtype)
            w = w - h[j] * rj
        return h, w

    def cond(carry):
        return ~carry[-1]

    def body(carry):
        if GS_LO:
            rows, rows_lo, vk, H, k, c_prev, _, _ = carry
        else:
            rows, vk, H, k, c_prev, _, _ = carry
            rows_lo = None
        w = matvec(k, vk) if indexed else matvec(vk)
        if GS_LO:
            h, w = jax.lax.cond(
                k < GS_LO_AFTER, gs_exact, gs_lo, rows, rows_lo, w
            )
        else:
            h, w = gs_exact(rows, rows_lo, w)
        b = jnp.linalg.norm(w).real
        vnext = jnp.where(b > EPS, 1.0, 0.0) * w / jnp.where(
            b > EPS, b, 1.0
        )
        rows = set_row(rows, k, vnext)
        if GS_LO:
            rows_lo = set_row(rows_lo, k, to_lo(vnext))
        H = H.at[:, k].set(h)
        H = H.at[k + 1, k].set(b.astype(dtype))

        def checked(H, k, c_prev):
            mask = ((row_i <= k) & (col_i <= k)).astype(dtype)
            T = H[:k_max, :k_max] * mask
            c = _expm_taylor_small(scale * T)[:, 0]
            return c, jnp.linalg.norm(c - c_prev)

        if KRY_CHECK2:
            # thinning: the expm/convergence machinery runs on odd
            # iterations, near the cap, and on (near-)breakdown only;
            # an unchecked iteration carries the previous coefficients
            do_check = ((k % 2) == 1) | (k + 2 >= k_max) | (b < 1e-6)

            def unchecked(H, k, c_prev):
                return c_prev, jnp.asarray(jnp.inf, c_prev.real.dtype)

            c, err = jax.lax.cond(
                do_check, checked, unchecked, H, k, c_prev
            )
        else:
            c, err = checked(H, k, c_prev)
        conv = (k > 0) & (err < thresh)
        breakdown = b < EPS
        capped = k + 1 >= k_max
        done = conv | breakdown | capped
        bad = capped & ~conv & ~breakdown
        if GS_LO:
            return rows, rows_lo, vnext, H, k + 1, c, bad, done
        return rows, vnext, H, k + 1, c, bad, done

    if GS_LO:
        carry = (
            rows0, tuple(to_lo(r) for r in rows0), v0, H0,
            jnp.asarray(0), c0, jnp.asarray(False), jnp.asarray(False),
        )
        rows, _, _, _, k_fin, c_fin, bad, _ = jax.lax.while_loop(
            cond, body, carry
        )
    else:
        carry = (
            rows0, v0, H0, jnp.asarray(0), c0,
            jnp.asarray(False), jnp.asarray(False),
        )
        rows, _, _, k_fin, c_fin, bad, _ = jax.lax.while_loop(
            cond, body, carry
        )
    psi_next = zero
    for j in range(k_max):
        psi_next = psi_next + c_fin[j] * rows[j]
    return psi_next, k_fin, bad


def lanczos_ground_state(
    matvec: Callable[[jax.Array], jax.Array],
    v_init: jax.Array,
    block_dim: int = 24,
) -> jax.Array:
    """One restarted-Lanczos pass: Ritz vector of the lowest eigenvalue.

    Used by improved relaxation (reference
    ``matrix_diagonalize_lanczos``, ``_integrator.py:74-138``); the caller
    restarts until the Ritz value stops moving.  Traceable.
    """
    n = v_init.shape[0]
    k_max = min(block_dim, n)
    dtype = v_init.dtype
    v0 = v_init / jnp.linalg.norm(v_init)
    V = jnp.zeros((k_max + 1, n), dtype=dtype).at[0].set(v0)
    alpha = jnp.zeros((k_max,), dtype=jnp.float64)
    beta = jnp.zeros((k_max,), dtype=jnp.float64)

    def cond(carry):
        _, _, _, k, done = carry
        return ~done

    def body(carry):
        V, alpha, beta, k, _ = carry
        w = matvec(V[k])
        a = jnp.vdot(V[k], w).real
        beta_prev = jnp.where(k > 0, beta[k - 1], 0.0)
        w = w - a.astype(dtype) * V[k] - beta_prev.astype(dtype) * V[k - 1]
        b = jnp.linalg.norm(w).real
        V = V.at[k + 1].set(jnp.where(b > EPS, 1.0, 0.0) * w / jnp.where(b > EPS, b, 1.0))
        alpha = alpha.at[k].set(a)
        beta = beta.at[k].set(b)
        done = (b < EPS) | (k + 1 >= k_max)
        return V, alpha, beta, k + 1, done

    carry = (V, alpha, beta, jnp.asarray(0), jnp.asarray(False))
    V, alpha, beta, k_fin, _ = jax.lax.while_loop(cond, body, carry)
    # Mask the inactive tail far above any physical eigenvalue.
    idx = jnp.arange(k_max)
    alpha_m = jnp.where(idx < k_fin, alpha, 1.0e10)
    off = jnp.where(idx[:-1] < k_fin - 1, beta[:-1], 0.0)
    T = jnp.diag(alpha_m) + jnp.diag(off, 1) + jnp.diag(off, -1)
    evals, evecs = jnp.linalg.eigh(T)
    ground = evecs[:, 0].astype(dtype) @ V[:k_max]
    return ground / jnp.linalg.norm(ground)
