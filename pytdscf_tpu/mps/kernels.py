"""Jitted tensor kernels for the MPS/TDVP engine.

Every hot contraction of the reference's 27-case einsum dispatch
(``/root/reference/pytdscf/_contraction.py:1038-1176``) collapses to three
dense einsums here because operators are pre-fused into full-chain MPOs
(see ``operators/mpo_algebra``):

* ``heff_apply``  — ⟨L|W|R⟩ effective Hamiltonian on a site tensor,
* ``keff_apply``  — ⟨L|R⟩ effective operator on a bond matrix,
* ``renorm_block_left/right`` — environment-block transfer.

Index conventions: site tensor ``psi[l, n, r]``; MPO core ``W[a, i, j, b]``
(i = bra, j = ket); left block ``L[b_bra, a, b_ket]``; right block
``R[b_bra, a, b_ket]`` indexed by the bonds facing the block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# TPU matmuls default to bf16 passes; environment-block recursions amplify
# that 0.4%-level error multiplicatively into overflow.  All contractions in
# the TDVP hot path therefore force full-precision accumulation (f32 on TPU
# via bf16x6, exact for f64 on CPU).
PRECISION = jax.lax.Precision.HIGHEST


def _mgs_qr(m: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Thin QR by modified Gram–Schmidt with reorthogonalisation.

    Pure-arithmetic replacement for ``jnp.linalg.qr``: the TPU backend's QR
    and SVD custom calls return garbage (1e9-magnitude entries, ‖QᴴQ−I‖ ~
    1e18) in the null-space columns of near-rank-deficient complex64
    matrices, which then poisons the TDVP environment blocks.  MGS(×2) with
    deterministic canonical-basis completion of rank-deficient columns
    keeps Q orthonormal to machine precision and Q·R = A exact.
    """
    N, r = m.shape
    dtype = m.dtype
    scale = jnp.linalg.norm(m) + jnp.asarray(1e-30, m.real.dtype)
    Q = jnp.zeros((N, r), dtype)
    R = jnp.zeros((r, r), dtype)
    for k in range(r):
        v = m[:, k]
        # two Gram–Schmidt passes against the accumulated Q
        c1 = Q.conj().T @ v
        v = v - Q @ c1
        c2 = Q.conj().T @ v
        v = v - Q @ c2
        R = R.at[:, k].set(c1 + c2)
        nv = jnp.linalg.norm(v)
        bad = nv < 1e-07 * scale
        # deterministic completion: canonical basis vector, orthogonalised
        e = jnp.zeros((N,), dtype).at[k % N].set(1.0)
        e = e - Q @ (Q.conj().T @ e)
        e = e - Q @ (Q.conj().T @ e)
        ne = jnp.linalg.norm(e) + jnp.asarray(1e-30, m.real.dtype)
        v = jnp.where(bad, e / ne, v / jnp.where(bad, 1.0, nv))
        Q = Q.at[:, k].set(v)
        R = R.at[k, k].set(jnp.where(bad, 0.0, nv).astype(dtype))
    return Q, R


import os as _os

#: CholeskyQR refinement rounds (3 = belt-and-braces f32 orthogonality
#: ~6e-7; 2 keeps ~1e-5 on well-conditioned gauges — a perf/accuracy knob
#: for the large-χ bench).
CHQR_ITERS = int(_os.environ.get("PYTDSCF_CHQR_ITERS", "3"))

#: Apply the per-round orthogonalisation as (r, r) triangular INVERSE +
#: MXU matmul instead of an (N, r) triangular solve — see ``_cholesky_qr``.
#: Measured on the real v5e chip (scripts/microbench_chqr.py, (4096, 1024)
#: c64): solve 7.55 ms/factor vs inverse 8.76 ms at identical
#: orthogonality — the chip's triangular_solve is NOT substitution-bound
#: at these shapes, so the solve body is the default.  Set
#: PYTDSCF_CHQR_INVERSE=1 to opt back into the inverse body.
CHQR_INVERSE = (
    _os.environ.get("PYTDSCF_CHQR_INVERSE", "0") == "1"
    and _os.environ.get("PYTDSCF_CHQR_SOLVE", "0") == "0"
)

#: Mixed-precision CholeskyQR (opt-in): run the Gram matmuls of every round
#: EXCEPT the last at bf16x3 (HIGH) instead of f32-exact (HIGHEST = bf16x6).
#: CholeskyQR³ is iterative refinement — early-round Gram errors are
#: corrected by later rounds, and only the FINAL Gram sets the delivered
#: orthogonality (mixed-precision CholeskyQR per Yamazaki et al. 2015).
#: The q-updates (solve / inverse-matmul) stay exact in every round.
CHQR_MIXED_GRAM = _os.environ.get("PYTDSCF_CHQR_MIXED", "0") == "1"

#: Fast early CholeskyQR rounds (opt-in): every round EXCEPT the last
#: applies the orthogonalisation as (r, r) triangular-inverse + bf16x3
#: MXU matmul instead of the exact (N, r) substitution solve.  Same
#: refinement argument as CHQR_MIXED_GRAM — early-round q errors (here
#: ~1e-7 relative from the 3-pass product) are corrected by later rounds,
#: and the FINAL round keeps the exact solve.  Targets the round-3
#: finding that the CHQR cost sits in the triangular solves
#: (BASELINE.md): the (r, r) inverse is ~4× less substitution work than
#: the (N=4r, r) solve and the application becomes one fast MXU pass.
#: CHIP-MEASURED (round 4): NO end-to-end gain (1.304 vs 1.303 s/step)
#: with a 4e-4 population drift — rejected as a default, kept for A/B.
CHQR_FAST = _os.environ.get("PYTDSCF_CHQR_FAST", "0") == "1"

#: Conditional FINAL CholeskyQR round (opt-in): the last round's Gram is
#: always computed (it is the orthogonality certificate), but its
#: Cholesky + triangular solve — the expensive part — runs under a
#: ``lax.cond`` only when the Gram still deviates from identity by more
#: than ``CHQR_COND_TOL``.  Steady-state TDVP gauge inputs are unitary
#: evolutions of isometries, so after two rounds the factor is usually
#: at the f32 floor and the third solve is a no-op; ill-conditioned
#: calls (the ε-noise canonicalisation, adaptive rank opens) still get
#: the full repair.  Unlike PYTDSCF_CHQR_ITERS=2 (8e-4 population drift,
#: rejected round 3), this keeps 3-round QUALITY everywhere.
CHQR_COND = _os.environ.get("PYTDSCF_CHQR_COND", "0") == "1"
CHQR_COND_TOL = float(_os.environ.get("PYTDSCF_CHQR_COND_TOL", "1e-5"))

#: Force the pallas MGS gauge kernel on non-TPU backends (interpret-mode
#: testing) / disable it everywhere.
_PALLAS_QR_FORCE = _os.environ.get("PYTDSCF_PLZ_FORCE", "0") == "1"
_PALLAS_QR_OFF = _os.environ.get("PYTDSCF_PALLAS_QR", "1") == "0"


def _cholesky_qr(
    m: jax.Array, shift_rel: float = 1.0e-06, iters: int = CHQR_ITERS
) -> tuple[jax.Array, jax.Array]:
    """Thin QR by shifted CholeskyQR³ — the large-bond TPU gauge kernel.

    Three rounds of (Gram → shifted Cholesky → triangular solve), all
    MXU-shaped ops (measured ~5 ms for a 4096×1024 complex64 factor on one
    v5e chip vs an unusable unrolled column loop for MGS).  Orthogonality
    of the live columns lands at ~6e-7; exact-zero input columns stay
    EXACTLY zero in Q and their R rows are zeroed, so ``Q·R = A`` holds to
    f32 round-off even for the rank-deficient padded states the
    masked-adaptive sweep carries (the dead-channel invariant
    ``_adaptive_masked_site`` relies on).  Unlike ``jnp.linalg.qr`` on this
    backend, no 1e9-scale junk enters null-space columns (dead channels
    get a unit diagonal patch in the Gram matrix instead).
    """
    N, r = m.shape
    live = jnp.sum(jnp.abs(m), axis=0) > 0
    q = m
    R_acc = None
    # f32 Gram entries carry ~sqrt(N)·eps relative noise; columns whose
    # true Gram eigenvalue sits below that floor can come out NEGATIVE,
    # which breaks Cholesky (NaN).  Both shifts must clear the floor.
    eps = jnp.finfo(m.real.dtype).eps
    noise_floor = 16.0 * jnp.sqrt(jnp.asarray(float(N), m.real.dtype)) * eps
    for it in range(iters):
        gram_prec = (
            jax.lax.Precision.HIGH
            if (CHQR_MIXED_GRAM and it < iters - 1)
            else PRECISION
        )
        g = jnp.einsum("ij,ik->jk", q.conj(), q, precision=gram_prec)
        d = jnp.real(jnp.diag(g))
        # first round: Fukaya-style shift for near-singular live columns;
        # refinements: noise-floor shift only. Dead columns: unit diagonal.
        rel = jnp.maximum(
            jnp.asarray(shift_rel if it == 0 else 0.0, d.dtype), noise_floor
        )
        s = rel * jnp.maximum(jnp.max(d), jnp.asarray(1e-30, d.dtype))
        if CHQR_COND and it == iters - 1 and it > 0:
            # adaptive final round: the Gram doubles as the orthogonality
            # certificate; run the (expensive) Cholesky + solve only when
            # repair is still needed.  Dead columns contribute exact
            # zeros on both sides of the deviation.
            target = jnp.diag(
                jnp.where(live, 1.0, 0.0).astype(g.real.dtype)
            ).astype(g.dtype)
            need = jnp.max(jnp.abs(g - target)) > jnp.asarray(
                CHQR_COND_TOL, g.real.dtype
            )
            g_sh = g + jnp.diag(jnp.where(live, s, 1.0)).astype(g.dtype)

            def _repair(qr):
                q_, R_ = qr
                Lr = jnp.linalg.cholesky(g_sh)
                qn = jax.lax.linalg.triangular_solve(
                    Lr, q_, left_side=False, lower=True,
                    transpose_a=True, conjugate_a=True,
                )
                return qn, Lr.conj().T @ R_

            q, R_acc = jax.lax.cond(
                need, _repair, lambda t: t, (q, R_acc)
            )
            continue
        g = g + jnp.diag(jnp.where(live, s, 1.0)).astype(g.dtype)
        L = jnp.linalg.cholesky(g)
        if CHQR_FAST and it < iters - 1:
            # fast refinement round: q·L^{-†} as one bf16x3 MXU matmul
            # (error ~1e-7·‖q‖, repaired by the remaining rounds; the
            # final round below stays exact)
            Linv = jax.lax.linalg.triangular_solve(
                L, jnp.eye(r, dtype=L.dtype), left_side=True, lower=True
            )
            q = jnp.einsum(
                "ik,jk->ij", q, Linv.conj(),
                precision=jax.lax.Precision.HIGH,
            )
        elif CHQR_INVERSE:
            # opt-in body: invert the (r, r) factor once and apply
            # q·L^{-†} as an MXU matmul (measured slightly SLOWER than
            # the solve on v5e — see CHQR_INVERSE above; kept for
            # backends where solves substitution-bind).  L is
            # block-diagonal w.r.t. live/dead
            # columns (dead Gram rows are zero + unit diagonal patch), so
            # dead columns of q stay exactly zero through the matmul.
            Linv = jax.lax.linalg.triangular_solve(
                L, jnp.eye(r, dtype=L.dtype), left_side=True, lower=True
            )
            q = jnp.einsum(
                "ik,jk->ij", q, Linv.conj(), precision=PRECISION
            )
        else:
            q = jax.lax.linalg.triangular_solve(
                L, q, left_side=False, lower=True,
                transpose_a=True, conjugate_a=True,
            )
        Rit = L.conj().T
        R_acc = Rit if R_acc is None else Rit @ R_acc
    q = jnp.where(live[None, :], q, 0.0)
    R_acc = jnp.where(live[:, None], R_acc, 0.0)
    return q, R_acc


#: bond width above which the unrolled MGS loop is replaced by blocked
#: CholeskyQR on accelerators (compile size and sequential-column latency
#: both scale with r for MGS; CholeskyQR is three fused matmul rounds).
CHOLESKY_QR_MIN_R = 192


def thin_qr(mat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Backend-safe thin QR (LAPACK on CPU, MGS / CholeskyQR³ elsewhere)."""
    return _thin_qr(mat)


def _thin_qr(mat: jax.Array) -> tuple[jax.Array, jax.Array]:
    if jax.default_backend() == "cpu" and not _PALLAS_QR_FORCE:
        return jnp.linalg.qr(mat)
    N, r = mat.shape
    if r >= CHOLESKY_QR_MIN_R and N >= r:
        return _cholesky_qr(mat)
    if (
        jax.default_backend() == "tpu" or _PALLAS_QR_FORCE
    ) and not _PALLAS_QR_OFF:
        from pytdscf_tpu.mps import pallas_qr as PQ

        if PQ.fits(N, r):
            # same MGS(×2) algorithm as ONE pallas program (~30-60 µs vs
            # ~250 µs of per-op XLA dispatches at (240, 30))
            return PQ.mgs_qr_fused(mat)
    return _mgs_qr(mat)


def _thin_qr_deadsafe(mat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Thin QR that keeps exactly-zero input columns EXACTLY zero in Q.

    LAPACK (and the MGS fallback) fill dead columns with orthonormal
    basis completions.  In the SERIAL fixed-D sweep those completions are
    load-bearing — they define the frame through which 1-site TDVP grows
    amplitude into padded bond channels.  The fixed-shape SPMD chain
    however stores masked boundary σ whose zero channels must match
    exactly-zero core channels; completions there leak amplitude into
    σ-annihilated channels (measured as an exactly-halved through-
    boundary transfer rate).  Dead columns are TRAILING in every SPMD
    call site (bond padding; sorted-SVD masks), so R's dead rows are
    zero and the masking is exact.  CholeskyQR is already dead-safe.
    """
    q, r = _thin_qr(mat)
    k = q.shape[1]
    live = (jnp.sum(jnp.abs(mat), axis=0) > 0)[:k]
    return (
        q * live[None, :].astype(q.dtype),
        r * live[:, None].astype(r.dtype),
    )


def enrich_qr(qm: jax.Array, hmat: jax.Array, dD: int, p_proj) -> jax.Array:
    """a1TDVP rank enrichment of a masked orthonormal frame (traceable).

    ``qm`` (M, k): orthonormal live columns, EXACT-zero dead columns (the
    masked fixed-shape convention).  Installs up to ``dD`` leading
    left-singular directions of the projection residual
    ``(1 − QQ†)·hmat`` — the reference's ``get_superblock_full``
    enrichment directions (``/root/reference/pytdscf/_mps_cls.py:1985``) —
    into free (dead) slots, above the ABSOLUTE threshold ``p_proj``.
    Live columns are never overwritten; the enriched columns carry zero
    bond weight until a subsequent bond/K evolution populates them.
    """
    act = jnp.sum(jnp.abs(qm), axis=0) > 0
    resid = hmat - qm @ (qm.conj().T @ hmat)
    u, sv, _ = jnp.linalg.svd(resid, full_matrices=False)
    absmask = sv > jnp.asarray(p_proj).astype(sv.dtype)
    u = jnp.where(absmask[None, :], u, 0.0)
    ncol = min(dD, int(u.shape[1]), int(qm.shape[1]))
    if ncol <= 0:
        return qm
    u = u[:, :ncol]
    slots = jnp.argsort(act)[:ncol]  # free slots first (stable)
    free = ~act[slots]
    cur = qm[:, slots]
    unew = jnp.where(
        (free & (jnp.sum(jnp.abs(u), axis=0) > 0))[None, :],
        u.astype(qm.dtype), cur,
    )
    return qm.at[:, slots].set(unew)


@jax.jit
def qr_right_deadsafe(psi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """`qr_right` preserving exactly-zero right-bond channels (SPMD)."""
    l, n, r = psi.shape
    q, rmat = _thin_qr_deadsafe(psi.reshape(l * n, r))
    return q.reshape(l, n, -1), rmat


@jax.jit
def lq_left_deadsafe(psi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """`lq_left` preserving exactly-zero left-bond channels (SPMD)."""
    l, n, r = psi.shape
    q, rmat = _thin_qr_deadsafe(psi.transpose(2, 1, 0).reshape(r * n, l))
    return rmat.T, q.reshape(r, n, -1).transpose(2, 1, 0)


@jax.jit
def qr_right(psi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Psi(l, n, r) → A(l, n, k), σ(k, r) with A left-orthogonal."""
    l, n, r = psi.shape
    q, rmat = _thin_qr(psi.reshape(l * n, r))
    return q.reshape(l, n, -1), rmat


@jax.jit
def lq_left(psi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Psi(l, n, r) → σ(l, k), B(k, n, r) with B right-orthogonal."""
    l, n, r = psi.shape
    q, rmat = _thin_qr(psi.transpose(2, 1, 0).reshape(r * n, l))
    return rmat.T, q.reshape(r, n, -1).transpose(2, 1, 0)


#: Matmul-pass precisions selectable for the Krylov matvec (the dominant
#: large-χ cost): "highest" = bf16x6 (f32-exact, the default everywhere),
#: "high" = bf16x3 (~1e-6 relative, ~2× faster on the MXU), "default" =
#: single bf16 pass (~4e-3 — too coarse for TDVP, exposed for profiling).
#: Environment-block recursions always stay at HIGHEST: their errors
#: compound multiplicatively over the chain (see PRECISION above).
PREC_MAP = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


@partial(jax.jit, static_argnames=("prec",))
def heff_apply(
    L: jax.Array, W: jax.Array, R: jax.Array, psi: jax.Array,
    prec: str = "highest",
) -> jax.Array:
    """σ[b, i, x] = Σ L[b,a,k] · W[a,i,j,c] · R[x,c,r] · ψ[k,j,r]."""
    return jnp.einsum(
        "bak,aijc,xcr,kjr->bix", L, W, R, psi, optimize=True,
        precision=PREC_MAP[prec],
    )


@partial(jax.jit, static_argnames=("prec",))
def keff_apply(
    L: jax.Array, R: jax.Array, sig: jax.Array, prec: str = "highest"
) -> jax.Array:
    """σ'[b, x] = Σ L[b,a,k] · R[x,a,r] · σ[k,r]."""
    return jnp.einsum(
        "bak,xar,kr->bx", L, R, sig, optimize=True, precision=PREC_MAP[prec]
    )


# --------------------------------------------------- bond-TP (χ-sharded)
# Chain variants of the hot contractions with explicit sharding
# constraints on the big intermediates, for BondTPEngine
# (parallel/bond_tp.py).  Without these, GSPMD's propagation through the
# 4-operand einsums replicates the (χ,w,d,χ) chain tensors on every
# device (measured: χ=4096 site step 19 GiB temp/device on a 2-mesh —
# scripts/bond_tp_memcheck.py, round 5).  The distributed scheme over a
# 1-D "tp" mesh: cores + Krylov vectors sharded on the LEFT bond (axis 0
# — contiguous when flattened, so the whole Krylov loop stays sharded),
# env blocks sharded on their ket axis, the heff R-side operand gathered
# (loop-invariant, hoisted by XLA), and each contraction either local or
# ending in one reduce-scatter.
def make_tp_constrainer(mesh, axis: str):
    """Sharding-constraint helper for the bond-TP chain kernels.

    Returns ``c(x, dim)`` pinning ``x``'s ``dim`` to the mesh axis when
    divisible (identity otherwise; ``dim=None`` pins fully replicated).
    ``c.nshard`` exposes the mesh-axis size for divisibility gating by
    callers.  Returns ``None`` when ``mesh`` is ``None`` so call sites
    can branch on plain truthiness.
    """
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    nshard = mesh.shape[axis]
    rep = NamedSharding(mesh, PartitionSpec())

    def c(x, dim=0):
        if dim is None:
            return jax.lax.with_sharding_constraint(x, rep)
        if nshard <= 1 or x.shape[dim] % nshard:
            return x
        spec = [None] * x.ndim
        spec[dim] = axis
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec(*spec))
        )

    c.nshard = nshard
    return c


def heff_apply_tp(L, W, R, psi, prec, c):
    """σ[b,i,x] like :func:`heff_apply`, χ-sharded: ψ sharded on its left
    bond k, L on its ket k; R/W gathered; chain stays sharded on k until
    the final contraction reduce-scatters σ onto b."""
    p = PREC_MAP[prec]
    t1 = c(jnp.einsum("kjr,xcr->kjxc", psi, R, precision=p), 0)
    t2 = c(jnp.einsum("kjxc,aijc->kiax", t1, W, precision=p), 0)
    return c(jnp.einsum("kiax,bak->bix", t2, L, precision=p), 0)


def keff_apply_tp(L, R, sig, prec, c):
    """σ'[b,x] like :func:`keff_apply`, χ-sharded (see heff_apply_tp)."""
    p = PREC_MAP[prec]
    t1 = c(jnp.einsum("kr,xar->kxa", sig, R, precision=p), 0)
    return c(jnp.einsum("kxa,bak->bx", t1, L, precision=p), 0)


def renorm_block_left_tp(L, a_bra, W, a_ket, prec, c):
    """L'[o,c,p] like :func:`renorm_block_left`, χ-sharded: contract the
    bra pair first (A* gathered once — 1/8 the size of the (χ,w,d,χ)
    chain tensor a reduce-scatter would move), keep the chain sharded on
    the old ket k, reduce-scatter the (χ,w,χ) result onto its ket p."""
    p_ = PREC_MAP[prec]
    t1 = c(jnp.einsum("bak,bio->kaio", L, a_bra.conj(), precision=p_), 0)
    t2 = c(jnp.einsum("kaio,aijc->kojc", t1, W, precision=p_), 0)
    return c(jnp.einsum("kojc,kjp->ocp", t2, a_ket, precision=p_), 2)


def renorm_block_right_tp(R, b_bra, W, b_ket, prec, c):
    """R'[o,c,p] like :func:`renorm_block_right`, χ-sharded (mirror of
    :func:`renorm_block_left_tp`)."""
    p_ = PREC_MAP[prec]
    t1 = c(jnp.einsum("bak,oib->kaoi", R, b_bra.conj(), precision=p_), 0)
    t2 = c(jnp.einsum("kaoi,cija->kocj", t1, W, precision=p_), 0)
    return c(jnp.einsum("kocj,pjk->ocp", t2, b_ket, precision=p_), 2)


# ------------------------------------------------- relaxed (planar bf16)
# The relaxed-Krylov low-precision matvec (iterations ≥ relax_after) as an
# explicitly planar real-imaginary bf16 chain.  vs a prec="default" complex
# einsum this keeps the SAME single-pass MXU work (a complex product is the
# same 4 real matmuls either way) but stores operands AND the two big chain
# intermediates (the (χ,d,χ,w) tensors — 2×256 MB at χ=1024) in bfloat16,
# roughly halving the HBM traffic that dominates the single-pass regime.
# The builders below pre-split the loop-constant L/W/R once OUTSIDE the
# Krylov ``while_loop`` so the casts never re-execute per iteration.
def planar_bf16(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Complex array → (re, im) bfloat16 planes."""
    return x.real.astype(jnp.bfloat16), x.imag.astype(jnp.bfloat16)


def _cx_einsum(eq, a, b, out_dtype=jnp.bfloat16):
    """Complex einsum on planar pairs: 4 real bf16 passes, f32 accumulate,
    ``out_dtype`` storage (bf16 keeps chain intermediates half-width)."""
    f32 = jnp.float32
    (ar, ai), (br, bi) = a, b
    re = jnp.einsum(eq, ar, br, preferred_element_type=f32) - jnp.einsum(
        eq, ai, bi, preferred_element_type=f32
    )
    im = jnp.einsum(eq, ar, bi, preferred_element_type=f32) + jnp.einsum(
        eq, ai, br, preferred_element_type=f32
    )
    return re.astype(out_dtype), im.astype(out_dtype)


def _c_pair(c, pair, dim=0):
    """Apply a bond-TP sharding constraint to a planar (re, im) pair."""
    return (c(pair[0], dim), c(pair[1], dim)) if c else pair


def heff_apply_lo(Lp, Wp, Rp, psi: jax.Array, tp_c=None) -> jax.Array:
    """Single-bf16-pass H_eff matvec with planar operands/intermediates.

    ``Lp``/``Wp``/``Rp``: ``planar_bf16`` pairs of the blocks (pre-split by
    the caller, outside the Krylov loop).  Contraction order matches the
    exact kernel: ψ·R (over r) → ·W (over j,c) → ·L (over a,k).
    ``tp_c``: bond-TP constrainer (:func:`make_tp_constrainer`) keeping
    the chain intermediates χ-sharded under GSPMD."""
    psip = planar_bf16(psi)
    t1 = _c_pair(tp_c, _cx_einsum("kjr,xcr->kjxc", psip, Rp))
    t2 = _c_pair(tp_c, _cx_einsum("kjxc,aijc->kiax", t1, Wp))
    sr, si = _c_pair(
        tp_c, _cx_einsum("kiax,bak->bix", t2, Lp, out_dtype=jnp.float32)
    )
    return jax.lax.complex(sr, si).astype(psi.dtype)


def keff_apply_lo(Lp, Rp, sig: jax.Array, tp_c=None) -> jax.Array:
    """Single-bf16-pass K_eff matvec (see :func:`heff_apply_lo`)."""
    sigp = planar_bf16(sig)
    t1 = _c_pair(tp_c, _cx_einsum("kr,xar->kxa", sigp, Rp))
    sr, si = _c_pair(
        tp_c, _cx_einsum("kxa,bak->bx", t1, Lp, out_dtype=jnp.float32)
    )
    return jax.lax.complex(sr, si).astype(sig.dtype)


def make_hmatvec_lo(pairs, Ls, Ws, Rs, shapes, dtype, facs=None,
                    use_pallas=False, tp_c=None):
    """Relaxed low-precision H_eff matvec over stacked electronic states.

    Pre-splits every loop-constant block to bf16 planes at closure-build
    (trace) time — guaranteed outside the ``lax.while_loop`` body.  With
    ``use_pallas``, pairs whose bonds divide the kernel tile grid route
    through the pallas-fused chain (``mps/pallas_matvec.py``); others fall
    back to the planar einsum path."""
    from pytdscf_tpu.mps import pallas_matvec as PM

    # a pallas_call is opaque to the GSPMD partitioner — χ-sharded
    # (bond-TP) programs always take the constrained planar-einsum path
    use_pallas = use_pallas and tp_c is None
    ops = []
    for (i, j), L, W, R in zip(pairs, Ls, Ws, Rs):
        if use_pallas and PM.heff_shapes_ok(L, W, R, shapes[j]):
            ops.append(("pallas", PM.heff_operands(L, W, R)))
        else:
            ops.append(
                ("einsum", (planar_bf16(L), planar_bf16(W), planar_bf16(R)))
            )

    def mv(vec):
        psis = split_states(vec, shapes)
        sigs = [jnp.zeros(sh, dtype) for sh in shapes]
        for q, ((i, j), (kind, op)) in enumerate(zip(pairs, ops)):
            if kind == "pallas":
                lt, wb, rt = op
                term = PM.heff_pallas(lt, wb, rt, psis[j])
            else:
                lp, wp, rp = op
                term = heff_apply_lo(lp, wp, rp, psis[j], tp_c=tp_c)
            if facs is not None:
                term = term * facs[q].astype(dtype)
            sigs[i] = sigs[i] + term
        return stack_states(sigs)

    return mv


def make_kmatvec_lo(pairs, Ls, Rs, shapes, dtype, facs=None,
                    use_pallas=False, tp_c=None):
    """Relaxed low-precision K_eff matvec (see :func:`make_hmatvec_lo`)."""
    from pytdscf_tpu.mps import pallas_matvec as PM

    use_pallas = use_pallas and tp_c is None
    ops = []
    for (i, j), L, R in zip(pairs, Ls, Rs):
        if use_pallas and PM.keff_shapes_ok(L, R, shapes[j]):
            ops.append(("pallas", PM.keff_operands(L, R)))
        else:
            ops.append(("einsum", (planar_bf16(L), planar_bf16(R))))

    def mv(vec):
        xs = split_states(vec, shapes)
        out = [jnp.zeros(sh, dtype) for sh in shapes]
        for q, ((i, j), (kind, op)) in enumerate(zip(pairs, ops)):
            if kind == "pallas":
                lt, rt = op
                term = PM.keff_pallas(lt, rt, xs[j])
            else:
                lp, rp = op
                term = keff_apply_lo(lp, rp, xs[j], tp_c=tp_c)
            if facs is not None:
                term = term * facs[q].astype(dtype)
            out[i] = out[i] + term
        return stack_states(out)

    return mv


@partial(jax.jit, static_argnames=("prec",))
def renorm_block_left(
    L: jax.Array, a_bra: jax.Array, W: jax.Array, a_ket: jax.Array,
    prec: str = "highest",
) -> jax.Array:
    """L'[o, c, p] = Σ A*_bra[b,i,o] · W[a,i,j,c] · A_ket[k,j,p] · L[b,a,k].

    ``prec`` defaults to f32-exact accumulation: block errors compound
    multiplicatively over the chain.  The engine's ``env_precision`` knob
    lowers it to bf16x3 for short chains in the compute-bound large-χ
    regime (~1e-7 relative per transfer; blocks are renormalised each
    site, so over tens of sites the compounded error stays ≪ 1e-5)."""
    return jnp.einsum(
        "bak,bio,aijc,kjp->ocp", L, a_bra.conj(), W, a_ket,
        optimize=True, precision=PREC_MAP[prec],
    )


@partial(jax.jit, static_argnames=("prec",))
def renorm_block_right(
    R: jax.Array, b_bra: jax.Array, W: jax.Array, b_ket: jax.Array,
    prec: str = "highest",
) -> jax.Array:
    """R'[o, c, p] = Σ B*_bra[o,i,b] · W[c,i,j,a] · B_ket[p,j,k] · R[b,a,k]."""
    return jnp.einsum(
        "bak,oib,cija,pjk->ocp", R, b_bra.conj(), W, b_ket,
        optimize=True, precision=PREC_MAP[prec],
    )


@jax.jit
def absorb_right(sig: jax.Array, b_core: jax.Array) -> jax.Array:
    """Psi(p+1) = σ · B(p+1):   (k, r) × (r, n, s) → (k, n, s)."""
    return jnp.einsum("kr,rns->kns", sig, b_core, precision=PRECISION)


@jax.jit
def absorb_left(a_core: jax.Array, sig: jax.Array) -> jax.Array:
    """Psi(p−1) = A(p−1) · σ:   (l, n, s) × (s, k) → (l, n, k)."""
    return jnp.einsum("lns,sk->lnk", a_core, sig, precision=PRECISION)


# --------------------------------------------------------------- overlaps
@jax.jit
def ovlp_left_conj(S: jax.Array, bra: jax.Array, ket: jax.Array) -> jax.Array:
    """S'[o, p] = Σ bra*[b,n,o] · ket[k,n,p] · S[b,k]."""
    return jnp.einsum("bk,bno,knp->op", S, bra.conj(), ket, optimize=True, precision=PRECISION)


@jax.jit
def ovlp_left_noconj(S: jax.Array, bra: jax.Array, ket: jax.Array) -> jax.Array:
    """Unconjugated transfer (T/2-trick autocorrelation)."""
    return jnp.einsum("bk,bno,knp->op", S, bra, ket, optimize=True, precision=PRECISION)


def stack_states(states) -> jax.Array:
    """Concatenate raveled per-state tensors into one Krylov vector."""
    return jnp.concatenate([s.ravel() for s in states])


def split_states(vec: jax.Array, shapes) -> list[jax.Array]:
    """Inverse of :func:`stack_states` for static ``shapes``."""
    out = []
    ofs = 0
    for sh in shapes:
        n = 1
        for d in sh:
            n *= d
        out.append(jax.lax.dynamic_slice_in_dim(vec, ofs, n).reshape(sh))
        ofs += n
    return out


@jax.jit
def _stack_leading(xs):
    return jnp.stack(xs, axis=0)


def stack_leading(xs) -> jax.Array:
    """Stack same-shape arrays along a new leading (scan) axis — jitted so
    complex arrays never dispatch eagerly (TPU-hostile)."""
    return _stack_leading(tuple(xs))


@partial(jax.jit, static_argnames=("t",))
def take_leading(x: jax.Array, t: int) -> jax.Array:
    """``x[t]`` along the leading axis, jitted (complex-safe slicing)."""
    return x[t]


@partial(jax.jit, static_argnames=("left",))
def gauge_error(core: jax.Array, left: bool) -> jax.Array:
    """max |Q†Q − I| of a gauge move's output (left- or right-orthonormal)
    — the reference validates canonicality inside the sweep when running
    under pytest (``_site_cls.py:502-561``, ``const.pytest_enabled``)."""
    l, n, r = core.shape
    if left:
        m = core.reshape(l * n, r)
        g = m.conj().T @ m
        eye = jnp.eye(r, dtype=g.dtype)
    else:
        m = core.reshape(l, n * r)
        g = m @ m.conj().T
        eye = jnp.eye(l, dtype=g.dtype)
    return jnp.max(jnp.abs(g - eye))


@jax.jit
def active_rank(c: jax.Array) -> jax.Array:
    """Number of exactly-nonzero right-bond channels of an (l, n, r) core."""
    return jnp.sum(jnp.sum(jnp.abs(c), axis=(0, 1)) > 0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("tl", "tr"))
def pad_core(c: jax.Array, tl: int, tr: int) -> jax.Array:
    """Zero-pad an (l, n, r) core to bond caps (tl, n, tr) — the masked
    adaptive sweep carries live ranks as exact-zero channels."""
    l, n, r = c.shape
    return jnp.pad(c, ((0, tl - l), (0, 0), (0, tr - r)))
