"""ONE pallas program per TDVP site update (small-bond TPU fast path).

Composes the proven phase kernels — the single-kernel Lanczos
(``pallas_lanczos._lanczos_phase``) and the MGS(×2) gauge
(``pallas_qr._mgs_phase``) — with the environment-block renormalisation
and the bond (K) evolution into a single launch covering the ENTIRE
non-boundary site step of ``tdvp._site_step_impl``:

    H-Krylov → thin QR gauge → block renorm (+ log-scale) → K-Krylov →
    absorb into the next core

Everything stays VMEM-resident between phases; the only XLA glue left per
site is the H/G channel pre-contraction and plane packing.  Layout facts
that shape the implementation (all chip-probed):

* the renorm is ``Qᴴ H_c Q`` — the H channels double as the renorm
  operator, so the kernel reuses them (built WITHOUT the env log-scale
  factor; ``hfac``/``kfac`` scale the matvec output instead);
* forward QR needs ψᵀ — a plain 2-D ``jnp.transpose`` (Mosaic-legal);
  the BACKWARD matricisation (l·d, r) → (l, d·r) is a memory-order
  reshape Mosaic rejects, so it runs as exact 0/1 SELECTION-MATRIX
  matmuls: Ψ̃ = Σ_b S_b ψ T_b with S_b[a,m] = [m = a·d+b],
  T_b[c,q] = [q = b·r+c];
* backward renorm uses the mirrored channels
  G_c[(i b),(j k)] = Σ_a W[c,i,j,a]·R[b,a,k] (XLA-built, like H_c).

Semantics parity target: ``tdvp._site_step_impl`` (non-last, fixed-rank,
single state pair, Lanczos) — which itself mirrors the reference
``/root/reference/pytdscf/_site_cls.py`` site update.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pytdscf_tpu.mps.pallas_lanczos import (
    _KPAD,
    _cmm,
    _compiler_params,
    _interpret,
    _lanczos_phase,
    _mm,
)
from pytdscf_tpu.mps.pallas_qr import _mgs_phase

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

F32 = jnp.float32
_PREC = jax.lax.Precision.HIGHEST


def _norm2(re, im):
    return jnp.sqrt(jnp.sum(re * re + im * im))


def _site_kernel(
    scal_ref,  # SMEM (8,): sre, sim, thresh, conserve, hfac, l_sys, l_env
    vre_ref, vim_ref,    # (M, r) current site tensor
    hre_ref, him_ref,    # (nc, M, M) H channels (no fac)
    rre_ref, rim_ref,    # (nc, r, r) Rt channels (H side; fwd K reuses)
    gre_ref, gim_ref,    # bwd: (nc, DR, DR) G channels / fwd: (1,8,128) dummy
    klre_ref, klim_ref,  # bwd: (nc, l, l) env-L slices / fwd dummy
    ncre_ref, ncim_ref,  # next core flat: fwd (r, P2) / bwd (P2, l)
    qtre_ref, qtim_ref,  # out Qᵀ: fwd (r, M) / bwd (l, DR)
    pnre_ref, pnim_ref,  # out ψ_next flat: fwd (keep, P2) / bwd (P2, keep)
    bre_ref, bim_ref,    # out blocks (nc, keep, keep), normalised
    dl_ref,              # out (1, 1) f32: log-scale delta
    stat_ref,            # out (1, 4) i32: kH, badH, kK, badK
    VH_ref, prevH_ref,   # scratch H-Krylov
    VK_ref, prevK_ref,   # scratch K-Krylov
    ab_ref, flag_ref,    # shared phase scratch
    sgre_ref, sgim_ref,  # scratch σ (keep, keep)
    tqre_ref, tqim_ref,  # scratch MGS input staging (qt_shape)
    *,
    kmaxH: int,
    kmaxK: int,
    nc: int,
    forward: bool,
    l: int,
    d: int,
    r: int,
):
    sre = scal_ref[0]
    sim = scal_ref[1]
    thresh = scal_ref[2]
    conserve = scal_ref[3]
    hfac = scal_ref[4]
    l_sys = scal_ref[5]
    l_env = scal_ref[6]
    M = l * d
    DR = d * r
    keep = r if forward else l

    # ---------------------------------------------------- H-Krylov phase
    def matvec_h(xre, xim):
        wre = jnp.zeros_like(xre)
        wim = jnp.zeros_like(xim)
        for c in range(nc):
            tre, tim = _cmm(xre, xim, rre_ref[c], rim_ref[c])
            ure, uim = _cmm(hre_ref[c], him_ref[c], tre, tim)
            wre = wre + ure
            wim = wim + uim
        return wre, wim

    beta0 = _norm2(vre_ref[:], vim_ref[:])
    b0inv = 1.0 / beta0
    _lanczos_phase(
        matvec_h, vre_ref[:] * b0inv, vim_ref[:] * b0inv,
        VH_ref, prevH_ref, ab_ref, flag_ref, sre, sim, thresh, kmaxH,
        fac=hfac,
    )
    kH = flag_ref[2]
    badH = flag_ref[1]
    pn = _norm2(prevH_ref[0], prevH_ref[1])
    facH = jnp.where(conserve > 0.5, 1.0 / pn, beta0)
    p1re = prevH_ref[0] * facH
    p1im = prevH_ref[1] * facH

    # ------------------------------------------------------- gauge (QR)
    if forward:
        # thin QR of ψ(M, r): MGS works on ψᵀ rows (staged into scratch —
        # the phase slices its input with pl.ds, which needs a ref)
        tqre_ref[:] = jnp.transpose(p1re)
        tqim_ref[:] = jnp.transpose(p1im)
        _mgs_phase(
            tqre_ref, tqim_ref,
            qtre_ref, qtim_ref, sgre_ref, sgim_ref, r=r, n=M,
        )
        # σ = R directly (ψ = Q R)
        s0re = sgre_ref[:]
        s0im = sgim_ref[:]
    else:
        # (l·d, r) → (l, d·r) via exact selection matmuls (Mosaic has no
        # memory-order reshape)
        rowM = jax.lax.broadcasted_iota(jnp.int32, (l, M), 1)
        rowl = jax.lax.broadcasted_iota(jnp.int32, (l, M), 0)
        colDR = jax.lax.broadcasted_iota(jnp.int32, (r, DR), 1)
        colr = jax.lax.broadcasted_iota(jnp.int32, (r, DR), 0)
        tre = jnp.zeros((l, DR), F32)
        tim = jnp.zeros((l, DR), F32)
        for b in range(d):
            Sb = (rowM == rowl * d + b).astype(F32)
            Tb = (colDR == b * r + colr).astype(F32)
            tre = tre + _mm(_mm(Sb, p1re), Tb)
            tim = tim + _mm(_mm(Sb, p1im), Tb)
        # LQ: ψ̃(l, d·r) = σ · B with B row-orthonormal ⇒ MGS on ψ̃ rows
        tqre_ref[:] = tre
        tqim_ref[:] = tim
        _mgs_phase(
            tqre_ref, tqim_ref,
            qtre_ref, qtim_ref, sgre_ref, sgim_ref, r=l, n=DR,
        )
        # σ = R̂ᵀ (ψ̃ᵀ = Q R̂ ⇒ ψ̃ = R̂ᵀ Qᵀ)
        s0re = jnp.transpose(sgre_ref[:])
        s0im = jnp.transpose(sgim_ref[:])

    # -------------------------------------------- block renorm + logs
    qt_re = qtre_ref[:]
    qt_im = qtim_ref[:]
    q_re = jnp.transpose(qt_re)
    q_im = jnp.transpose(qt_im)
    blocks = []
    tot = jnp.asarray(0.0, F32)
    for c in range(nc):
        if forward:
            t1re, t1im = _cmm(hre_ref[c], him_ref[c], q_re, q_im)
        else:
            t1re, t1im = _cmm(gre_ref[c], gim_ref[c], q_re, q_im)
        lre, lim = _cmm(qt_re, -qt_im, t1re, t1im)
        blocks.append((lre, lim))
        tot = tot + jnp.sum(lre * lre + lim * lim)
    nB = jnp.maximum(jnp.sqrt(tot), 1e-30)
    nBinv = 1.0 / nB
    for c in range(nc):
        bre_ref[c] = blocks[c][0] * nBinv
        bim_ref[c] = blocks[c][1] * nBinv
    dl = jnp.log(nB)
    # full-array store: Mosaic rejects scalar stores to VMEM
    dl_ref[:] = jnp.zeros_like(dl_ref) + dl

    # ---------------------------------------------------- K-Krylov phase
    kfac = jnp.exp(l_sys + dl + l_env)
    if forward:
        # kL = blocks_new (refs), kR = the H-side Rt channels
        def matvec_k(xre, xim):
            wre = jnp.zeros_like(xre)
            wim = jnp.zeros_like(xim)
            for c in range(nc):
                tre, tim = _cmm(xre, xim, rre_ref[c], rim_ref[c])
                ure, uim = _cmm(bre_ref[c], bim_ref[c], tre, tim)
                wre = wre + ure
                wim = wim + uim
            return wre, wim
    else:
        # kL = env-L slices (inputs), kR = blocks_new (transposed once)
        brts = [
            (jnp.transpose(bre_ref[c]), jnp.transpose(bim_ref[c]))
            for c in range(nc)
        ]

        def matvec_k(xre, xim):
            wre = jnp.zeros_like(xre)
            wim = jnp.zeros_like(xim)
            for c in range(nc):
                tre, tim = _cmm(xre, xim, brts[c][0], brts[c][1])
                ure, uim = _cmm(klre_ref[c], klim_ref[c], tre, tim)
                wre = wre + ure
                wim = wim + uim
            return wre, wim

    beta0k = _norm2(s0re, s0im)
    bkinv = 1.0 / beta0k
    _lanczos_phase(
        matvec_k, s0re * bkinv, s0im * bkinv,
        VK_ref, prevK_ref, ab_ref, flag_ref, -sre, -sim, thresh, kmaxK,
        fac=kfac,
    )
    kK = flag_ref[2]
    badK = flag_ref[1]
    pnk = _norm2(prevK_ref[0], prevK_ref[1])
    facK = jnp.where(conserve > 0.5, 1.0 / pnk, beta0k)
    sgre = prevK_ref[0] * facK
    sgim = prevK_ref[1] * facK

    # ------------------------------------------------------------ absorb
    if forward:
        # ψ_next = σ(keep, r) @ nc(r, P2)
        pnre, pnim = _cmm(sgre, sgim, ncre_ref[:], ncim_ref[:])
    else:
        # ψ_next = nc(P2, l) @ σ(l, keep)
        pnre, pnim = _cmm(ncre_ref[:], ncim_ref[:], sgre, sgim)
    pnre_ref[:] = pnre
    pnim_ref[:] = pnim
    stat_ref[:] = jnp.stack([
        kH.astype(jnp.int32), badH.astype(jnp.int32),
        kK.astype(jnp.int32), badK.astype(jnp.int32),
    ])[None, :]


def site_fits(shape, W_shape, next_shape, max_dim: int) -> bool:
    """Shape/VMEM gate for the fused site kernel (single pair)."""
    l, d, r = shape
    M = l * d
    keep = None  # direction-dependent; check both
    nc = W_shape[-1]
    if W_shape[0] != W_shape[-1]:
        return False  # channel reuse assumes square MPO bond
    if max_dim > _KPAD:
        return False
    if M < 8 or r < 2 or M < r or d * r < l or l < 2:
        return False
    p2 = next_shape[1] * next_shape[2] if next_shape is not None else 0
    rpad = max(r, 128)
    vbytes = (max_dim + 5) * 2 * M * rpad * 4
    hbytes = 2 * nc * 2 * M * max(M, 128) * 4  # H + (bwd) G channels
    if vbytes + hbytes + 2 * max(p2, 128) * max(l, r) * 4 > 60 * 1024 * 1024:
        return False
    return True


def _planes(x):
    return jnp.real(x).astype(F32), jnp.imag(x).astype(F32)


def site_step_fused(
    psi, next_core, L, W, R, scale, thresh, lL, lR, *,
    forward: bool, max_dim: int, conserve: bool,
):
    """Run one full site update as ONE pallas program.

    Mirrors ``tdvp._site_step_impl`` for the non-last fixed-rank
    single-pair Lanczos case.  Returns (site_out, psi_next, blocks_new,
    logs_new, kry_count_delta) with the engine's conventions."""
    l, d, r = psi.shape
    M = l * d
    DR = d * r
    keep = r if forward else l
    nc = W.shape[-1]
    kmaxH = min(max_dim, M * r)
    kmaxK = min(max_dim, keep * (r if forward else l))

    lre, lim = _planes(L)
    wre, wim = _planes(W)

    def ein(eq, a, b):
        return jnp.einsum(eq, a, b, precision=_PREC)

    hre = ein("bak,aijc->cbikj", lre, wre) - ein("bak,aijc->cbikj", lim, wim)
    him = ein("bak,aijc->cbikj", lre, wim) + ein("bak,aijc->cbikj", lim, wre)
    hre = hre.reshape(nc, M, M)
    him = him.reshape(nc, M, M)
    Rt = jnp.transpose(R, (1, 2, 0))  # (x, c, r) -> (c, r, x)
    rre, rim = _planes(Rt)

    if forward:
        gre = gim = jnp.zeros((1, 8, 128), F32)
        klre = klim = jnp.zeros((1, 8, 128), F32)
        ncflat = next_core.reshape(r, -1)
    else:
        rre_raw, rim_raw = _planes(R)
        gre = (
            ein("cija,bak->cibjk", wre, rre_raw)
            - ein("cija,bak->cibjk", wim, rim_raw)
        ).reshape(nc, DR, DR)
        gim = (
            ein("cija,bak->cibjk", wre, rim_raw)
            + ein("cija,bak->cibjk", wim, rre_raw)
        ).reshape(nc, DR, DR)
        Lt = jnp.transpose(L, (1, 0, 2))  # (a, b, k)
        klre, klim = _planes(Lt)
        ncflat = next_core.reshape(-1, l)

    ncre, ncim = _planes(ncflat)
    vre, vim = _planes(psi.reshape(M, r))
    hfac = jnp.exp(lL + lR)
    scal = jnp.stack([
        jnp.real(scale).astype(F32), jnp.imag(scale).astype(F32),
        jnp.asarray(thresh, F32),
        jnp.asarray(1.0 if conserve else 0.0, F32),
        hfac.astype(F32),
        (lL if forward else lR).astype(F32),
        (lR if forward else lL).astype(F32),
        jnp.asarray(0.0, F32),
    ])
    qt_shape = (r, M) if forward else (l, DR)
    pn_shape = (
        (keep, ncflat.shape[1]) if forward else (ncflat.shape[0], keep)
    )
    sig_n = r if forward else l
    out = pl.pallas_call(
        partial(
            _site_kernel, kmaxH=kmaxH, kmaxK=kmaxK, nc=nc,
            forward=forward, l=l, d=d, r=r,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(qt_shape, F32),
            jax.ShapeDtypeStruct(qt_shape, F32),
            jax.ShapeDtypeStruct(pn_shape, F32),
            jax.ShapeDtypeStruct(pn_shape, F32),
            jax.ShapeDtypeStruct((nc, keep, keep), F32),
            jax.ShapeDtypeStruct((nc, keep, keep), F32),
            jax.ShapeDtypeStruct((1, 1), F32),
            jax.ShapeDtypeStruct((1, 4), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=_SMEM)]
        + [pl.BlockSpec(memory_space=_VMEM)] * 12,
        out_specs=tuple(
            pl.BlockSpec(memory_space=_VMEM) for _ in range(8)
        ),
        scratch_shapes=[
            pltpu.VMEM((kmaxH + 1, 2, M, r), F32),
            pltpu.VMEM((2, M, r), F32),
            pltpu.VMEM((kmaxK + 1, 2, keep, sig_n), F32),
            pltpu.VMEM((2, keep, sig_n), F32),
            pltpu.VMEM((4, _KPAD), F32),
            pltpu.SMEM((4,), F32),
            pltpu.VMEM((keep, sig_n), F32),
            pltpu.VMEM((keep, sig_n), F32),
            pltpu.VMEM(qt_shape, F32),
            pltpu.VMEM(qt_shape, F32),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(
        scal, vre, vim, hre, him, rre, rim, gre, gim, klre, klim,
        ncre, ncim,
    )
    qtre, qtim, pnre, pnim, bre, bim, dlv, stat = out
    dtype = psi.dtype
    if forward:
        site_out = jnp.transpose(
            jax.lax.complex(qtre, qtim)
        ).astype(dtype).reshape(l, d, r)
        psi_next = jax.lax.complex(pnre, pnim).astype(dtype).reshape(
            keep, next_core.shape[1], next_core.shape[2]
        )
    else:
        site_out = jax.lax.complex(qtre, qtim).astype(dtype).reshape(
            l, d, r
        )
        psi_next = jax.lax.complex(pnre, pnim).astype(dtype).reshape(
            next_core.shape[0], next_core.shape[1], keep
        )
    blocks_new = jnp.transpose(
        jax.lax.complex(bre, bim), (1, 0, 2)
    ).astype(dtype)
    log_new = (lL if forward else lR) + dlv[0, 0]
    kH = stat[0, 0]
    badH = (stat[0, 1] == 1) & jnp.asarray(kmaxH < M * r)
    kK = stat[0, 2]
    badK = (stat[0, 3] == 1) & jnp.asarray(kmaxK < keep * sig_n)
    kry = jnp.stack([
        kH + kK,
        jnp.asarray(2, jnp.int32),
        badH.astype(jnp.int32) + badK.astype(jnp.int32),
    ])
    return site_out, psi_next, blocks_new, log_new, kry
