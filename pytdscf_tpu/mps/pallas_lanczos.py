"""Single-kernel short-iterative-Lanczos for small local dimensions.

At small bond dimension (the reference's own flagship regime — the 184-site
singlet-fission chain runs at D=30, ``/root/reference/docs/notebook/
singlet_fission_nprocs.md``) the TDVP site update is DEVICE-bound on per-op
sequencing, not FLOPs: one Krylov iteration under XLA is ~60 separate tiny
ops (matvec einsums, Gram–Schmidt, the tridiagonal exponential) at ~1 µs
each while the MXU sits idle.  This kernel runs the ENTIRE ``krylov_expm``
Lanczos call — recurrence, tridiagonal exp(scale·T)e₀ and the reference's
ψ-difference convergence rule — as ONE pallas program, so those ops become
straight-line VLIW code with no per-op dispatch.

Matvec formulation (no in-kernel transposes — Mosaic rejects 4-D pivots):
the caller pre-contracts the MPO core into per-``c`` channel matrices

    H_c[(b,i), (k,j)] = Σ_a L[b,a,k] · W[a,i,j,c]        (XLA, once/site)

so the effective-Hamiltonian product is a pivot-free 2-matmul chain

    σ = Σ_c H_c @ (ψ @ R_cᵀ),   R_cᵀ[r, x] = R[x, c, r]

(for the K_eff bond evolution the same kernel runs with H_a = L_a and
R_aᵀ — no MPO core).  All complex arithmetic is planar f32 with
``precision=HIGHEST`` real matmuls (bit-compatible with the engine's
f32-exact einsum path; Mosaic accepts HIGHEST on f32 operands).

The tridiagonal exponential ``exp(scale·T_k)e₀`` is evaluated in-kernel by
scaling-and-Taylor on the COEFFICIENT VECTOR: substep count from the Gersh-
gorin bound ‖scale·T‖ ≤ |scale|(max|α|+2max|β|), then an order-10 Taylor
recurrence per substep — every op a (1,K)·(K,K) pass on the padded buffer.
Lanczos semantics match ``integrator._lanczos_loop`` exactly: oblique
α_k = ⟨v₀|H v_k⟩, Re(α) on the diagonal, convergence when
‖ψ(k) − ψ(k−1)‖ < thresh, breakdown at β < 1e-14, cap at k_max
(reference ``/root/reference/pytdscf/_integrator.py:538-568``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

F32 = jnp.float32
#: f32 matmuls at HIGHEST are f32-exact on the MXU (probed on-chip:
#: rel err 2.4e-7; HIGH is rejected by Mosaic, DEFAULT is one bf16 pass).
_PREC = jax.lax.Precision.HIGHEST
EPS_BREAKDOWN = 1.0e-14
#: Taylor order per substep; with ‖scale·T‖ ≤ 0.5 per substep the
#: truncation error is 0.5^11/11! ≈ 1e-11 ≪ f32 round-off.
_TAYLOR_ORDER = 10
_SUBSTEP_NORM = 0.5
#: Padded size of the coefficient-space buffers (covers max_krylov up to
#: 32; lanes pad to 128 inside the kernel regardless).
_KPAD = 32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    if pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=F32, precision=_PREC)


def _cmm(ar, ai, br, bi):
    """Planar complex matmul: (ar+i·ai) @ (br+i·bi), f32-exact."""
    return (
        _mm(ar, br) - _mm(ai, bi),
        _mm(ar, bi) + _mm(ai, br),
    )


def _lanczos_phase(
    matvec, v0re, v0im, V_ref, prev_ref, ab_ref, flag_ref,
    sre, sim, thresh, kmax: int, fac=None,
):
    """Run the full SIL loop; leaves ψ(k_fin) in ``prev_ref`` and
    (done, bad, k_fin, beta_prev) in ``flag_ref[0:4]``.

    ``matvec(vre, vim) -> (wre, wim)`` is a trace-time closure; ``fac``
    (optional real scalar) scales the operator.  The scratch refs are
    (re)initialised here, so one kernel can run several phases.
    ``v0re``/``v0im`` must be NORMALISED."""
    V_ref[:] = jnp.zeros_like(V_ref)
    V_ref[0, 0] = v0re
    V_ref[0, 1] = v0im
    prev_ref[:] = jnp.zeros_like(prev_ref)
    ab_ref[:] = jnp.zeros_like(ab_ref)
    flag_ref[0] = 0.0  # done
    flag_ref[1] = 0.0  # bad
    flag_ref[2] = 0.0  # k_fin
    flag_ref[3] = 0.0  # beta_prev

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _KPAD), 1)

    def iteration(k, _):
        @pl.when(flag_ref[0] == 0.0)
        def _body():
            vre = V_ref[k, 0]
            vim = V_ref[k, 1]
            wre, wim = matvec(vre, vim)
            if fac is not None:
                wre = wre * fac
                wim = wim * fac
            # ---- oblique alpha = <v0|w>
            v0re = V_ref[0, 0]
            v0im = V_ref[0, 1]
            are = jnp.sum(v0re * wre + v0im * wim)
            aim = jnp.sum(v0re * wim - v0im * wre)
            beta_prev = flag_ref[3]
            # ---- w -= alpha*V[k] + beta_prev*V[k-1]
            km1 = jnp.maximum(k - 1, 0)
            g = (k > 0).astype(F32)
            wre = wre - (are * vre - aim * vim) - g * beta_prev * V_ref[km1, 0]
            wim = wim - (are * vim + aim * vre) - g * beta_prev * V_ref[km1, 1]
            b = jnp.sqrt(jnp.sum(wre * wre + wim * wim))
            live = (b > EPS_BREAKDOWN).astype(F32)
            binv = live / jnp.where(b > EPS_BREAKDOWN, b, 1.0)
            V_ref[k + 1, 0] = wre * binv
            V_ref[k + 1, 1] = wim * binv
            # masked full-row writes (Mosaic rejects scalar stores to VMEM)
            here = (lane == k).astype(F32)
            ab_ref[0:1, :] = ab_ref[0:1, :] * (1.0 - here) + are * here
            ab_ref[1:2, :] = ab_ref[1:2, :] * (1.0 - here) + aim * here
            ab_ref[2:3, :] = (
                ab_ref[2:3, :] * (1.0 - here) + (b * live) * here
            )
            flag_ref[3] = b * live
            # ---- exp(scale·T_k)e0 by substepped Taylor on the coefficients
            act = (lane <= k).astype(F32)
            act_off = (lane < k).astype(F32)
            arow = ab_ref[0:1, :] * act          # Re(alpha), masked
            brow = ab_ref[2:3, :] * act_off      # beta, masked
            i2 = jax.lax.broadcasted_iota(jnp.int32, (_KPAD, _KPAD), 0)
            j2 = jax.lax.broadcasted_iota(jnp.int32, (_KPAD, _KPAD), 1)
            a_by_j = jnp.broadcast_to(arow, (_KPAD, _KPAD))
            b_by_j = jnp.broadcast_to(brow, (_KPAD, _KPAD))
            # symmetric tridiagonal: T[j+1,j] = T[j,j+1] = beta_j.  The
            # superdiagonal needs beta_{j-1} BY COLUMN — produced with a
            # lane shift via the shift matrix (no in-kernel transpose of
            # broadcasts): (brow @ S)[j] = brow[j-1].
            shift = (j2 == i2 + 1).astype(F32)
            bshift = jnp.broadcast_to(_mm(brow, shift), (_KPAD, _KPAD))
            T = (
                jnp.where(i2 == j2, a_by_j, 0.0)
                + jnp.where(i2 == j2 + 1, b_by_j, 0.0)
                + jnp.where(j2 == i2 + 1, bshift, 0.0)
            )
            # substep count from the Gershgorin bound
            smag = jnp.sqrt(sre * sre + sim * sim)
            bound = smag * (
                jnp.max(jnp.abs(arow)) + 2.0 * jnp.max(jnp.abs(brow))
            )
            m = jnp.maximum(
                jnp.ceil(bound / _SUBSTEP_NORM), 1.0
            ).astype(jnp.int32)
            minv = 1.0 / m.astype(F32)
            ssre = sre * minv
            ssim = sim * minv
            e0 = (lane == 0).astype(F32)
            yre = e0
            yim = jnp.zeros_like(e0)

            def substep(_, y):
                yr, yi = y
                tr, ti = yr, yi
                accr, acci = yr, yi
                for t in range(1, _TAYLOR_ORDER + 1):
                    zr = _mm(tr, T)
                    zi = _mm(ti, T)
                    inv_t = 1.0 / float(t)
                    tr = (ssre * zr - ssim * zi) * inv_t
                    ti = (ssre * zi + ssim * zr) * inv_t
                    accr = accr + tr
                    acci = acci + ti
                return accr, acci

            yre, yim = jax.lax.fori_loop(
                jnp.int32(0), m, substep, (yre, yim)
            )
            # ---- ψ(k) = c @ V[:kmax]  (padded rows carry exact zeros)
            pre = jnp.zeros_like(vre)
            pim = jnp.zeros_like(vim)
            for kk in range(kmax):
                cr = yre[0, kk]
                ci = yim[0, kk]
                pre = pre + cr * V_ref[kk, 0] - ci * V_ref[kk, 1]
                pim = pim + cr * V_ref[kk, 1] + ci * V_ref[kk, 0]
            dre = pre - prev_ref[0]
            dim_ = pim - prev_ref[1]
            err = jnp.sqrt(jnp.sum(dre * dre + dim_ * dim_))
            prev_ref[0] = pre
            prev_ref[1] = pim
            conv = ((k > 0) & (err < thresh)).astype(F32)
            breakdown = 1.0 - live
            capped = (k + 1 >= kmax).astype(F32)
            done = jnp.minimum(conv + breakdown + capped, 1.0)
            bad = capped * (1.0 - conv) * (1.0 - breakdown)
            flag_ref[0] = done
            flag_ref[1] = bad
            flag_ref[2] = (k + 1).astype(F32)

        return jnp.int32(0)

    # i32 bounds: under the package-wide x64 flag a plain fori_loop index
    # traces as i64, and Mosaic's i64 convert rule recurses infinitely
    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(kmax), iteration, jnp.int32(0)
    )


def _lanczos_kernel(
    scal_ref,   # SMEM (4,): scale_re, scale_im, thresh, conserve flag
    vre_ref,    # VMEM (M, r) UNNORMALISED start vector, real plane
    vim_ref,    # VMEM (M, r) imaginary plane
    hre_ref,    # VMEM (nc, M, M) channel matrices H_c, real plane
    him_ref,    # VMEM (nc, M, M) imaginary plane
    rre_ref,    # VMEM (nc, r, r) transposed right channels R_cᵀ, real
    rim_ref,    # VMEM (nc, r, r) imaginary
    ore_ref,    # VMEM (M, r) ψ_next real plane (norm handling applied)
    oim_ref,    # VMEM (M, r) imaginary plane
    stat_ref,   # VMEM (1, 2) i32: k_used, bad
    V_ref,      # scratch VMEM (kmax+1, 2, M, r) Krylov vectors
    prev_ref,   # scratch VMEM (2, M, r) previous ψ iterate
    ab_ref,     # scratch VMEM (4, KPAD): alpha_re, alpha_im, beta, e0 row
    flag_ref,   # scratch SMEM (4,) f32: done, bad, k_fin, beta_prev
    *,
    kmax: int,
    nc: int,
):
    sre = scal_ref[0]
    sim = scal_ref[1]
    thresh = scal_ref[2]
    conserve = scal_ref[3]

    beta0 = jnp.sqrt(
        jnp.sum(vre_ref[:] * vre_ref[:] + vim_ref[:] * vim_ref[:])
    )
    b0inv = 1.0 / beta0

    def matvec(vre, vim):
        wre = jnp.zeros_like(vre)
        wim = jnp.zeros_like(vim)
        for c in range(nc):
            tre, tim = _cmm(vre, vim, rre_ref[c], rim_ref[c])
            ure, uim = _cmm(hre_ref[c], him_ref[c], tre, tim)
            wre = wre + ure
            wim = wim + uim
        return wre, wim

    _lanczos_phase(
        matvec, vre_ref[:] * b0inv, vim_ref[:] * b0inv,
        V_ref, prev_ref, ab_ref, flag_ref, sre, sim, thresh, kmax,
    )
    # norm handling in-kernel: conserve_norm renormalises, otherwise the
    # factored-out input norm is restored (krylov_expm semantics)
    pnorm = jnp.sqrt(
        jnp.sum(prev_ref[0] * prev_ref[0] + prev_ref[1] * prev_ref[1])
    )
    fac = jnp.where(conserve > 0.5, 1.0 / pnorm, beta0)
    ore_ref[:] = prev_ref[0] * fac
    oim_ref[:] = prev_ref[1] * fac
    stat_ref[:] = jnp.stack(
        [flag_ref[2].astype(jnp.int32), flag_ref[1].astype(jnp.int32)]
    )[None, :]


def _run_kernel(vre, vim, ch, scale, thresh, conserve: bool, kmax: int):
    hre, him, rre, rim = ch
    nc = hre.shape[0]
    M, r = vre.shape
    scal = jnp.stack([
        jnp.real(scale).astype(F32),
        jnp.imag(scale).astype(F32),
        jnp.asarray(thresh, F32),
        jnp.asarray(1.0 if conserve else 0.0, F32),
    ])
    ore, oim, stat = pl.pallas_call(
        partial(_lanczos_kernel, kmax=kmax, nc=nc),
        out_shape=(
            jax.ShapeDtypeStruct((M, r), F32),
            jax.ShapeDtypeStruct((M, r), F32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=_SMEM)]
        + [pl.BlockSpec(memory_space=_VMEM)] * 6,
        out_specs=(
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
            pl.BlockSpec(memory_space=_VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((kmax + 1, 2, M, r), F32),
            pltpu.VMEM((2, M, r), F32),
            pltpu.VMEM((4, _KPAD), F32),
            pltpu.SMEM((4,), F32),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(scal, vre, vim, hre, him, rre, rim)
    return ore, oim, stat


# --------------------------------------------------------------- wrappers
def _planar(x):
    return jnp.stack([jnp.real(x).astype(F32), jnp.imag(x).astype(F32)])


def heff_channels(L, W, R, fac=None):
    """XLA-side pre-contraction: H_c[(b,i),(k,j)] and R_cᵀ[r,x] planes.

    ``fac`` (the real env log-scale recombination factor) is folded into
    H_c.  The four planes stay SEPARATE arrays (no stack/transpose of the
    planar axis) — real einsums straight into the kernel's layout keep
    the per-site XLA glue to a handful of ops."""
    Lf = L if fac is None else L * fac.astype(L.dtype)
    lre, lim = jnp.real(Lf).astype(F32), jnp.imag(Lf).astype(F32)
    wre, wim = jnp.real(W).astype(F32), jnp.imag(W).astype(F32)

    def ein(a, b):
        return jnp.einsum("bak,aijc->cbikj", a, b, precision=_PREC)

    hre = ein(lre, wre) - ein(lim, wim)
    him = ein(lre, wim) + ein(lim, wre)
    nc, b, i, k, j = hre.shape
    hre = hre.reshape(nc, b * i, k * j)
    him = him.reshape(nc, b * i, k * j)
    Rt = jnp.transpose(R, (1, 2, 0))  # (x, c, r) -> (c, r, x)
    return (
        hre, him,
        jnp.real(Rt).astype(F32), jnp.imag(Rt).astype(F32),
    )


def keff_channels(L, R, fac=None):
    """K_eff (no MPO core): H_a = L[:, a, :], R_aᵀ[r, x] planes."""
    Lf = L if fac is None else L * fac.astype(L.dtype)
    Lt = jnp.transpose(Lf, (1, 0, 2))
    Rt = jnp.transpose(R, (1, 2, 0))
    return (
        jnp.real(Lt).astype(F32), jnp.imag(Lt).astype(F32),
        jnp.real(Rt).astype(F32), jnp.imag(Rt).astype(F32),
    )


def fits(shape: tuple, W_shape: tuple | None, max_dim: int) -> bool:
    """VMEM/shape gate for the fused kernel (single state pair)."""
    if len(shape) == 3:
        l, d, r = shape
        M = l * d
    else:
        M, r = shape
        d = 1
    nc = W_shape[-1] if W_shape is not None else 1
    if max_dim > _KPAD:
        return False
    # Krylov buffer + channel matrices, padded lanes (last dim -> 128)
    rpad = max(r, 128)
    vbytes = (max_dim + 1 + 4) * 2 * M * rpad * 4
    hbytes = nc * 2 * M * max(M, 128) * 4
    if vbytes + hbytes > 60 * 1024 * 1024:
        return False
    # degenerate edges (bond 1) hit Mosaic corner cases; XLA handles them
    return M >= 8 and r >= 2


def lanczos_expm_fused(
    ch, vec, shape, scale, thresh, max_dim: int, conserve_norm: bool
):
    """Drop-in for ``krylov_expm`` (Lanczos, single pair) via the kernel.

    ``ch``: the channel planes from :func:`heff_channels` /
    :func:`keff_channels`; ``vec``: the stacked complex state (flat);
    ``shape``: its (l, d, r).  Returns (out, k_used, bad) exactly like
    ``krylov_expm(..., return_iterations=True)`` — normalisation handling
    included (it runs in-kernel)."""
    l, d, r = shape
    M = l * d
    n = M * r
    kmax = min(max_dim, n)
    vm = vec.reshape(M, r)
    ore, oim, stat = _run_kernel(
        jnp.real(vm).astype(F32), jnp.imag(vm).astype(F32),
        ch, scale, thresh, conserve_norm, kmax,
    )
    res = jax.lax.complex(ore, oim).astype(vec.dtype).reshape(n)
    k_used = stat[0, 0]
    bad = (stat[0, 1] == 1) & jnp.asarray(kmax < n)
    return res, k_used, bad
