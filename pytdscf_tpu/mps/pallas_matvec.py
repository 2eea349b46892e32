"""Pallas-fused relaxed-Krylov matvecs (TPU kernel for the hot chain).

The H_eff matvec ``σ[b,i,x] = Σ L[b,a,k]·W[a,i,j,c]·R[x,c,r]·ψ[k,j,r]``
materialises two (χ,d,χ,w)-sized chain intermediates under XLA — 2×256 MB
of HBM round-trips at χ=1024 that dominate the single-bf16-pass (relaxed
Krylov) regime where the MXU work is only one pass.  This kernel keeps the
whole chain in VMEM: it blocks the ket bonds into (Tk, Tx) tiles, streams
L/R/ψ tiles through a 2-D ``(x-tile, k-tile)`` grid, and accumulates the
output tile in place across the contraction (k) tiles.

Layout strategy (all complex tensors as planar bf16 (re, im) planes):

* step A  — 32 per-``(j,c)`` matmuls ``ψ_j (Tk,χ) @ R_c (χ,Tx)`` write the
  T1 scratch directly in ``(j·c·plane, Tk·Tx)`` order, so the W-mixing
  step needs NO in-VMEM transpose;
* step B  — ONE ``(2·d·w, 2·d·w)`` real matmul applies the MPO core AND the
  complex multiplication in a single MXU pass: the W-big matrix carries
  the planar sign structure ``[[+Wre, −Wim], [+Wim, +Wre]]`` interleaved
  per ``(a,i)``/``(j,c)`` channel;
* step C  — 32 per-``(a,i)`` matmuls ``L_a (B,Tk) @ T2_{a,i} (Tk,Tx)``
  accumulate the planar output tile, which pallas keeps VMEM-resident
  across the k-tile sweep (the out block index depends on the x tile
  only, so revisits are consecutive).

The K_eff matvec (no MPO core) is the same two-stage chain without step B.

Precision matches the relaxed path in ``kernels.heff_apply_lo``: bf16
operands and chain intermediates, f32 accumulation — validated CPU-side in
interpret mode against the exact kernels.  Parity target: the reference
runs its whole Krylov matvec through ``_contraction.multiplyH_MPS_direct``
(``/root/reference/pytdscf/_contraction.py:1038-1176``) with no fusion
across the L/W/R stages.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

BF16 = jnp.bfloat16
F32 = jnp.float32

#: The package pins ``jax_default_matmul_precision=highest``, which would
#: stamp these deliberately-bf16 kernel matmuls with
#: ``contract_precision<fp32>`` — Mosaic rejects that combination with
#: "Bad lhs type" (measured on the v5e remote compiler).  The kernel's
#: accuracy contract is bf16 operands + f32 accumulation, so DEFAULT is
#: the correct (and compilable) precision here.
_PREC = jax.lax.Precision.DEFAULT


def _z():
    """Index-map zero as i32: under the package-wide ``jax_enable_x64``
    literal 0 traces as i64, and Mosaic rejects index maps mixing i64
    constants with the i32 ``program_id`` ("failed to legalize
    'func.return'")."""
    return jnp.int32(0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    """Raise the kernel's scoped-VMEM limit: at χ=1024 the streamed
    (rdim, tx)/(bdim, tx) blocks total ~18-26 MB with double buffering,
    over Mosaic's 16 MB default (measured OOM on v5e); the chip has
    128 MB of VMEM, so grant the kernel a comfortable slice."""
    if pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def wbig_from_mpo(W: jax.Array) -> jax.Array:
    """(w,d,d,w) complex MPO core → (2·d·w, 2·d·w) planar-mixing matrix.

    Row ``(a·d+i)·2+p_out``, column ``(j·w+c)·2+p_in`` — the complex
    product ``T2 = W·T1`` becomes ONE real matmul."""
    w, d = W.shape[0], W.shape[1]
    wre = jnp.real(W).astype(F32)
    wim = jnp.imag(W).astype(F32)
    # rows (a, i, p_out), cols (j, c, p_in): (a,i,j,c) reshaped row-major
    big = jnp.zeros((w * d * 2, d * w * 2), F32)
    wre_rc = wre.reshape(w * d, d * w)
    wim_rc = wim.reshape(w * d, d * w)
    big = big.at[0::2, 0::2].set(wre_rc)
    big = big.at[0::2, 1::2].set(-wim_rc)
    big = big.at[1::2, 0::2].set(wim_rc)
    big = big.at[1::2, 1::2].set(wre_rc)
    return big


def _heff_kernel(p_ref, rt_ref, lt_ref, wb_ref, out_ref, t1_ref, *, d, w,
                 tk, tx):
    kt = pl.program_id(1)
    # ---- step A: T1[(j,c,plane), Tk·Tx] = ψ_j · R_c (planar complex)
    for j in range(d):
        pre = p_ref[0, j]
        pim = p_ref[1, j]
        for c in range(w):
            rre = rt_ref[0, c]
            rim = rt_ref[1, c]
            t1re = jnp.dot(pre, rre, preferred_element_type=F32, precision=_PREC) - jnp.dot(
                pim, rim, preferred_element_type=F32, precision=_PREC
            )
            t1im = jnp.dot(pre, rim, preferred_element_type=F32, precision=_PREC) + jnp.dot(
                pim, rre, preferred_element_type=F32, precision=_PREC
            )
            row = (j * w + c) * 2
            t1_ref[row] = t1re.astype(BF16).reshape(-1)
            t1_ref[row + 1] = t1im.astype(BF16).reshape(-1)
    # ---- step B: one planar-mixing matmul applies W and the complex algebra
    t2 = jnp.dot(
        wb_ref[:].astype(BF16), t1_ref[:], preferred_element_type=F32, precision=_PREC
    ).astype(BF16)

    # ---- step C: σ_tile accumulation over k tiles
    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for i in range(d):
        acc_re = out_ref[0, i]
        acc_im = out_ref[1, i]
        for a in range(w):
            lre = lt_ref[0, a]
            lim = lt_ref[1, a]
            row = (a * d + i) * 2
            t2re = t2[row].reshape(tk, tx)
            t2im = t2[row + 1].reshape(tk, tx)
            acc_re = acc_re + (
                jnp.dot(lre, t2re, preferred_element_type=F32, precision=_PREC)
                - jnp.dot(lim, t2im, preferred_element_type=F32, precision=_PREC)
            )
            acc_im = acc_im + (
                jnp.dot(lim, t2re, preferred_element_type=F32, precision=_PREC)
                + jnp.dot(lre, t2im, preferred_element_type=F32, precision=_PREC)
            )
        out_ref[0, i] = acc_re
        out_ref[1, i] = acc_im


@partial(jax.jit, static_argnames=("tk", "tx"))
def heff_pallas(Lt, Wb, Rt, psi, tk: int = 128, tx: int = 128):
    """Fused planar-bf16 H_eff matvec.

    ``Lt``: (2, w, B, K) bf16 — L[b,a,k] planes pre-transposed to (a,b,k);
    ``Rt``: (2, w, R, X) bf16 — R[x,c,r] planes pre-transposed to (c,r,x);
    ``Wb``: (2dw, 2dw) f32 planar-mixing matrix (:func:`wbig_from_mpo`);
    ``psi``: (k, j, r) complex site tensor.  Returns σ (b, i, x) complex.
    """
    kdim, d, rdim = psi.shape
    w = Lt.shape[1]
    bdim = Lt.shape[2]
    xdim = Rt.shape[3]
    psit = jnp.stack(
        [
            jnp.transpose(psi.real, (1, 0, 2)).astype(BF16),
            jnp.transpose(psi.imag, (1, 0, 2)).astype(BF16),
        ]
    )  # (2, d, k, r)
    grid = (xdim // tx, kdim // tk)
    kwargs = dict(d=d, w=w, tk=tk, tx=tx)
    out = pl.pallas_call(
        partial(_heff_kernel, **kwargs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, d, tk, rdim), lambda xt, kt: (_z(), _z(), kt, _z())),
            pl.BlockSpec((2, w, rdim, tx), lambda xt, kt: (_z(), _z(), _z(), xt)),
            pl.BlockSpec((2, w, bdim, tk), lambda xt, kt: (_z(), _z(), _z(), kt)),
            pl.BlockSpec((2 * d * w, 2 * d * w), lambda xt, kt: (_z(), _z())),
        ],
        out_specs=pl.BlockSpec(
            (2, d, bdim, tx), lambda xt, kt: (_z(), _z(), _z(), xt)
        ),
        out_shape=jax.ShapeDtypeStruct((2, d, bdim, xdim), F32),
        scratch_shapes=[_VMEM((2 * d * w, tk * tx), BF16)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(psit, Rt, Lt, Wb)
    sig = jax.lax.complex(out[0], out[1]).astype(psi.dtype)
    return jnp.transpose(sig, (1, 0, 2))  # (b, i, x)


def _keff_kernel(s_ref, rt_ref, lt_ref, out_ref, *, w, tk, tx):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    sre = s_ref[0]
    sim = s_ref[1]
    acc_re = out_ref[0]
    acc_im = out_ref[1]
    for a in range(w):
        rre = rt_ref[0, a]
        rim = rt_ref[1, a]
        t1re = jnp.dot(sre, rre, preferred_element_type=F32, precision=_PREC) - jnp.dot(
            sim, rim, preferred_element_type=F32, precision=_PREC
        )
        t1im = jnp.dot(sre, rim, preferred_element_type=F32, precision=_PREC) + jnp.dot(
            sim, rre, preferred_element_type=F32, precision=_PREC
        )
        t1re = t1re.astype(BF16)
        t1im = t1im.astype(BF16)
        lre = lt_ref[0, a]
        lim = lt_ref[1, a]
        acc_re = acc_re + (
            jnp.dot(lre, t1re, preferred_element_type=F32, precision=_PREC)
            - jnp.dot(lim, t1im, preferred_element_type=F32, precision=_PREC)
        )
        acc_im = acc_im + (
            jnp.dot(lim, t1re, preferred_element_type=F32, precision=_PREC)
            + jnp.dot(lre, t1im, preferred_element_type=F32, precision=_PREC)
        )
    out_ref[0] = acc_re
    out_ref[1] = acc_im


@partial(jax.jit, static_argnames=("tk", "tx"))
def keff_pallas(Lt, Rt, sig, tk: int = 128, tx: int = 128):
    """Fused planar-bf16 K_eff matvec: σ'[b,x] = Σ L[b,a,k]·R[x,a,r]·σ[k,r].

    ``Lt``: (2, w, B, K) planes of L (a,b,k); ``Rt``: (2, w, R, X) planes of
    R (a,r,x); ``sig``: (k, r) complex bond matrix."""
    kdim, rdim = sig.shape
    w = Lt.shape[1]
    bdim = Lt.shape[2]
    xdim = Rt.shape[3]
    sigt = jnp.stack([sig.real.astype(BF16), sig.imag.astype(BF16)])
    grid = (xdim // tx, kdim // tk)
    out = pl.pallas_call(
        partial(_keff_kernel, w=w, tk=tk, tx=tx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, tk, rdim), lambda xt, kt: (_z(), kt, _z())),
            pl.BlockSpec((2, w, rdim, tx), lambda xt, kt: (_z(), _z(), _z(), xt)),
            pl.BlockSpec((2, w, bdim, tk), lambda xt, kt: (_z(), _z(), _z(), kt)),
        ],
        out_specs=pl.BlockSpec((2, bdim, tx), lambda xt, kt: (_z(), _z(), xt)),
        out_shape=jax.ShapeDtypeStruct((2, bdim, xdim), F32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(sigt, Rt, Lt)
    return jax.lax.complex(out[0], out[1]).astype(sig.dtype)


# ------------------------------------------------------------ dispatching
def heff_operands(L, W, R):
    """Pre-transposed planar bf16 operands for :func:`heff_pallas` (built
    once per site, outside the Krylov loop)."""
    Lt = jnp.stack(
        [
            jnp.transpose(L.real, (1, 0, 2)).astype(BF16),
            jnp.transpose(L.imag, (1, 0, 2)).astype(BF16),
        ]
    )
    Rt = jnp.stack(
        [
            jnp.transpose(R.real, (1, 2, 0)).astype(BF16),
            jnp.transpose(R.imag, (1, 2, 0)).astype(BF16),
        ]
    )
    return Lt, wbig_from_mpo(W), Rt


def keff_operands(L, R):
    Lt = jnp.stack(
        [
            jnp.transpose(L.real, (1, 0, 2)).astype(BF16),
            jnp.transpose(L.imag, (1, 0, 2)).astype(BF16),
        ]
    )
    Rt = jnp.stack(
        [
            jnp.transpose(R.real, (1, 2, 0)).astype(BF16),
            jnp.transpose(R.imag, (1, 2, 0)).astype(BF16),
        ]
    )
    return Lt, Rt


def heff_shapes_ok(L, W, R, psi_shape, tk: int = 128, tx: int = 128) -> bool:
    """Tile-divisibility gate: edge sites with small bonds fall back to the
    planar einsum path (they are cheap there anyway)."""
    k, d, r = psi_shape
    b = L.shape[0]
    return (
        k % tk == 0
        and r % tx == 0
        and b % 16 == 0
        # scoped-VMEM guard, calibrated on chip: the kernel's stack
        # (double-buffered block windows + scratch) measured 114.04 MB at
        # (b=4096, d=4, tx=128) — 14% over the 100 MB grant — and fits
        # through b=3072 (χ=3072 bench runs clean).  ~55 B per b·d·tx
        # unit; beyond it the Krylov falls back to the planar einsum.
        and b * W.shape[1] * tx * 55 <= 100 * 1024 * 1024
    )


def keff_shapes_ok(L, R, sig_shape, tk: int = 128, tx: int = 128) -> bool:
    k, r = sig_shape
    return k % tk == 0 and r % tx == 0 and L.shape[0] % 16 == 0
