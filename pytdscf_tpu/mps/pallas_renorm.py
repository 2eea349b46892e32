"""Pallas-fused bf16x3 environment-block transfers (TPU kernel).

The env renormalisation ``L'[o,c,p] = Σ Ā[b,i,o]·W[a,i,j,c]·A[k,j,p]·L[b,a,k]``
is the same 4-tensor chain as the H_eff matvec (``pallas_matvec._heff_kernel``)
with the roles permuted:

  ===========  ==============  ====================================
  heff slot     left transfer   right transfer
  ===========  ==============  ====================================
  ψ (κ,φ,ρ)     L  (b,a,k)      R  (b,a,k)
  L (β,α,κ)     Ā  (o,i,b)      B̄  (o,i,b)
  R (ξ,γ,ρ)     A  (p,j,k)      B  (p,j,k)
  W (α,ι,φ,γ)   Wᵀ (i,c,a,j)    Wᵀ (i,c,a,j)
  out (β,ι,ξ)   L' (o,c,p)      R' (o,c,p)
  ===========  ==============  ====================================

so the "physical" kernel loop runs over the MPO bond (w=8) and the
"MPO-width" loop over the physical dim (d=4) — the kernel is generic in
(d, w) and works unchanged.

Unlike the relaxed matvec (single bf16 pass), environment blocks compound
multiplicatively over the chain, so this kernel implements the engine's
``env_precision="high"`` contract — **bf16x3**: every operand is split
``x = hi + lo`` (hi = bf16(x), lo = bf16(x − hi) ≈ 16 mantissa bits) and
each real product takes three MXU passes ``x·y ≈ xh·yh + xh·yl + xl·yh``
with f32 accumulation; the T1/T2 chain intermediates stay f32 in VMEM.

Chip verdict (v5e, χ=1024, w=8, d=4 — scripts/TPU_RUNBOOK.md item 9):
**wall-clock parity with the XLA einsum** (10.65 vs 10.61 ms/transfer;
1.321 vs 1.303 s/step end-to-end at χ=1024) at slightly BETTER accuracy
(1.2e-5 vs 3.5e-5 relative against the f32-exact einsum).  Removing the
2×256 MB HBM chain intermediates did NOT pay: the transfer is bound by
MXU pass efficiency of the channel-chopped (128,1024)@(1024,128) products
(~38-40% of bf16 peak for BOTH implementations), not by HBM.  Kept
opt-in (``Config.pallas_env`` / BENCH_PENV=1).  Also measured and
rejected on-chip: a planar-Karatsuba (3-mult) XLA formulation — 14.1 ms
(the three m1/m2/m3 plane intermediates re-introduce the HBM traffic).

Parity target: the reference renormalises its env blocks per term in
``/root/reference/pytdscf/_contraction.py`` (op_lcr loops) with no fusion
across the bra/W/ket stages.
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

#: bf16 kernel matmuls must NOT inherit the package-wide
#: ``jax_default_matmul_precision=highest`` pin (Mosaic rejects fp32
#: contract_precision on bf16 operands — see pallas_matvec).
_PREC = jax.lax.Precision.DEFAULT


def _z():
    # i32 index-map constants: under the package-wide x64 flag a literal 0
    # traces as i64 and Mosaic rejects mixed-width index maps.
    return jnp.int32(0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    if pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _dot3(ah, al, bh, bl):
    """bf16x3 real product: ah@bh + ah@bl + al@bh, f32 accumulation."""
    return (
        jnp.dot(ah, bh, preferred_element_type=F32, precision=_PREC)
        + jnp.dot(ah, bl, preferred_element_type=F32, precision=_PREC)
        + jnp.dot(al, bh, preferred_element_type=F32, precision=_PREC)
    )


def _split_hilo(x):
    """In-kernel f32 → (hi, lo) bf16 split.

    Bitmask truncation of the low 16 mantissa bits: ``reduce_precision``
    has no Mosaic lowering, and the ``x - bf16(x)`` form gets
    convert-folded to exact zero (see ``_hilo``).  Truncation instead of
    round-to-nearest costs nothing here — hi + lo still reconstructs x to
    ~16 mantissa bits, which is what the 3-pass product consumes."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    xr = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-65536)), F32
    )
    return xr.astype(BF16), (x - xr).astype(BF16)


def _renorm3_kernel(p_ref, rt_ref, lt_ref, wbh_ref, wbl_ref, out_ref,
                    t1_ref, *, d, w, tk, tx):
    kt = pl.program_id(1)
    # ---- step A: T1[(j,c,plane), Tk·Tx] f32 = ψ_j · R_c  (planar bf16x3)
    for j in range(d):
        pre_h = p_ref[0, 0, j]
        pre_l = p_ref[0, 1, j]
        pim_h = p_ref[1, 0, j]
        pim_l = p_ref[1, 1, j]
        for c in range(w):
            rre_h = rt_ref[0, 0, c]
            rre_l = rt_ref[0, 1, c]
            rim_h = rt_ref[1, 0, c]
            rim_l = rt_ref[1, 1, c]
            t1re = _dot3(pre_h, pre_l, rre_h, rre_l) - _dot3(
                pim_h, pim_l, rim_h, rim_l
            )
            t1im = _dot3(pre_h, pre_l, rim_h, rim_l) + _dot3(
                pim_h, pim_l, rre_h, rre_l
            )
            row = (j * w + c) * 2
            t1_ref[row] = t1re.reshape(-1)
            t1_ref[row + 1] = t1im.reshape(-1)
    # ---- step B: planar mixing (W core + complex algebra), bf16x3 —
    # explicit hi/lo passes rather than an f32 matmul, so the accuracy
    # does not depend on Mosaic honouring f32 contract_precision
    t1 = t1_ref[:]
    t1_h, t1_l = _split_hilo(t1)
    t2 = _dot3(wbh_ref[:], wbl_ref[:], t1_h, t1_l)
    t2_h, t2_l = _split_hilo(t2)

    # ---- step C: out-tile accumulation over k tiles
    @pl.when(kt == 0)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for i in range(d):
        acc_re = out_ref[0, i]
        acc_im = out_ref[1, i]
        for a in range(w):
            lre_h = lt_ref[0, 0, a]
            lre_l = lt_ref[0, 1, a]
            lim_h = lt_ref[1, 0, a]
            lim_l = lt_ref[1, 1, a]
            row = (a * d + i) * 2
            t2re_h = t2_h[row].reshape(tk, tx)
            t2re_l = t2_l[row].reshape(tk, tx)
            t2im_h = t2_h[row + 1].reshape(tk, tx)
            t2im_l = t2_l[row + 1].reshape(tk, tx)
            acc_re = acc_re + (
                _dot3(lre_h, lre_l, t2re_h, t2re_l)
                - _dot3(lim_h, lim_l, t2im_h, t2im_l)
            )
            acc_im = acc_im + (
                _dot3(lim_h, lim_l, t2re_h, t2re_l)
                + _dot3(lre_h, lre_l, t2im_h, t2im_l)
            )
        out_ref[0, i] = acc_re
        out_ref[1, i] = acc_im


def _hilo(x):
    """f32 array → stacked (hi, lo) bf16 planes along a new leading axis.

    The bf16 rounding MUST go through ``lax.reduce_precision``: writing it
    as ``x - bf16(x).astype(f32)`` lets XLA:TPU fold the f32→bf16→f32
    convert pair and the lo plane silently becomes exact zero (measured on
    the v5e — the kernel output was bit-identical with lo zeroed)."""
    xr = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    h = xr.astype(BF16)  # exact: xr is bf16-representable
    lo = (x - xr).astype(BF16)
    return jnp.stack([h, lo])


def _hilo_planes(x, perm):
    """complex array → (2 cplx, 2 hi/lo, *perm(x).shape) bf16 planes."""
    xr = jnp.transpose(x.real, perm).astype(F32)
    xi = jnp.transpose(x.imag, perm).astype(F32)
    return jnp.stack([_hilo(xr), _hilo(xi)])


def _wbig(W):
    """(w,d,d,w) complex MPO view → (2dw, 2dw) f32 planar-mixing matrix
    (same layout as ``pallas_matvec.wbig_from_mpo``)."""
    w, d = W.shape[0], W.shape[1]
    wre = jnp.real(W).astype(F32)
    wim = jnp.imag(W).astype(F32)
    big = jnp.zeros((w * d * 2, d * w * 2), F32)
    wre_rc = wre.reshape(w * d, d * w)
    wim_rc = wim.reshape(w * d, d * w)
    big = big.at[0::2, 0::2].set(wre_rc)
    big = big.at[0::2, 1::2].set(-wim_rc)
    big = big.at[1::2, 0::2].set(wim_rc)
    big = big.at[1::2, 1::2].set(wre_rc)
    return big


@partial(jax.jit, static_argnames=("tk", "tx"))
def _renorm3_pallas(psit, Rt, Lt, Wb, tk: int = 128, tx: int = 128):
    """Generic fused chain: operands already in kernel layout.

    ``psit``: (2, 2, d, K, RD) — ψ-like planes (φ, κ, ρ);
    ``Rt``:   (2, 2, w, RD, X) — R-like planes (γ, ρ, ξ);
    ``Lt``:   (2, 2, w, B, K) — L-like planes (α, β, κ);
    ``Wb``:   (2dw, 2dw) f32.  Returns (β, ι, ξ) f32 planes pair.
    """
    d = psit.shape[2]
    kdim = psit.shape[3]
    rdim = psit.shape[4]
    w = Rt.shape[2]
    xdim = Rt.shape[4]
    bdim = Lt.shape[3]
    Wbh, Wbl = _hilo(Wb)
    grid = (xdim // tx, kdim // tk)
    out = pl.pallas_call(
        partial(_renorm3_kernel, d=d, w=w, tk=tk, tx=tx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, 2, d, tk, rdim),
                         lambda xt, kt: (_z(), _z(), _z(), kt, _z())),
            pl.BlockSpec((2, 2, w, rdim, tx),
                         lambda xt, kt: (_z(), _z(), _z(), _z(), xt)),
            pl.BlockSpec((2, 2, w, bdim, tk),
                         lambda xt, kt: (_z(), _z(), _z(), _z(), kt)),
            pl.BlockSpec((2 * d * w, 2 * d * w),
                         lambda xt, kt: (_z(), _z())),
            pl.BlockSpec((2 * d * w, 2 * d * w),
                         lambda xt, kt: (_z(), _z())),
        ],
        out_specs=pl.BlockSpec(
            (2, d, bdim, tx), lambda xt, kt: (_z(), _z(), _z(), xt)
        ),
        out_shape=jax.ShapeDtypeStruct((2, d, bdim, xdim), F32),
        scratch_shapes=[_VMEM((2 * d * w, tk * tx), F32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(psit, Rt, Lt, Wbh, Wbl)
    return out


@partial(jax.jit, static_argnames=("tk", "tx"))
def renorm_left_pallas(L, a_bra, W, a_ket, tk: int = 128, tx: int = 128):
    """L'[o,c,p] = Σ A*_bra[b,i,o]·W[a,i,j,c]·A_ket[k,j,p]·L[b,a,k],
    bf16x3, fused in VMEM (drop-in for ``kernels.renorm_block_left``
    at ``prec="high"``)."""
    psit = _hilo_planes(L, (1, 0, 2))                     # (φ=a, κ=b, ρ=k)
    Rt = _hilo_planes(a_ket, (1, 0, 2))                   # (γ=j, ρ=k, ξ=p)
    Lt = _hilo_planes(a_bra.conj(), (1, 2, 0))            # (α=i, β=o, κ=b)
    Wb = _wbig(jnp.transpose(W, (1, 3, 0, 2)))            # (i, c, a, j)
    out = _renorm3_pallas(psit, Rt, Lt, Wb, tk=tk, tx=tx)
    res = jax.lax.complex(out[0], out[1]).astype(L.dtype)
    return jnp.transpose(res, (1, 0, 2))                  # (o, c, p)


@partial(jax.jit, static_argnames=("tk", "tx"))
def renorm_right_pallas(R, b_bra, W, b_ket, tk: int = 128, tx: int = 128):
    """R'[o,c,p] = Σ B*_bra[o,i,b]·W[c,i,j,a]·B_ket[p,j,k]·R[b,a,k],
    bf16x3, fused in VMEM (drop-in for ``kernels.renorm_block_right``
    at ``prec="high"``)."""
    psit = _hilo_planes(R, (1, 0, 2))                     # (φ=a, κ=b, ρ=k)
    Rt = _hilo_planes(b_ket, (1, 2, 0))                   # (γ=j, ρ=k, ξ=p)
    Lt = _hilo_planes(b_bra.conj(), (1, 0, 2))            # (α=i, β=o, κ=b)
    Wb = _wbig(jnp.transpose(W, (1, 0, 3, 2)))            # (i, c, a, j)
    out = _renorm3_pallas(psit, Rt, Lt, Wb, tk=tk, tx=tx)
    res = jax.lax.complex(out[0], out[1]).astype(R.dtype)
    return jnp.transpose(res, (1, 0, 2))                  # (o, c, p)


def left_shapes_ok(L, a_bra, W, a_ket, tk: int = 128, tx: int = 128) -> bool:
    """Tile gate: κ=b and ξ=p tiled, ρ=k full-width MXU contraction,
    β=o VMEM-resident output rows.  Edge sites fall back to the einsum."""
    b, _, k = L.shape
    o = a_bra.shape[2]
    p = a_ket.shape[2]
    d_out = W.shape[0] * W.shape[3]  # not used; clarity
    del d_out
    return (
        b % tk == 0
        and p % tx == 0
        and k % 128 == 0
        and o % 16 == 0
        and o * W.shape[3] * tx * 8 <= 64 * 1024 * 1024
    )


def right_shapes_ok(R, b_bra, W, b_ket, tk: int = 128, tx: int = 128) -> bool:
    b, _, k = R.shape
    o = b_bra.shape[0]
    p = b_ket.shape[0]
    return (
        b % tk == 0
        and p % tx == 0
        and k % 128 == 0
        and o % 16 == 0
        and o * W.shape[0] * tx * 8 <= 64 * 1024 * 1024
    )
