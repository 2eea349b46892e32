"""Single-kernel MGS(×2) thin QR for the small-bond TPU gauge.

`kernels._mgs_qr` is the numerically load-bearing gauge factorisation on
this backend (the TPU's LAPACK QR emits garbage null-space columns, and
CholeskyQR's shifted rounds lose orthonormality on the near-rank-deficient
Schmidt spectra the fixed-D sweep carries — measured |QᴴQ−I| ≈ 4.9 on a
rank-1+1e-7-tail input).  But as XLA ops its unrolled column loop is ~12
tiny dispatches × r columns ≈ 250 µs at (240, 30).  This kernel runs the
SAME algorithm — two Gram–Schmidt passes per column, deterministic
canonical-basis completion of rank-deficient columns — as one pallas
program in ROW-major layout (columns live on sublanes, so the per-column
dynamic index never touches the lane axis): ~30-60 µs.

Exact-semantics notes (mirrors ``kernels._mgs_qr`` line by line):
* global scale ‖m‖_F + 1e-30 sets the rank threshold (nv < 1e-7·scale);
* dead columns get the orthogonalised canonical basis vector e_k and a
  ZERO R diagonal — the completions define the frame through which 1-site
  TDVP grows amplitude into padded bond channels (load-bearing!);
* R column k = c₁+c₂ (the two GS passes) plus nv on the diagonal.
Requires N ≥ r (thin); numerics are planar f32 (the engine's complex64
working precision).
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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    if pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _mgs_phase(
    tre_ref, tim_ref, qre_ref, qim_ref, rre_ref, rim_ref, *, r: int, n: int
):
    """MGS(×2) of the row-major mᵀ planes (REFS) into Qᵀ/R output refs.

    Exposed separately so fused site kernels can run it as a phase (they
    stage their computed input into scratch refs first — Mosaic has no
    dynamic_slice on values, only ``pl.ds`` ref indexing).
    ``rre_ref``/``rim_ref`` end up holding R with COLUMN k = R[:, k]."""
    qre_ref[:] = jnp.zeros_like(qre_ref)
    qim_ref[:] = jnp.zeros_like(qim_ref)
    rre_ref[:] = jnp.zeros_like(rre_ref)
    rim_ref[:] = jnp.zeros_like(rim_ref)
    scale = jnp.sqrt(
        jnp.sum(tre_ref[:] * tre_ref[:] + tim_ref[:] * tim_ref[:])
    ) + 1e-30
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)

    def gs_pass(vre, vim):
        """One Gram–Schmidt pass of (1, N) v against the accumulated Qᵀ.

        Inactive rows of Qᵀ are exactly zero, so they project to zero."""
        qre = qre_ref[:]
        qim = qim_ref[:]
        cre = jnp.sum(qre * vre + qim * vim, axis=1, keepdims=True)
        cim = jnp.sum(qre * vim - qim * vre, axis=1, keepdims=True)
        ure = vre - jnp.sum(cre * qre - cim * qim, axis=0, keepdims=True)
        uim = vim - jnp.sum(cre * qim + cim * qre, axis=0, keepdims=True)
        return ure, uim, cre, cim

    def column(k, _):
        vre = tre_ref[pl.ds(k, 1), :]
        vim = tim_ref[pl.ds(k, 1), :]
        ure, uim, c1re, c1im = gs_pass(vre, vim)
        ure, uim, c2re, c2im = gs_pass(ure, uim)
        cre = c1re + c2re
        cim = c1im + c2im
        nv = jnp.sqrt(jnp.sum(ure * ure + uim * uim))
        bad = nv < 1e-07 * scale
        # deterministic completion: canonical e_k (k < r <= N),
        # orthogonalised twice (unconditional — predication would need a
        # branch per column; the extra passes are ~6 VPU ops)
        ere = (lane_n == k).astype(F32)
        eim = jnp.zeros_like(ere)
        ere, eim, _, _ = gs_pass(ere, eim)
        ere, eim, _, _ = gs_pass(ere, eim)
        ne = jnp.sqrt(jnp.sum(ere * ere + eim * eim)) + 1e-30
        nrm = jnp.where(bad, 1.0, jnp.maximum(nv, 1e-30))
        q_re = jnp.where(bad, ere / ne, ure / nrm)
        q_im = jnp.where(bad, eim / ne, uim / nrm)
        qre_ref[pl.ds(k, 1), :] = q_re
        qim_ref[pl.ds(k, 1), :] = q_im
        # R column k = c1+c2 (+ nv on the diagonal unless dead), written
        # as a broadcast outer product against the k-th one-hot row
        onehot = (lane_r == k).astype(F32)
        diag = jnp.where(bad, 0.0, nv)
        col_re = cre + diag * (
            jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) == k
        ).astype(F32)
        rre_ref[:] = rre_ref[:] + col_re * onehot
        rim_ref[:] = rim_ref[:] + cim * onehot
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(r), column, jnp.int32(0))


def _mgs_kernel(
    tre_ref,   # VMEM (r, N): mᵀ real plane
    tim_ref,   # VMEM (r, N): mᵀ imaginary plane
    qre_ref,   # VMEM (r, N): Qᵀ real out
    qim_ref,   # VMEM (r, N): Qᵀ imaginary out
    rre_ref,   # VMEM (r, r): R real out (column k = R[:, k])
    rim_ref,   # VMEM (r, r): R imaginary out
    *,
    r: int,
    n: int,
):
    _mgs_phase(
        tre_ref, tim_ref, qre_ref, qim_ref, rre_ref, rim_ref, r=r, n=n,
    )


def fits(N: int, r: int) -> bool:
    """Shape gate: thin (N ≥ r), sane sizes, VMEM budget."""
    if N < r or r < 2 or N < 8:
        return False
    npad = max(N, 128)
    return 4 * r * npad * 4 + 2 * r * max(r, 128) * 4 <= 48 * 1024 * 1024


@jax.custom_batching.custom_vmap
def mgs_qr_fused(m: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ``kernels._mgs_qr`` via the single-kernel program."""
    N, r = m.shape
    mt = jnp.transpose(m)
    tre = jnp.real(mt).astype(F32)
    tim = jnp.imag(mt).astype(F32)
    qre, qim, rre, rim = pl.pallas_call(
        partial(_mgs_kernel, r=r, n=N),
        out_shape=(
            jax.ShapeDtypeStruct((r, N), F32),
            jax.ShapeDtypeStruct((r, N), F32),
            jax.ShapeDtypeStruct((r, r), F32),
            jax.ShapeDtypeStruct((r, r), F32),
        ),
        in_specs=[pl.BlockSpec(memory_space=_VMEM)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=_VMEM) for _ in range(4)),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(tre, tim)
    Q = jnp.transpose(jax.lax.complex(qre, qim)).astype(m.dtype)
    R = jax.lax.complex(rre, rim).astype(m.dtype)
    return Q, R


@mgs_qr_fused.def_vmap
def _mgs_qr_fused_vmap(axis_size, in_batched, m):
    """Batched rule: route around the pallas kernel entirely.

    JAX lowers a vmapped ``pallas_call`` by prepending a batch grid
    dimension whose synthesized index maps carry literal-0 entries; under
    the package-wide x64 flag those trace as i64, and Mosaic rejects the
    index-map function (``func.return (i32, i64, i64)`` legalization
    failure, reproduced on v5e).  This fires for DIRECT vmap and for
    vmap-of-jit alike (the tracer-type guard in ``kernels._thin_qr``
    cannot see through a jit boundary), so ensemble programs
    (``parallel/batched.py``) get the same-algorithm XLA MGS(×2) path.
    """
    from pytdscf_tpu.mps.kernels import _mgs_qr

    out = jax.vmap(_mgs_qr)(m)
    return out, (True, True)
