"""Env-transfer formulations microbench at χ=1024 MPDO shapes.

The round-3h study measured the bf16x3 einsum transfer at 10.6 ms per
(χ=1024, w=8, d=4) block — ~40% of bf16 peak, attributed to MXU pass
efficiency of the channel-chopped complex products.  The theoretical
floor of the two big matmuls (L·A_ket and A_bra†·N at K=χ resp. K=χ·d)
is ~4.5 ms at bf16x3, so ~2× may sit in XLA's einsum schedule (the
middle contraction has K=w·d=32 — skinny — and may be fragmenting the
big ones).  This benches:

  A. the production einsum (`K.renorm_block_left`, prec="high")
  B. an explicitly staged 3-matmul form with fused (a·j) axes
  C. staged form with the middle skinny matmul at HIGHEST (error check)

Run on the chip:  python scripts/microbench_env.py     (PROF_CHI=2048 …)
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-prof")

from pytdscf_tpu.mps import device_io as dio  # noqa: E402
from pytdscf_tpu.mps import kernels as K  # noqa: E402

CHI = int(os.environ.get("PROF_CHI", "1024"))
W_DIM, D_PHYS = 8, 4
DT = jnp.complex64
HIGH = jax.lax.Precision.HIGH
HIGHEST = jax.lax.Precision.HIGHEST


def rand_c(rng, *shape):
    x = (rng.normal(size=shape) + 1j * rng.normal(size=shape)) / np.sqrt(
        np.prod(shape)
    )
    return dio.put(x, DT)


@jax.jit
def _sync_val(x):
    return jnp.max(jnp.abs(x.real))


def sync(x) -> float:
    return float(_sync_val(x))


def time_chain(fn, x0, label="", n1=4, n2=12):
    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        sync(x)
        return time.perf_counter() - t0

    run(2)
    t1 = run(n1)
    t2 = run(n2)
    dt = (t2 - t1) / (n2 - n1) * 1e3
    print(f"{label:58s} {dt:9.3f} ms", flush=True)
    return dt


def staged_left(L, a_bra, W, a_ket, mid_prec=HIGH):
    """renorm_block_left as 3 explicit matmuls with fused contractions.

    out[o,c,p] = Σ L[b,a,k] · conj(a_bra)[b,i,o] · W[a,i,j,c] · a_ket[k,j,p]
    """
    D = L.shape[0]
    w = L.shape[1]
    n = a_ket.shape[1]
    # stage 1: (b·a, k) @ (k, j·p) -> M[b,a,j,p]
    M = jnp.matmul(
        L.reshape(D * w, D), a_ket.reshape(D, n * D), precision=HIGH
    ).reshape(D, w, n, D)
    # stage 2 (skinny K = w·n): (b·p, a·j) @ (a·j, i·c) -> N[b,p,i,c]
    M2 = M.transpose(0, 3, 1, 2).reshape(D * D, w * n)
    W2 = W.transpose(0, 2, 1, 3).reshape(w * n, n * W.shape[3])
    N = jnp.matmul(M2, W2, precision=mid_prec).reshape(
        D, D, n, W.shape[3]
    )
    # stage 3: (o, b·i) @ (b·i, p·c) -> out[o,p,c]
    N2 = N.transpose(0, 2, 1, 3).reshape(D * n, D * W.shape[3])
    A2 = a_bra.conj().reshape(D * n, a_bra.shape[2])
    out = jnp.matmul(A2.T, N2, precision=HIGH).reshape(
        a_bra.shape[2], D, W.shape[3]
    )
    return out.transpose(0, 2, 1)


def main():
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} chi={CHI}", flush=True)
    L = rand_c(rng, CHI, W_DIM, CHI)
    W = rand_c(rng, W_DIM, D_PHYS, D_PHYS, W_DIM)
    psi = rand_c(rng, CHI, D_PHYS, CHI)

    # complex device arrays must travel as jit ARGUMENTS (captured ones
    # constant-fold through a host fetch → UNIMPLEMENTED on this backend)
    ein = jax.jit(
        lambda B, p, w: K.renorm_block_left(B, p, w, p, "high")
    )
    ein_hi = jax.jit(
        lambda B, p, w: K.renorm_block_left(B, p, w, p, "highest")
    )
    stg = jax.jit(lambda B, p, w: staged_left(B, p, w, p, HIGH))
    stg_mid_hi = jax.jit(
        lambda B, p, w: staged_left(B, p, w, p, HIGHEST)
    )

    t_e = time_chain(lambda B: ein(B, psi, W), L,
                     label="einsum prec=high (production)")
    time_chain(lambda B: ein_hi(B, psi, W), L, label="einsum prec=highest")
    t_s = time_chain(lambda B: stg(B, psi, W), L,
                     label="staged 3-matmul (mid high)")
    time_chain(lambda B: stg_mid_hi(B, psi, W), L,
               label="staged 3-matmul (mid highest)")

    ref = ein_hi(L, psi, W)
    for name, f in (("einsum-high", ein), ("staged", stg),
                    ("staged-mid-hi", stg_mid_hi)):
        delta = f(L, psi, W) - ref
        err = sync(jnp.linalg.norm(delta)) / sync(jnp.linalg.norm(ref))
        print(f"    {name:20s} rel err vs f32-exact: {err:.2e}",
              flush=True)
    print(f"speedup staged vs einsum: {t_e / t_s:.2f}x", flush=True)


if __name__ == "__main__":
    main()
