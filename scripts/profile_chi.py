"""Stage-level TPU profile of the χ=1024 MPDO site step.

Times each component of the fused TDVP site program in isolation on the
real chip.  Measurement discipline (axon tunnel):

  * computations are CHAINED (iteration k+1 consumes k's output) so the
    device cannot overlap or elide them;
  * every measurement ends with a real host value fetch (float32 scalar)
    — ``block_until_ready`` alone has been observed to return early
    through the tunnel;
  * two-point timing (N₂ − N₁ iterations) cancels the constant ~30 ms
    sync/dispatch overhead.

PROF_CHI sets χ (default 1024).
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-prof")

from pytdscf_tpu.mps import device_io as dio  # noqa: E402
from pytdscf_tpu.mps import kernels as K  # noqa: E402
from pytdscf_tpu.mps.integrator import krylov_expm  # noqa: E402

CHI = int(os.environ.get("PROF_CHI", "1024"))
W_DIM, D_PHYS = 8, 4
DT = jnp.complex64
N1, N2 = 4, 12


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


def time_chain(fn, x0, label="", n1=N1, n2=N2):
    """fn: x -> x-like (chained).  Returns per-iteration ms."""

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        sync(x)
        return time.perf_counter() - t0

    run(2)  # warm compile + cache
    t1 = run(n1)
    t2 = run(n2)
    dt = (t2 - t1) / (n2 - n1) * 1e3
    print(f"{label:58s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} chi={CHI}", flush=True)
    L = rand_c(rng, CHI, W_DIM, CHI)
    R = rand_c(rng, CHI, W_DIM, CHI)
    W = rand_c(rng, W_DIM, D_PHYS, D_PHYS, W_DIM)
    psi = rand_c(rng, CHI, D_PHYS, CHI)
    sig = rand_c(rng, CHI, CHI)

    for prec in ("highest", "high", "default"):
        time_chain(lambda x, p=prec: K.heff_apply(L, W, R, x, p), psi,
                   label=f"heff_apply prec={prec}")
    for prec in ("highest", "high"):
        time_chain(lambda x, p=prec: K.keff_apply(L, R, x, p), sig,
                   label=f"keff_apply prec={prec}")
    for prec in ("highest", "high"):
        time_chain(
            lambda B, p=prec: K.renorm_block_left(B, psi, W, psi, p), L,
            label=f"renorm_block_left prec={prec}",
        )

    # ---- gauge QR (chained via Q — orthonormal input is representative)
    mat = psi.reshape(CHI * D_PHYS, CHI)
    for iters_qr in (3, 2):
        f = jax.jit(partial(K._cholesky_qr, iters=iters_qr))
        time_chain(lambda m: f(m)[0], mat,
                   label=f"cholesky_qr iters={iters_qr}")
        q, r = f(mat)
        g = jnp.einsum("ij,ik->jk", q.conj(), q,
                       precision=jax.lax.Precision.HIGHEST)
        orth = sync(jnp.max(jnp.abs(g - jnp.eye(CHI, dtype=g.dtype))))
        rec = sync(jnp.linalg.norm(q @ r - mat) / jnp.linalg.norm(mat))
        print(f"    orthogonality={orth:.2e}  reconstruction={rec:.2e}",
              flush=True)

    # ---- Arnoldi H-step at several buffer sizes (real matvec, thresh 1e-6)
    sh = psi.shape

    def make_step(k_max, prec):
        @jax.jit
        def step(v, L, W, R):
            def hmv(x):
                return K.heff_apply(L, W, R, x.reshape(sh), prec).ravel()

            out, k_used, bad = krylov_expm(
                hmv, v.ravel(), jnp.asarray(-0.05j, DT), 1e-6,
                max_dim=k_max, conserve_norm=False, arnoldi=True,
                return_iterations=True,
            )
            return out.reshape(sh) / jnp.linalg.norm(out), k_used

        return step

    for k_max in (15, 10, 8):
        f = make_step(k_max, "high")
        time_chain(lambda x: f(x, L, W, R)[0], psi,
                   label=f"arnoldi krylov_expm k_max={k_max} high")
        _, k_used = f(psi, L, W, R)
        print(f"    iterations used: {int(k_used)}", flush=True)

    # ---- pure Krylov-loop machinery: free-ish matvec, forced to the cap
    # (per-iteration cost of GS + buffer updates + expm + convergence)
    @jax.jit
    def kry_overhead(v):
        def mv(x):
            return x * jnp.asarray(0.9 - 0.05j, DT) + jnp.flip(x) * 0.1

        out = krylov_expm(
            mv, v.ravel(), jnp.asarray(-0.05j, DT), 1e-30,
            max_dim=7, conserve_norm=False, arnoldi=True,
        )
        return out.reshape(v.shape)

    t = time_chain(kry_overhead, psi,
                   label="arnoldi loop overhead (7 iters, ~free matvec)")
    print(f"    per-iteration machinery: {t / 7:.3f} ms", flush=True)

    # break the machinery down: same loop shape with pieces removed
    n_flat = int(np.prod(psi.shape))
    k_cap = 7

    def make_loop(gs: bool, buf_write: bool, norm: bool):
        @jax.jit
        def run(v):
            v0 = v.ravel()
            V = jnp.zeros((k_cap + 1, n_flat), DT).at[0].set(v0)

            def body(carry):
                V, k, w_prev = carry
                w = w_prev * jnp.asarray(0.9 - 0.05j, DT) + jnp.flip(
                    w_prev
                ) * 0.1
                if gs:
                    h = jnp.einsum("in,n->i", V, w.conj()).conj()
                    w = w - h @ V
                if norm:
                    b = jnp.linalg.norm(w).real
                    w = w / jnp.maximum(b, 1e-30).astype(w.dtype)
                if buf_write:
                    V = V.at[k + 1].set(w)
                return V, k + 1, w

            V, k, w = jax.lax.while_loop(
                lambda c: c[1] < k_cap, body, (V, jnp.asarray(0), v0)
            )
            return w.reshape(psi.shape)

        return run

    for gs, bw, nr, lbl in (
        (True, True, True, "loop: GS + write + norm"),
        (False, True, True, "loop: write + norm (no GS)"),
        (True, False, True, "loop: GS + norm (no buffer write)"),
        (False, False, True, "loop: norm only"),
        (False, False, False, "loop: matvec only"),
    ):
        t = time_chain(make_loop(gs, bw, nr), psi, label=lbl)
        print(f"    per-iter: {t / k_cap:.3f} ms", flush=True)

    # ---- remaining per-site pieces (the BASELINE.md "misc" share)
    time_chain(lambda x: K.absorb_right(sig, x), psi, label="absorb_right")
    time_chain(lambda x: K.lq_left(x)[1], psi, label="lq_left (CHQR path)")

    @jax.jit
    def norm_block(B):
        n = jnp.linalg.norm(B).real
        return B / jnp.maximum(n, 1e-30).astype(B.dtype)

    time_chain(norm_block, L, label="_normalize_block (env)")

    # ---- ONE whole fused site step (non-last, forward) vs sum of parts
    from pytdscf_tpu.mps.tdvp import _site_step_impl

    relax = os.environ.get("PROF_RELAX", "1") != "0"
    pallas = os.environ.get("PROF_PALLAS", "1") != "0"

    @jax.jit
    def site_step(psi, nxt, L, W, R):
        out = _site_step_impl(
            (psi,), (nxt,), (L,), (W,), (R,),
            jnp.asarray(-0.05j, DT), 1e-6,
            pairs=((0, 0),), nstate=1, mode="prop",
            conserve_norm=False, arnoldi=True, max_dim=7,
            last=False, forward=True, mv_prec="high", env_prec="high",
            relaxed=relax, pallas=pallas,
        )
        # site_out, psi_next, blocks_new, logs_new, kry
        return out[1][0]

    nxt = rand_c(rng, CHI, D_PHYS, CHI)
    time_chain(
        lambda x: site_step(x, nxt, L, W, R), psi,
        label=f"WHOLE site step (arnoldi k7 relax={relax} plz={pallas})",
    )

    # ---- complex einsum vs planar-real Karatsuba matmul
    A = rand_c(rng, CHI * D_PHYS, CHI)
    B = rand_c(rng, CHI, CHI)

    @partial(jax.jit, static_argnames=("prec",))
    def cmm(a, b, prec):
        return jnp.einsum("ij,jk->ik", a, b, precision=K.PREC_MAP[prec])

    @partial(jax.jit, static_argnames=("prec",))
    def planar(a, b, prec):
        p = K.PREC_MAP[prec]
        ar, ai, br, bi = a.real, a.imag, b.real, b.imag
        m1 = jnp.dot(ar, br, precision=p)
        m2 = jnp.dot(ai, bi, precision=p)
        m3 = jnp.dot(ar + ai, br + bi, precision=p)
        return (m1 - m2) + 1j * (m3 - m1 - m2)

    for prec in ("highest", "high"):
        time_chain(lambda x, p=prec: cmm(x, B, p), A,
                   label=f"complex64 (4096x1024)@(1024x1024) {prec}")
        time_chain(lambda x, p=prec: planar(x, B, p), A,
                   label=f"planar 3-mult same shapes {prec}")
    err = sync(jnp.linalg.norm(planar(A, B, "high") - cmm(A, B, "highest"))
               / jnp.linalg.norm(cmm(A, B, "highest")))
    print(f"    planar-high vs complex-highest rel err: {err:.2e}",
          flush=True)

    # ---- 15x15 expm latency (scan of 100)
    T15 = rand_c(rng, 15, 15)

    @jax.jit
    def expm_loop(t):
        from jax.scipy.linalg import expm

        def body(c, _):
            c = expm((t + 0.001 * c) * 0.01)
            return c, None

        out, _ = jax.lax.scan(body, t * 0.0, None, length=100)
        return out

    t = time_chain(expm_loop, T15, label="expm(15x15) x100 (scan)")
    print(f"    per-expm: {t / 100:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
