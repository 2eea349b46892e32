"""Microbench: CholeskyQR variants at north-star gauge shapes on TPU.

Times the (N, r) = (chi*d, chi) complex64 thin-QR factor used by every
gauge move at chi=1024 (split layout, d=4), comparing the triangular-solve
round body against the (r, r) inverse + MXU matmul body
(PYTDSCF_CHQR_SOLVE=1 vs default).  Run each variant in a SEPARATE process
(the flag is read at import).

    python scripts/microbench_chqr.py                   # inverse (default)
    PYTDSCF_CHQR_SOLVE=1 python scripts/microbench_chqr.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# the environment pre-imports JAX, so JAX_PLATFORMS in os.environ can be
# ignored — honor it via jax.config (same dance as bench.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jaxcache-{jax.devices()[0].platform}")

from pytdscf_tpu.mps import device_io  # noqa: E402
from pytdscf_tpu.mps import kernels as K  # noqa: E402


def main() -> None:
    chi = int(os.environ.get("MB_CHI", "1024"))
    d = int(os.environ.get("MB_D", "4"))
    reps = int(os.environ.get("MB_REPS", "20"))
    variant = "solve" if not K.CHQR_INVERSE else "inverse"
    gram = "mixed(bf16x3+final-exact)" if K.CHQR_MIXED_GRAM else "exact"
    print(f"chqr microbench: N={chi * d} r={chi} variant={variant} "
          f"iters={K.CHQR_ITERS} gram={gram}", file=sys.stderr)

    rng = np.random.default_rng(0)
    # decaying Schmidt-like spectrum, representative conditioning
    u, _ = np.linalg.qr(rng.normal(size=(chi * d, chi)))
    sv = np.logspace(0, -5, chi)
    a = (u * sv) @ np.linalg.qr(rng.normal(size=(chi, chi)))[0]
    a = device_io.put(a + 0.1j * a[::-1], jnp.complex64)

    f = jax.jit(K._cholesky_qr)

    # complex ops must run inside jit on this TPU; fetch real scalars only
    @jax.jit
    def _norm(x):
        return jnp.abs(jnp.linalg.norm(x))

    @jax.jit
    def _checks(q, r, a):
        g = jnp.einsum("ik,il->kl", q.conj(), q,
                       precision=jax.lax.Precision.HIGHEST)
        orth = jnp.max(jnp.abs(g - jnp.eye(chi, dtype=g.dtype)))
        rec = jnp.abs(jnp.linalg.norm(q @ r - a) / jnp.linalg.norm(a))
        return orth, rec

    q, r = f(a)
    # value-fetch sync (tunnel)
    float(_norm(q))
    t0 = time.time()
    for _ in range(reps):
        q, r = f(a)
    float(_norm(q))
    dt = (time.time() - t0) / reps
    orth_d, rec_d = _checks(q, r, a)
    orth, rec = float(orth_d), float(rec_d)
    print(f"{variant}: {dt * 1e3:.2f} ms/factor  orth={orth:.2e}  "
          f"recon={rec:.2e}")


if __name__ == "__main__":
    main()
