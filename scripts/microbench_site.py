"""Microbenchmark: ONE bulk-shape TDVP site step, in isolation.

Times the fused `_site_step` program at the 184-site bench's bulk shapes
(D=30 bonds, boson site, singlet-fission MPO width) — the unit whose cost
× ~368 site updates/step sets the driver bench.  Useful to A/B code
revisions without paying the full-chain compile.

Env knobs: MB_BOND (30), MB_REPS (100), MB_KRYLOV (10), MB_THRESH (1e-6).
"""

from __future__ import annotations

import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jaxcache-{jax.devices()[0].platform}",
)

import numpy as np  # noqa: E402


def main() -> None:
    import jax.numpy as jnp

    from pytdscf_tpu.models.holstein import singlet_fission_chain
    from pytdscf_tpu.mps import device_io as dio
    from pytdscf_tpu.mps import tdvp

    bond = int(os.environ.get("MB_BOND", "30"))
    reps = int(os.environ.get("MB_REPS", "100"))
    kmax = int(os.environ.get("MB_KRYLOV", "10"))
    thresh = float(os.environ.get("MB_THRESH", "1e-6"))
    platform = jax.devices()[0].platform
    dtype = jnp.complex64 if platform != "cpu" else jnp.complex128

    basis, ham = singlet_fission_chain(n_left=8, n_right=8)
    phys_dims = [b.nprim for b in basis]
    fused = ham.fused_mpo(phys_dims)
    W_all = fused[0][0]
    p = 4  # a bulk boson site
    W = dio.put(W_all[p], dtype)
    d = phys_dims[p]
    wl, wr = W.shape[0], W.shape[-1]
    rng = np.random.default_rng(0)

    def cx(*shape):
        a = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        return dio.put((a / np.linalg.norm(a)).astype(np.complex128), dtype)

    psi = cx(bond, d, bond)
    nxt = cx(bond, d, bond)
    L = cx(bond, wl, bond)
    R = cx(bond, wr, bond)
    lg = dio.put(np.asarray(0.0, np.float32), jnp.float32)
    scale = dio.put(np.asarray(-0.5j * 0.008), dtype)

    static = dict(
        pairs=((0, 0),), nstate=1, mode="prop", conserve_norm=True,
        arnoldi=False, max_dim=kmax, last=False, forward=True,
    )

    print(
        f"site microbench: platform={platform} bond={bond} d={d} "
        f"w=({wl},{wr}) kmax={kmax} thresh={thresh}",
        file=sys.stderr,
    )

    # ON-DEVICE rep loop: psi_next has psi's shape, so the reps chain in a
    # fori_loop and the whole measurement is ONE dispatch — pure device
    # time, immune to host/tunnel latency.
    @jax.jit
    def run_n(psi, nxt, L, W, R, scale, n):
        def body(_, carry):
            cur, kry = carry
            out = tdvp._site_step_impl(
                (cur,), (nxt,), (L,), (W,), (R,), scale, thresh,
                (lg,), (lg,), **static,
            )
            return out[1][0], kry + out[4]

        kry0 = jnp.zeros((3,), jnp.int32)
        return jax.lax.fori_loop(0, n, body, (psi, kry0))

    t0 = time.time()
    out = run_n(psi, nxt, L, W, R, scale, jnp.asarray(1, jnp.int32))
    _ = float(jnp.linalg.norm(out[0]).real)
    print(f"compile+first: {time.time() - t0:.2f} s", file=sys.stderr)

    t0 = time.time()
    out = run_n(psi, nxt, L, W, R, scale, jnp.asarray(reps, jnp.int32))
    _ = float(jnp.linalg.norm(out[0]).real)
    dt = time.time() - t0
    kry = np.asarray(dio.fetch(out[1]))
    print(
        f"{reps} site steps (one dispatch): {dt:.3f} s -> "
        f"{1e3 * dt / reps:.3f} ms/site "
        f"(kry iters/call {kry[0] / max(kry[1], 1):.2f})",
        file=sys.stderr,
    )
    print(f'{{"ms_per_site": {1e3 * dt / reps:.4f}}}')


if __name__ == "__main__":
    main()
