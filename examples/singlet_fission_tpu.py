"""Example: 184-site singlet-fission chain on a TPU chip.

The benchmark model behind BASELINE.md's headline number: 61 + 122 phonon
modes (Fock dim 8) Holstein-coupled to one 3-level exciton site, propagated
with fused-XLA 1-site TDVP at bond dimension 30 in complex64 (0.04 s/step
on one TPU v5e vs 3.23 s/step for the reference's CPU MPI baseline).

    python examples/singlet_fission_tpu.py          # TPU if available
    JAX_PLATFORMS=cpu python examples/singlet_fission_tpu.py
"""

import os
import time

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from pytdscf_tpu import units
    from pytdscf_tpu.config import Config
    from pytdscf_tpu.models.holstein import singlet_fission_chain
    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.mps.tdvp import TDVPEngine

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = "complex64" if on_tpu else "complex128"
    print(f"platform={jax.devices()[0].platform}  dtype={dtype}")

    basis, ham = singlet_fission_chain()
    phys = [b.nprim for b in basis]
    exciton_site = 61
    vecs = []
    for i, b in enumerate(basis):
        v = np.zeros(b.nprim, dtype=complex)
        v[1 if i == exciton_site else 0] = 1.0  # exciton on level 1
        vecs.append(v)
    cores = [alloc_hartree_product(phys, 30, vecs)]
    engine = TDVPEngine(
        cores, ham,
        Config(jobname="sf", thresh_exp=1e-6 if on_tpu else 1e-9, dtype=dtype),
    )
    dt = 0.2 / units.au_in_fs
    print(f"E(0) = {engine.expectation().real:.8f} Eh")
    t0 = time.time()
    engine.propagate(dt)
    print(f"warm-up step (compile): {time.time() - t0:.1f} s")
    t0 = time.time()
    nstep = 10
    for _ in range(nstep):
        engine.propagate(dt)
    import jax as _j

    _j.block_until_ready(engine.cores[0][0])
    print(f"{(time.time() - t0) / nstep * 1e3:.1f} ms/step over {nstep} steps")
    print(f"E(t) = {engine.expectation().real:.8f} Eh  norm = {engine.norm():.8f}")
    # exciton-site populations
    rho = engine.grid_pop(exciton_site)
    print("exciton populations:", np.round(rho, 6))


if __name__ == "__main__":
    main()
