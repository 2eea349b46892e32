"""Why does adaptive-D SPMD sit at Δρ ~6e-4 vs 5.8e-6 fixed-D? (VERDICT r4 #4)

Separates the two candidate error sources in the dryrun's adaptive
segment check (`__graft_entry__.dryrun_multichip`):

  (a) truncation-policy divergence — the SPMD sweep's masked JOINT-bond
      SVD at segment boundaries picks/truncates subspaces in a different
      order than the serial masked-a1TDVP sweep, so the two engines
      propagate on slightly different rank manifolds; the difference is
      bounded by the discarded weight (p_svd/p_proj), not a bug;
  (b) a genuine sweep bug that would persist when no truncation can fire.

Protocol: run the dryrun's exact model/config ladder over p_svd/p_proj
and Dmax.  If (a) is the story, Δρ collapses toward the fixed-D parity
level (~1e-6) as the truncation thresholds go to ~0 with ample Dmax,
and grows with looser thresholds.  If Δρ stays ~1e-4 at zero-truncation,
it's (b).

Usage: JAX_PLATFORMS=cpu python scripts/adaptive_spmd_accuracy.py
"""

from __future__ import annotations

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def run_case(p_svd: float, p_proj: float, Dmax: int, steps: int = 2):
    from pytdscf_tpu.basis import Boson
    from pytdscf_tpu.config import Config
    from pytdscf_tpu.mps.lattice import alloc_hartree_product
    from pytdscf_tpu.mps.tdvp import TDVPEngine
    from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
    from pytdscf_tpu.operators.tensor_op import TensorOperator
    from pytdscf_tpu.parallel import make_mesh
    from pytdscf_tpu.parallel.spmd_pitdvp import SPMDPITDVP

    # the dryrun's coupled-boson chain (same builder constants)
    nlev, nsite = 4, 6
    nmat = Boson(nlev).get_number_matrix()
    qmat = Boson(nlev).get_q_matrix()
    pot = {
        (s, s): TensorOperator(
            mpo=[(0.01 * (s + 1) * nmat)[None, :, :, None]], legs=(s, s)
        )
        for s in range(nsite)
    }
    for s in range(nsite - 1):
        pot[(s, s, s + 1, s + 1)] = TensorOperator(
            mpo=[(0.02 * qmat)[None, :, :, None], qmat[None, :, :, None]],
            legs=(s, s, s + 1, s + 1),
        )
    ham = TensorHamiltonian(nsite, [[pot]], kinetic=None)
    rng = np.random.default_rng(5)
    cores = alloc_hartree_product(
        [nlev] * nsite, 2,
        [rng.normal(size=nlev) + 1j * rng.normal(size=nlev)
         for _ in range(nsite)],
    )
    kw = dict(
        thresh_exp=1e-10, conserve_norm=False,
        adaptive=True, adaptive_Dmax=Dmax, adaptive_dD=2,
        adaptive_p_proj=p_proj, adaptive_p_svd=p_svd,
    )
    mesh = make_mesh({"chain": 2})
    eng = SPMDPITDVP(
        [c.astype(complex) for c in cores], ham,
        Config(jobname="ad_x", **kw), mesh,
    )
    ser = TDVPEngine(
        [[c.astype(complex) for c in cores]], ham,
        Config(jobname="ad_s", adaptive_masked=True, **kw),
    )
    for _ in range(steps):
        eng.propagate(0.1)
        ser.propagate(0.1)
    rd_p = np.asarray(eng.reduced_density((0, 2)))
    rd_s = np.asarray(ser.reduced_density((0, 2)))
    dims_p = eng.bond_dims()
    dims_s = ser.bond_dims(0)
    return float(np.max(np.abs(rd_p - rd_s))), list(dims_p), list(dims_s)


def main() -> None:
    print(f"{'p_svd':>9} {'p_proj':>9} {'Dmax':>5} {'max|drho|':>11} "
          f"bond dims (spmd | serial)")
    for p_svd, p_proj, Dmax in [
        (1e-8, 1e-6, 8),     # the dryrun configuration (Δρ ~6e-4 there)
        (1e-8, 1e-6, 16),    # more headroom, same thresholds
        (1e-12, 1e-10, 16),  # truncation ~off
        (0.0, 1e-14, 16),    # truncation OFF (keep every channel)
        (1e-6, 1e-4, 8),     # looser — Δρ should GROW if (a)
    ]:
        dev, dp, ds = run_case(p_svd, p_proj, Dmax)
        print(f"{p_svd:9.0e} {p_proj:9.0e} {Dmax:5d} {dev:11.3e} "
              f"{dp} | {ds}")


if __name__ == "__main__":
    main()
