"""Measure the REFERENCE on the H2CO 6-mode driver loop (BASELINE #2).

Same model definition as this package's ``scripts/h2co_bench.py``
(6×HO(6) FBR, the bundled quartic force field fed to the reference's own
``read_potential_nMR``, D=6, dt=0.1 fs, per-step autocorr/energy/norm/
populations), run through the reference Simulator on this machine's CPU.
Dependency stubs as in ``ref_bench_sf.py``.

    python scripts/ref_bench_h2co.py
    REF_STEPS=50 python scripts/ref_bench_h2co.py     # smoke
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


def main() -> None:
    steps = int(os.environ.get("REF_STEPS", "500"))
    warm = int(os.environ.get("REF_WARM", "20"))
    backend = os.environ.get("REF_BACKEND", "numpy")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pytdscf_tpu.potentials import ch2o_k_orig

    sys.path.insert(0, os.path.join(repo, "scripts"))
    from ref_bench_sf import materialise_stubs, STUBS

    materialise_stubs()
    sys.path.insert(0, STUBS)
    sys.path.insert(0, "/root/reference")
    for mod in list(sys.modules):
        if mod == "pytdscf" or mod.startswith("pytdscf."):
            del sys.modules[mod]
    from pytdscf import BasInfo, Model, Simulator, units  # noqa: E402
    from pytdscf.basis._primints_cls import PrimBas_HO  # noqa: E402
    from pytdscf.hamiltonian_cls import read_potential_nMR  # noqa: E402

    prim_info = [
        [
            PrimBas_HO(
                0.0, math.sqrt(ch2o_k_orig[(i, i)]) * units.au_in_cm1, 6
            )
            for i in range(1, 7)
        ]
    ]
    basinfo = BasInfo(prim_info)
    ham = read_potential_nMR(dict(ch2o_k_orig))
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=6)
    model.ints_prim_file = None

    os.makedirs("/tmp/refbench_h2co", exist_ok=True)
    os.chdir("/tmp/refbench_h2co")
    sim = Simulator("ref_h2co", model, backend=backend, verbose=2)
    t0 = time.time()
    sim.propagate(maxstep=warm, stepsize=0.1)
    print(f"ref-h2co: warmup {time.time() - t0:.1f} s", file=sys.stderr,
          flush=True)
    t0 = time.time()
    e, _ = sim.propagate(
        maxstep=steps, stepsize=0.1, restart=True, loadfile_ext="",
        savefile_ext="",
    )
    per = (time.time() - t0) / steps
    print(json.dumps({
        "metric": "reference_h2co_6mode_driver_ms_per_step",
        "value": round(per * 1e3, 2),
        "unit": "ms/step",
        "detail": f"{steps} steps, backend={backend}, this machine's "
                  f"CPU, E={float(e):.6f}",
    }))


if __name__ == "__main__":
    main()
