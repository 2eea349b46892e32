"""H2CO 6-mode driver-loop wall-clock (BASELINE.md metric #2).

Times the FULL Simulator loop — sweep + per-step autocorr/energy/norm/
populations export — exactly the configuration recorded in BASELINE.md
(6×HO(6) FBR, nMR quartic force field, D=6, dt=0.1 fs).  The driver loop
is where the round-3c desync levers land (`Config.fetch_stride`,
env-reuse ⟨H⟩, scanned property chains), so this is their A/B surface:

    python scripts/h2co_bench.py                 # tuned defaults
    H2CO_STRIDE=1 python scripts/h2co_bench.py   # per-step syncs (round-3a)
    H2CO_STEPS=100 JAX_PLATFORMS=cpu python scripts/h2co_bench.py  # smoke

Prints one JSON line {"metric", "value", "unit", "detail"}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        f"/tmp/jaxcache-{jax.devices()[0].platform}",
    )

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pytdscf_tpu import units
    from pytdscf_tpu.basis import PrimBas_HO
    from pytdscf_tpu.model import BasInfo, Model
    from pytdscf_tpu.operators.sop import read_potential_nMR
    from pytdscf_tpu.potentials import ch2o_k_orig
    from pytdscf_tpu.simulator import Simulator

    steps = int(os.environ.get("H2CO_STEPS", "500"))
    stride = os.environ.get("H2CO_STRIDE")
    warm = int(os.environ.get("H2CO_WARM", "20"))

    prim_info = [
        [
            PrimBas_HO(
                0.0, math.sqrt(ch2o_k_orig[(i, i)]) * units.au_in_cm1, 6
            )
            for i in range(1, 7)
        ]
    ]
    basinfo = BasInfo(prim_info)
    ham = read_potential_nMR(ch2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=6)

    os.makedirs("/tmp/h2co_bench", exist_ok=True)
    os.chdir("/tmp/h2co_bench")
    kwargs = dict(stepsize=0.1)
    if stride is not None:
        kwargs["fetch_stride"] = int(stride)
    sim = Simulator("h2co_bench", model, verbose=0)
    t0 = time.time()
    sim.propagate(maxstep=warm, **kwargs)
    print(f"h2co-bench: warmup {time.time() - t0:.1f} s "
          f"({jax.devices()[0].platform})", file=sys.stderr, flush=True)
    t0 = time.time()
    e, _ = sim.propagate(
        maxstep=steps, restart=True, loadfile_ext="", savefile_ext="",
        **kwargs,
    )
    per = (time.time() - t0) / steps
    print(json.dumps({
        "metric": "h2co_6mode_driver_ms_per_step",
        "value": round(per * 1e3, 2),
        "unit": "ms/step",
        "detail": f"{steps} steps, fetch_stride="
                  f"{kwargs.get('fetch_stride', 'auto')}, "
                  f"platform={jax.devices()[0].platform}, "
                  f"E={float(e):.6f}",
    }))


if __name__ == "__main__":
    main()
