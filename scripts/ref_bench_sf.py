"""Measure the REFERENCE (QCLovers/PyTDSCF @ /root/reference) on the
SAME 184-site singlet-fission model and hardware as bench.py.

The reference's published anchor (3.23 s/step, BASELINE.md) was taken on
the authors' CPU; this script produces the same-machine number so the
bench's ``vs_baseline`` can be cross-checked against hardware-matched
reality.  The model is bit-identical: this package's formula-generated
Holstein chain is compiled to ONE fused MPO (exactly how the reference's
own notebook feeds its example-12 MPO,
``/root/reference/docs/notebook/singlet_fission_nprocs.md:62-70``) and
handed to the reference's ``TensorHamiltonian``.

The reference's hard deps (pympo / discvar / polars / loguru / netCDF4)
are git-only installs unavailable here (zero egress); minimal inert stubs
are materialised under /tmp/refstubs — none of them are exercised by this
workload (SOP/DVR/logging-sink paths only).

Usage (CPU, never concurrently with pytest/bench):
    python scripts/ref_bench_sf.py                 # full: 61+1+122 sites
    REF_NL=4 REF_NR=6 REF_STEPS=3 python scripts/ref_bench_sf.py   # smoke

Prints one JSON line: {"metric", "value", "unit", "detail"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

STUBS = "/tmp/refstubs"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _write(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(text)


def materialise_stubs() -> None:
    _write(
        f"{STUBS}/loguru.py",
        "import logging as _l\n\n\nclass _Logger:\n"
        "    def __init__(self):\n"
        "        self._x = _l.getLogger('loguru-stub')\n\n"
        "    def __getattr__(self, n):\n"
        "        if n in ('debug','info','warning','error','critical',"
        "'exception','trace','success'):\n"
        "            return getattr(self._x, n, self._x.info)\n"
        "        if n == 'remove':\n"
        "            return lambda *a, **k: None\n"
        "        if n == 'add':\n"
        "            return lambda *a, **k: 0\n"
        "        if n in ('bind','opt','patch'):\n"
        "            return lambda *a, **k: self\n"
        "        raise AttributeError(n)\n\n\nlogger = _Logger()\n",
    )
    _write(
        f"{STUBS}/polars.py",
        "def __getattr__(n):\n"
        "    raise NotImplementedError(f'polars stub: {n}')\n",
    )
    _write(
        f"{STUBS}/pympo.py",
        "def __getattr__(n):\n"
        "    raise NotImplementedError(f'pympo stub: {n}')\n",
    )
    _write(
        f"{STUBS}/netCDF4.py",
        "class Dataset:\n"
        "    def __init__(self, *a, **k):\n"
        "        raise NotImplementedError('netCDF4 stub')\n",
    )
    _write(
        f"{STUBS}/discvar/__init__.py",
        "from .abc import DVRPrimitivesMixin  # noqa\n"
        "from .ho import HarmonicOscillator  # noqa\n"
        "from . import ho  # noqa\n",
    )
    _write(
        f"{STUBS}/discvar/abc.py",
        "class DVRPrimitivesMixin:\n    pass\n",
    )
    _write(
        f"{STUBS}/discvar/ho.py",
        "class HarmonicOscillator:\n"
        "    def __init__(self, *a, **k):\n"
        "        raise NotImplementedError('discvar stub')\n\n\n"
        "class PrimBas_HO:\n"
        "    def __init__(self, *a, **k):\n"
        "        raise NotImplementedError('discvar stub')\n",
    )
    # importlib.metadata lookup for the source tree
    _write(
        f"{STUBS}/pytdscf-0.1.dist-info/METADATA",
        "Metadata-Version: 2.1\nName: pytdscf\nVersion: 0.1.0\n",
    )
    _write(f"{STUBS}/pytdscf-0.1.dist-info/RECORD", "")


def main() -> None:
    n_left = int(os.environ.get("REF_NL", "61"))
    n_right = int(os.environ.get("REF_NR", "122"))
    steps = int(os.environ.get("REF_STEPS", "15"))
    warm = int(os.environ.get("REF_WARM", "5"))
    bond = int(os.environ.get("REF_BOND", "30"))
    backend = os.environ.get("REF_BACKEND", "numpy")

    # this package runs on CPU here in any case; pin before first use
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    # ---- the IDENTICAL model, compiled to one fused MPO ----------------
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pytdscf_tpu.models.holstein import singlet_fission_chain

    t0 = time.time()
    basis_tpu, ham_tpu = singlet_fission_chain(n_left=n_left, n_right=n_right)
    phys = [b.nprim for b in basis_tpu]
    fused = ham_tpu.fused_mpo(phys)
    pot_mpo = [np.asarray(c, dtype=np.complex128) for c in fused[0][0]]
    nsite = len(pot_mpo)
    log(f"ref-bench: fused MPO built in {time.time() - t0:.1f} s; "
        f"widths max {max(c.shape[0] for c in pot_mpo)}")

    # ---- reference package --------------------------------------------
    materialise_stubs()
    sys.path.insert(0, STUBS)
    sys.path.insert(0, "/root/reference")
    for mod in list(sys.modules):
        if mod == "pytdscf" or mod.startswith("pytdscf."):
            del sys.modules[mod]
    from pytdscf import (  # noqa: E402
        BasInfo,
        Boson,
        Exciton,
        Model,
        Simulator,
        TensorHamiltonian,
        TensorOperator,
    )

    basis = (
        [Boson(8)] * n_left
        + [Exciton(nstate=3, names=["S1", "TT", "CS"])]
        + [Boson(8)] * n_right
    )
    basinfo = BasInfo([basis])
    potential = [
        [{tuple((k, k) for k in range(nsite)): TensorOperator(mpo=pot_mpo)}]
    ]
    H = TensorHamiltonian(
        ndof=nsite, potential=potential, kinetic=None, backend=backend
    )
    model = Model(basinfo=basinfo, operators={"hamiltonian": H})
    model.m_aux_max = 1
    init_boson = [[1.0] + [0.0] * 7]
    model.init_HartreeProduct = [
        init_boson * n_left + [[0.0, 1.0, 0.0]] + init_boson * n_right
    ]

    os.makedirs("/tmp/refbench", exist_ok=True)
    os.chdir("/tmp/refbench")
    sim = Simulator(
        jobname="ref_sf_bench", model=model, backend=backend, verbose=2
    )
    # the notebook's propagation settings (singlet_fission_nprocs.md:130)
    # minus MPI/reduced densities; adaptive D<=bond exactly as published
    log(f"ref-bench: propagating {warm} warm + {steps} timed steps "
        f"(adaptive D<={bond}, backend={backend})")
    t0 = time.time()
    sim.propagate(
        maxstep=warm,
        stepsize=0.2,
        energy=False,
        autocorr=False,
        norm=False,
        populations=False,
        adaptive=True,
        adaptive_Dmax=bond,
        adaptive_dD=bond,
        adaptive_p_proj=1e-7,
        adaptive_p_svd=1e-6,
    )
    log(f"ref-bench: warmup {time.time() - t0:.1f} s")
    t0 = time.time()
    sim.propagate(
        maxstep=steps,
        stepsize=0.2,
        restart=True,
        loadfile_ext="",
        savefile_ext="",
        energy=False,
        autocorr=False,
        norm=False,
        populations=False,
        adaptive=True,
        adaptive_Dmax=bond,
        adaptive_dD=bond,
        adaptive_p_proj=1e-7,
        adaptive_p_svd=1e-6,
    )
    dt = (time.time() - t0) / steps
    print(json.dumps({
        "metric": "reference_singlet_fission_184site_sec_per_step",
        "value": round(dt, 4),
        "unit": "s/step",
        "detail": f"{n_left + 1 + n_right} sites, adaptive D<={bond}, "
                  f"backend={backend}, this machine's CPU",
    }))


if __name__ == "__main__":
    main()
