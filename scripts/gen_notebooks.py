"""Generate + execute the workflow notebooks under docs/notebooks/.

The reference documents its workflows as ~20 Jupyter notebooks
(``/root/reference/docs/notebook/``); ``docs/WORKFLOWS.md`` maps that
surface to this package.  This script materialises the three core
workflows as EXECUTED notebooks (outputs stored, CPU, complex128
parity precision) so users get the same teach-by-notebook experience:

  1. h2o_ir_spectrum.ipynb        — relax → operate(μ) → propagate → FFT
  2. radical_pair_liouville.ipynb — open-system Liouville MPDO dynamics
  3. parallel_spmd.ipynb          — chain-parallel SPMD sweep + batched
                                    trajectory ensembles on a device mesh

Run:  python scripts/gen_notebooks.py          (~5 min CPU)
"""

from __future__ import annotations

import os
import sys
import tempfile

import nbformat
from nbclient import NotebookClient

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, "docs", "notebooks")


def build(cells):
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python",
    }
    for kind, src in cells:
        if kind == "md":
            nb.cells.append(nbformat.v4.new_markdown_cell(src.strip()))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(src.strip()))
    return nb


PREAMBLE = """
import os
import jax

# parity-precision (complex128) workflow — pin the CPU backend in-process
# (the ambient JAX_PLATFORMS may point at a TPU without complex128)
jax.config.update("jax_platforms", os.environ.get("PYTDSCF_PLATFORM", "cpu"))

import numpy as np
import matplotlib
matplotlib.rcParams["figure.dpi"] = 80
import matplotlib.pyplot as plt
"""

H2O = [
    ("md", """
# H₂O IR spectrum: relax → operate(μ) → propagate → FFT

The canonical polynomial-PES pipeline on the bundled 3-mode quartic H₂O
force field — the counterpart of the reference's
`poly-MPO-H2O-{relax,operate,propagate}` and `spectra-H2O` notebooks.
Total runtime ≈ 1 minute on CPU.

The spectra pipeline is pinned to the reference literal (peak
2684.0796620397296 cm⁻¹ / intensity 28860.651565826236 —
`tests/test_spectra.py`).
"""),
    ("code", PREAMBLE + """
import math
from pytdscf_tpu import spectra, units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import h2o_k_orig, h2o_mu
from pytdscf_tpu.simulator import Simulator
"""),
    ("md", """
## Model

Three harmonic-oscillator primitive bases (9 functions each) at the
diagonal force-constant frequencies, and the quartic nMR expansion of the
potential (`read_potential_nMR` — same conventions as the reference's
`hamiltonian_cls.read_potential_nMR`).
"""),
    ("code", """
prim = [[PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
         for i in (1, 2, 3)]]
basinfo = BasInfo(prim)
ham = read_potential_nMR(h2o_k_orig)
model = Model(basinfo, {"hamiltonian": ham}, bond_dim=9)
"""),
    ("md", """
## 1. Improved relaxation to the vibrational ground state

Imaginary-time sweeps with CI diagonalisation (`improved=True`) — writes
`wf_h2o_gs.pkl`.
"""),
    ("code", """
e_gs, _ = Simulator("h2o", model, verbose=0).relax(
    maxstep=10, stepsize=0.1, improved=True
)
print(f"E_gs = {e_gs:.10f} Eh")
"""),
    ("md", """
## 2. Act the dipole surface on |0⟩

A variational MPS fit of μ|0⟩ (the reference's `operate` runtype) —
reads the `_gs` checkpoint, writes `_operate`.
"""),
    ("code", """
mu_ham = read_potential_nMR(None, dipole_emu=h2o_mu, efield=(1e-2, 1e-2, 1e-2))
model_mu = Model(basinfo, {"hamiltonian": mu_ham}, bond_dim=9)
norm, _ = Simulator("h2o", model_mu, verbose=0).operate(
    maxstep=10, restart=True, loadfile_ext="_gs"
)
print(f"|mu|0>| = {norm:.8f}")
"""),
    ("md", """
## 3. Real-time propagation

500 × 0.2 fs; the autocorrelation ⟨ψ(0)|ψ(t)⟩ streams to
`h2o_prop/autocorr.dat` using the T/2 trick (a(2t) = ⟨ψ*(t)|ψ(t)⟩).
"""),
    ("code", """
Simulator("h2o", model, verbose=0).propagate(
    maxstep=500, stepsize=0.2, restart=True, loadfile_ext="_operate"
)
print("propagation done")
"""),
    ("md", """
## 4. FFT → IR spectrum
"""),
    ("code", """
t_fs, ac = spectra.load_autocorr("h2o_prop/autocorr.dat")
freq, inten = spectra.ifft_autocorr(t_fs, ac, E_shift=e_gs * units.au_in_eV)
sel = (freq > 1000) & (freq < 4200)
plt.figure(figsize=(7, 3))
plt.plot(freq[sel], inten[sel])
plt.xlabel("wavenumber [cm$^{-1}$]"); plt.ylabel("intensity [arb.]")
plt.title("H$_2$O IR spectrum (3-mode quartic PES)")
plt.tight_layout(); plt.show()
top = np.argsort(inten[sel])[-3:]
print("strongest lines [cm^-1]:", np.sort(freq[sel][top]).round(1))
"""),
]

RADICAL_PAIR = [
    ("md", """
# Open-system dynamics: Liouville-space MPDO with a non-Hermitian generator

A 3-site spin chain (bath-½ / central spin-1 / bath-½) with Haberkorn
damping and Lindblad dephasing, propagated as a vectorised density matrix
— the same workflow family as the reference's `radicalpair-liouville`
notebook.  The Liouvillian is non-Hermitian, so the sweeps use
short-iterative **Arnoldi** instead of Lanczos.

The symbolic layer below is the in-package replacement of the reference's
external `pympo` (SumOfProducts / OpSite / AssignManager).  See
`docs/RADICAL_PAIR.md` for the full radical-pair model family (hyperfine
Hamiltonians, χ≥1024 MPDO benchmarks, SSE trajectory route).
"""),
    ("code", PREAMBLE + """
import math
from pytdscf_tpu import units
from pytdscf_tpu.basis import Exciton
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.symbolic import (
    AssignManager, OpSite, SumOfProducts, get_eye_site,
)
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util import read_nc
"""),
    ("md", """
## Liouvillian as a symbolic sum of products

Coherent part ``-i[H, ρ]`` via left/right twin operators
(L ⊗ I and I ⊗ Lᵀ on the doubled d² site), plus the Haberkorn sink and a
Lindblad dephasing channel on the central spin.
"""),
    ("code", """
SX = np.array([[0, 1], [1, 0]]) / 2
SY = np.array([[0, -1j], [1j, 0]]) / 2
SZ = np.array([[1, 0], [0, -1]]) / 2
IZ = np.diag([1.0, 0.0, -1.0]) / 2
IP = np.array([[0, math.sqrt(2), 0], [0, 0, math.sqrt(2)], [0, 0, 0]]) / 2
IX, IY = 0.5 * (IP + IP.T), -0.5j * (IP - IP.T)
E2, E3 = np.eye(2), np.eye(3)
J01, J12, B, K_HAB, K_DEPH = 0.8, 0.6, 1.0, 0.05, 2.0

twin_l = lambda op: np.kron(op, np.eye(op.shape[0]))
twin_r = lambda op: np.kron(np.eye(op.shape[0]), op.T)

sop = SumOfProducts()
O = lambda n, s, v: OpSite(n, s, value=v)
for mat in (IX, IY, IZ):
    sop += B * (O(f"L{id(mat)}", 1, twin_l(mat)) - O(f"R{id(mat)}", 1, twin_r(mat)))
for (J, sa, ma, sb, mb) in (
    (J01, 0, (SX, SY, SZ), 1, (IX, IY, IZ)),
    (J12, 1, (IX, IY, IZ), 2, (SX, SY, SZ)),
):
    for A_, B_ in zip(ma, mb):
        sop += J * (
            O(f"l{sa}{id(A_)}", sa, twin_l(A_)) * O(f"l{sb}{id(B_)}", sb, twin_l(B_))
            - O(f"r{sa}{id(A_)}", sa, twin_r(A_)) * O(f"r{sb}{id(B_)}", sb, twin_r(B_))
        )
sop += (-1.0j * K_HAB) * O("e", 1, np.kron(E3, E3))
L = IZ * math.sqrt(K_DEPH)
sop += 1.0j * O("LL", 1, np.kron(L, L.conj()))
sop += (-0.5j) * O("LLd", 1, np.kron(L.conj().T @ L, E3))
sop += (-0.5j) * O("dLL", 1, np.kron(E3, L.T @ L.conj()))
sop += 0.0 * (get_eye_site(0, 4) * get_eye_site(1, 9) * get_eye_site(2, 4))
am = AssignManager(sop.simplify())
am.assign()
mpo = am.numerical_mpo()
print("MPO bond widths:", [w.shape[0] for w in mpo] + [mpo[-1].shape[-1]])
"""),
    ("md", """
## Propagate the MPDO

`space="liouville"` vectorises ρ site-by-site; the initial state is the
central spin in |−1⟩ with maximally-mixed baths.  Reduced densities
export to genuine netCDF4 (`reduced_density.nc`).
"""),
    ("code", """
basis = [Exciton(4), Exciton(9), Exciton(4)]
pini = np.diag([0.0, 0.0, 1.0]).astype(complex)
model = Model(basis, {"hamiltonian": mpo}, space="liouville", bond_dim=16)
model.init_HartreeProduct = [[E2.reshape(-1), pini.reshape(-1), E2.reshape(-1)]]
sim = Simulator("radical_pair", model, verbose=0)
sim.propagate(
    reduced_density=([(1, 1)], 1), maxstep=60,
    stepsize=0.2 * units.au_in_fs, autocorr=False, energy=False,
    norm=False, populations=False, conserve_norm=False,
    integrator="arnoldi",
)
print("done")
"""),
    ("md", """
## Central-spin populations and trace decay

The Haberkorn sink drains the trace; dephasing mixes the populations.
"""),
    ("code", """
rd = read_nc("radical_pair_prop/reduced_density.nc", [(1, 1)])
rho_t = rd[(1, 1)]
pops = np.real([np.diag(r) for r in rho_t])
t = 0.2 * np.arange(1, len(pops) + 1)
plt.figure(figsize=(7, 3))
for lvl, lab in enumerate(("m=+1", "m=0", "m=-1")):
    plt.plot(t, pops[:, lvl], label=lab)
plt.plot(t, pops.sum(axis=1), "k--", label="trace")
plt.xlabel("time [a.u.]"); plt.ylabel("population"); plt.legend()
plt.title("central spin-1 populations (Haberkorn + Lindblad dephasing)")
plt.tight_layout(); plt.show()
print("final populations:", np.round(pops[-1], 4), " trace:", round(pops[-1].sum(), 4))
"""),
]

PARALLEL = [
    ("md", """
# Parallelism on a device mesh: chain-parallel sweeps + trajectory ensembles

The reference parallelises over MPI ranks
(`singlet_fission_nprocs` notebook, `mpirun -n 4 ...`); here the same
real-space chain decomposition runs as **one shard_map program** over a
`jax.sharding.Mesh` — on TPU pods the boundary exchanges ride ICI
collectives.  This notebook provisions 8 *virtual* CPU devices, exactly
like `tests/conftest.py`, so everything below runs on a laptop; on real
hardware the same code spans chips.

See `docs/PARALLEL.md` for the full parallel surface (SPMD engine,
bond-dimension tensor parallelism, ensemble batching).
"""),
    ("code", """
import os
import jax

# 8 virtual CPU devices (must run before first backend use)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import matplotlib
matplotlib.rcParams["figure.dpi"] = 80
import matplotlib.pyplot as plt

print(jax.devices())
"""),
    ("md", """
## 1. Chain-parallel propagation through the Simulator driver

`parallel_split_indices` partitions the site chain into segments — one
per device — and the driver constructs the SPMD shard_map engine
(the reference's `mpirun` + `MPSCoefParallel` analog).  Properties,
dat export, checkpoint/restart all work identically in parallel mode.
""" ),
    ("code", """
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import PolynomialHamiltonian
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util.helper_input import matJ_1D_exciton

def make_model():
    freqs = [763.31, 1556.64]
    disps = [0.317, 0.429]
    s0 = [PrimBas_HO(0.0, f, 5) for f in freqs]
    s1 = [PrimBas_HO(d, f, 5) for f, d in zip(freqs, disps)]
    prim, _, _, matJ = matJ_1D_exciton(2, 5, s0, s1, 1.0e-03)
    basinfo = BasInfo(prim)
    ham = PolynomialHamiltonian(basinfo.get_ndof(), basinfo.get_nstate())
    ham.coupleJ = matJ
    ham.set_HO_potential(basinfo)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=6)
    model.init_weight_ESTATE = [1.0, 0.0]
    return model

e_ser, _ = Simulator("exciton_serial", make_model(), verbose=0).propagate(
    stepsize=0.2, maxstep=6, loadfile_ext="", autocorr=True)
e_par, _ = Simulator("exciton_parallel", make_model(), verbose=0).propagate(
    stepsize=0.2, maxstep=6, loadfile_ext="", autocorr=True,
    parallel_split_indices=[(0, 1), (2, 3)])
print(f"serial   <H> = {e_ser:.10f}")
print(f"parallel <H> = {e_par:.10f}   |diff| = {abs(e_par - e_ser):.2e}")
"""),
    ("md", """
The difference is the boundary-splitting error of the two-phase parallel
sweep (the reference's MPI engine has the same property —
`tests/test_mpi_exiciton_propagate.py` uses the same tolerance class).
"""),
    ("md", """
## 2. Trajectory ensembles: the whole ensemble in ONE program

The SSE / wavefunction-trajectory route (reference
`radicalpair-sse.ipynb`) propagates many stochastic trajectories.  The
reference loops one simulator run per trajectory;
`batched_sse_propagate` advances the WHOLE ensemble through `nsteps` of
non-Hermitian (Arnoldi) TDVP in one scan-compiled shard_map program —
vmap-batched within each device, `dp`-sharded across the mesh, per-step
electron RDMs psum-reduced in-mesh.  Measured on one TPU v5e chip:
**9.15× (64 traj) / 9.8× (256 traj)** vs the serial loop (BASELINE.md).
"""),
    ("code", """
from pytdscf_tpu.model import Model as RPModel
from pytdscf_tpu.models.radical_pair import (
    radical_pair_hamiltonian, spin_coherent_weights,
)
from pytdscf_tpu.mps.lattice import alloc_hartree_product
from pytdscf_tpu.parallel import batched_sse_propagate, make_mesh

NTRAJ, BD, NSTEP = 16, 8, 8
basis, mpo, ele_site = radical_pair_hamiltonian(
    hfcs_1=[(2, 0.4)] * 2, hfcs_2=[(2, 0.5)] * 2)
phys = [b.nstate for b in basis]
fused = RPModel(basis, {"hamiltonian": mpo}, bond_dim=BD) \\
    .hamiltonian.fused_mpo(phys)[0][0]

SINGLET = np.array([0.0, 1/np.sqrt(2), -1/np.sqrt(2), 0.0])
rng = np.random.default_rng(7)
hps = [[SINGLET if s == ele_site
        else spin_coherent_weights(b.nstate, rng.random(), rng.random())
        for s, b in enumerate(basis)] for _ in range(NTRAJ)]
percore = [alloc_hartree_product(phys, BD, hp) for hp in hps]
import jax.numpy as jnp
bcores = tuple(jnp.asarray(np.stack([t[p] for t in percore]))
               for p in range(len(phys)))
Ws = tuple(jnp.asarray(w) for w in fused)

mesh = make_mesh({"dp": 8})   # 16 trajectories sharded over 8 devices
_, rdms = batched_sse_propagate(
    mesh, bcores, Ws, complex(-0.5j * 0.5), NSTEP, ele_site)
surv = np.real([np.trace(r) for r in np.asarray(rdms)]) / NTRAJ
plt.figure(figsize=(7, 2.5))
plt.plot(0.5 * np.arange(1, NSTEP + 1), surv, marker="o")
plt.xlabel("time [ns]"); plt.ylabel("ensemble survival")
plt.title(f"Haberkorn decay, {NTRAJ} SSE trajectories on dp=8")
plt.tight_layout(); plt.show()
print("ensemble survival per step:", np.round(surv, 6))
"""),
    ("md", """
## 3. Where this scales

* **chain axis** — segments of the site chain per device
  (`parallel_split_indices`, shard_map + ppermute boundary handoffs);
* **dp axis** — trajectory/ensemble batching (`batched_sse_propagate`);
* **tp axis** — bond-dimension (χ) tensor parallelism for states larger
  than one chip's HBM (`parallel/bond_tp.py`, GSPMD-sharded TDVP);
* all three compose with the same engine features (Arnoldi MPDO sweeps,
  adaptive bond dimension, in-mesh observables — `STATUS.md` §2.5).
"""),
]


def main() -> None:
    os.makedirs(OUTDIR, exist_ok=True)
    jobs = [
        ("h2o_ir_spectrum.ipynb", H2O),
        ("radical_pair_liouville.ipynb", RADICAL_PAIR),
        ("parallel_spmd.ipynb", PARALLEL),
    ]
    only = sys.argv[1:] or None
    for name, cells in jobs:
        if only and not any(o in name for o in only):
            continue
        nb = build(cells)
        with tempfile.TemporaryDirectory() as wd:
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
            os.environ["PYTHONPATH"] = env["PYTHONPATH"]
            client = NotebookClient(
                nb, timeout=1200, kernel_name="python3",
                resources={"metadata": {"path": wd}},
            )
            print(f"executing {name} …", flush=True)
            client.execute()
        out = os.path.join(OUTDIR, name)
        with open(out, "w") as fh:
            nbformat.write(nb, fh)
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
