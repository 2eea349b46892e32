"""Generate + execute the workflow notebooks under docs/notebooks/.

The reference documents its workflows as ~20 Jupyter notebooks
(``/root/reference/docs/notebook/``); ``docs/WORKFLOWS.md`` maps that
surface to this package.  This script materialises the workflows as
EXECUTED notebooks (outputs stored, CPU, complex128 parity precision)
so users get the same teach-by-notebook experience:

  1.  h2o_ir_spectrum.ipynb        — relax → operate(μ) → propagate → FFT
  2.  radical_pair_liouville.ipynb — open-system Liouville MPDO dynamics
  3.  parallel_spmd.ipynb          — chain-parallel SPMD sweep + batched
                                     trajectory ensembles on a device mesh
  4.  henon_heiles_dvr.ipynb       — HO/Sine DVR + TD reduced densities
  5.  grid_pes_database.ipynb      — DVR_Mesh → PES db → nMR MPO pipeline
  6.  pyrazine_qvc.ipynb           — 24-mode QVC S2 decay + UV band
  7.  donor_acceptor.ipynb         — LE→CS exciton dissociation
  8.  lvc_vibronic.ipynb           — LVC vibronic dynamics
  9.  mps_mctdh_hybrid.ipynb       — MPS-MCTDH hybrid vs full-rank MPS
  10. adaptive_bond_dimension.ipynb— adaptive-D a1TDVP walkthrough
  11. butadiene_ir_chain.ipynb     — polyene relax→operate→propagate IR
  12. sse_ensemble.ipynb           — batched SSE trajectory ensembles
  13. poly_sop_h2o.ipynb           — the polynomial-SOP input route
                                     (reference poly-SOP-H2O trio)
  14. td_reduced_density_exciton.ipynb — exciton-as-MPS-site TD reduced
                                     densities (reference Example 11)
  15. visualize.ipynb              — reduced-density postprocessing +
                                     phase-coloured Hinton animation

Run:  python scripts/gen_notebooks.py [name-filter ...]   (~30 min CPU)
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
# (the ambient JAX_PLATFORMS may point at a TPU without complex128).
# Skip the persistent compile cache: XLA:CPU AOT reloads can emit noisy
# machine-feature warnings into cell outputs (and SIGILL after a VM
# migration); these models compile in seconds anyway.
os.environ["PYTDSCF_NO_COMPILE_CACHE"] = "1"
jax.config.update("jax_platforms", os.environ.get("PYTDSCF_PLATFORM", "cpu"))

import numpy as np
import matplotlib
matplotlib.rcParams["figure.dpi"] = 80
# fixed-order categorical palette + single-hue sequential ramp (CVD-safe)
PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
matplotlib.rcParams["axes.prop_cycle"] = matplotlib.cycler(color=PALETTE)
from matplotlib.colors import LinearSegmentedColormap
SEQ_CMAP = LinearSegmentedColormap.from_list(
    "blues_seq",
    ["#fcfcfb", "#cde2fb", "#86b6ef", "#3987e5", "#256abf", "#0d366b"],
)
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


HENON = [
    ("md", """
# Grid-based (DVR) dynamics: Hénon–Heiles on HO-DVR and Sine-DVR

Counterpart of the reference's `henon_heiles_HO-DVR` /
`henon_heiles_Sine-DVR` notebooks plus the `TD_reduced_density` workflow:
build an nMR grid MPO from analytic component functions
(`construct_nMR_recursive`), add the DVR kinetic MPO, propagate, and
export the time-dependent position density ρ(Q₀, t).

The 2-mode energy is pinned to the reference's exact CI literal
0.018225341011652626 Eh (`tests/test_henon_heiles.py`).
"""),
    ("code", PREAMBLE + """
from pytdscf_tpu import units
from pytdscf_tpu.basis import HarmonicOscillator, Sine
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.dvr import (
    construct_kinetic_mpo,
    construct_nMR_recursive,
)
from pytdscf_tpu.simulator import Simulator
"""),
    ("md", """
## Mass-weighted Hénon–Heiles components

V = Σ w²Qᵢ²/2 + λ w^{3/2} (Σ Qᵢ²Qᵢ₊₁ − Qᵢ₊₁³/3), here f = 2 modes at
ω = 2000 cm⁻¹, λ = 10⁻³.  The nMR builder takes the per-cluster component
functions directly.
"""),
    ("code", """
F, NGRID, LAM = 2, 5, 1.0e-03
W = 2000.0 / units.au_in_cm1

funcs = {
    (0,): lambda q: W**2 / 2 * q**2,
    (1,): lambda q: W**2 / 2 * q**2 - LAM * W**1.5 / 3 * q**3,
    (0, 1): lambda qa, qb: LAM * W**1.5 * qa**2 * qb,
}

def propagate(prims, jobname, nstep=3, dt=0.001, rd=None, grid_init=False):
    pot = construct_nMR_recursive(prims, nMR=2, func=funcs,
                                  rate=0.99999999999)
    kin = construct_kinetic_mpo(prims)
    model = Model(prims, {"potential": pot, "kinetic": kin}, bond_dim=4)
    ng = prims[0].ngrid
    if grid_init:
        # grid-sampled Hartree product (uniform-weight Sine DVR):
        # mode 0 = φ₁ (or a coherent state displaced by `disp`), rest φ₀
        disp = grid_init if grid_init is not True else None
        hp = []
        for k, p in enumerate(prims):
            x = np.asarray(p.get_grids())
            if k == 0 and disp is not None:
                v = np.exp(-W * (x - disp) ** 2 / 2)
            elif k == 0:
                v = x * np.exp(-W * x**2 / 2)
            else:
                v = np.exp(-W * x**2 / 2)
            hp.append(list(v / np.linalg.norm(v)))
        model.init_HartreeProduct = [hp]
    else:
        gs = [1.0] + [0.0] * (ng - 1)
        es = [0.0, 1.0] + [0.0] * (ng - 2)
        model.init_weight_VIBSTATE = [[es, gs]]
    sim = Simulator(jobname=jobname, model=model, verbose=0)
    return sim.propagate(maxstep=nstep, stepsize=dt, reduced_density=rd)
"""),
    ("md", """
## HO-DVR vs Sine-DVR

The HO-DVR grid (5 Gauss–Hermite points) reproduces the reference CI
literal; the box-grid Sine-DVR converges to the same physics with more
points (the grids are plotted below).
"""),
    ("code", """
e_ho, _ = propagate([HarmonicOscillator(NGRID, 2000.0) for _ in range(F)],
                    "hh_ho")
print(f"HO-DVR   E = {e_ho:.15f}  (reference CI 0.018225341011652626)")
assert abs(e_ho - 0.018225341011652626) < 1e-12

sig = 1.0 / np.sqrt(W)   # ground-state width, mass-weighted a.u.
sine_prims = [Sine(31, length=16 * sig, x0=-8 * sig, units="au",
                   include_terminal=False) for _ in range(F)]
e_sin, _ = propagate(sine_prims, "hh_sine", grid_init=True)
print(f"Sine-DVR E = {e_sin:.15f}  |ΔE| = {abs(e_sin - e_ho):.2e}")
assert abs(e_sin - e_ho) < 5e-5
"""),
    ("code", """
ho = HarmonicOscillator(NGRID, 2000.0)
q = np.linspace(-8 * sig, 8 * sig, 400)
plt.figure(figsize=(7, 3))
plt.plot(q, W**2 / 2 * q**2 - LAM * W**1.5 / 3 * q**3, label="V(0, Q)")
plt.plot(ho.get_grids(), [W**2 / 2 * g**2 - LAM * W**1.5 / 3 * g**3
                          for g in ho.get_grids()],
         "o", ms=8, label="HO-DVR grid (5 pts)")
plt.plot(sine_prims[0].get_grids(),
         [0.0] * 31, "|", ms=12, label="Sine-DVR grid (31 pts)")
plt.xlabel("Q [mass-weighted a.u.]"); plt.ylabel("V [Hartree]")
plt.legend(); plt.title("DVR grids over the Hénon–Heiles cut")
plt.tight_layout(); plt.show()
"""),
    ("md", """
## Time-dependent reduced density ρ(Q₀, t)

The reference's `TD_reduced_density` workflow: start a coherent state
displaced by 1.5σ in mode 0, export the diagonal grid density every
other step to genuine netCDF4 (`reduced_density=([(0,)], 2)` — a 1-tuple
key keeps the diagonal) and render the wavepacket oscillation.
"""),
    ("code", """
from pytdscf_tpu.util import read_nc

e_t, _ = propagate(sine_prims, "hh_dens", nstep=120, dt=0.2,
                   rd=([(0,)], 2), grid_init=1.5 * sig)
rd = read_nc("hh_dens_prop/reduced_density.nc", [(0,)])
dens = np.real(rd[(0,)])          # (steps, ngrid)
t = np.asarray(rd["time"])        # fs
plt.figure(figsize=(7, 3.2))
plt.pcolormesh(t, sine_prims[0].get_grids(), dens.T, cmap=SEQ_CMAP,
               shading="auto")
plt.colorbar(label=r"$\\rho(Q_0)$")
plt.xlabel("time [fs]"); plt.ylabel("$Q_0$ [a.u.]")
plt.title("mode-0 density: coherent-state oscillation "
          f"(period {2 * np.pi / W * units.au_in_fs:.1f} fs)")
plt.tight_layout(); plt.show()
print(f"density rows: {dens.shape}, norm of last row: {dens[-1].sum():.6f}")
"""),
]

GRIDPES = [
    ("md", """
# PES on a grid: DVR mesh → parallel evaluation → database → nMR MPO

Counterpart of the reference's `grid-based-MPO-H2CO` +
`electronic-structure-calculation` notebooks.  The pipeline:

1. `DVR_Mesh.save_geoms` enumerates the nMR product grids into SQLite;
2. `execute_multiproc` dispatches an electronic-structure callable over a
   process pool (timeout/retry/judge hooks — here an analytic anharmonic
   surface stands in for the ab initio code);
3. `database_to_dataframe` → `construct_nMR_recursive(db=...)` performs
   the inclusion–exclusion nMR separation and compresses the grid MPO;
4. the same model propagates identically to the analytic-function route.
"""),
    ("code", PREAMBLE + """
from pytdscf_tpu import units
from pytdscf_tpu.ase_handler import DVR_Mesh
from pytdscf_tpu.basis import HarmonicOscillator
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.dvr import (
    construct_kinetic_mpo,
    construct_nMR_recursive,
    database_to_dataframe,
)
from pytdscf_tpu.simulator import Simulator

W1 = 1500.0 / units.au_in_cm1
W2 = 3000.0 / units.au_in_cm1
CUB = 1.0e-06

def potential(q):
    q1, q2 = q
    return (W1**2 / 2 * q1**2 + W2**2 / 2 * q2**2
            + CUB * (q1**3 + q1 * q2**2 + q1**2 * q2))
"""),
    ("md", """
## 1–2. Mesh out, "compute", store

7×7 2-mode product mesh (1-mode cuts share the reference point, so 49
rows total).  `execute_multiproc` fills the SQLite table in parallel.
"""),
    ("code", """
prims = [HarmonicOscillator(7, 1500.0), HarmonicOscillator(7, 3000.0)]
db = "pes.db"
mesh = DVR_Mesh(prims)
print("grid points saved:", mesh.save_geoms(db, nMR=2))
print("evaluated:", mesh.execute_multiproc(potential, db, max_workers=2,
                                           timeout=60))
df = database_to_dataframe(db)
df.head(4)
"""),
    ("code", """
g1, g2 = prims[0].get_grids(), prims[1].get_grids()
V = np.array([[potential((a, b)) for b in g2] for a in g1])
plt.figure(figsize=(5.2, 4))
plt.pcolormesh(g2, g1, V * units.au_in_cm1, cmap=SEQ_CMAP, shading="auto")
plt.colorbar(label="V [cm$^{-1}$]")
plt.xlabel("$Q_2$ [a.u.]"); plt.ylabel("$Q_1$ [a.u.]")
plt.title("database PES over the 2-mode product mesh")
plt.tight_layout(); plt.show()
"""),
    ("md", """
## 3–4. nMR MPO from the database, then dynamics

`construct_nMR_recursive(db=...)` reads raw grid *totals* and separates
them into 1- and 2-mode clusters by inclusion–exclusion; the analytic
`func=` route is the cross-check.  Both give the same propagated energy.
"""),
    ("code", """
pot_db = construct_nMR_recursive(prims, nMR=2, db=db)
funcs = {
    (0,): lambda q1: W1**2 / 2 * q1**2 + CUB * q1**3,
    (1,): lambda q2: W2**2 / 2 * q2**2,
    (0, 1): lambda q1, q2: CUB * (q1 * q2**2 + q1**2 * q2),
}
pot_func = construct_nMR_recursive(prims, nMR=2, func=funcs)
kin = construct_kinetic_mpo(prims)

def run(pot, jobname):
    model = Model(prims, {"potential": pot, "kinetic": kin}, bond_dim=4)
    gs = [1.0] + [0.0] * 6
    es = [0.0, 1.0] + [0.0] * 5
    model.init_weight_VIBSTATE = [[es, gs]]
    e, _ = Simulator(jobname=jobname, model=model,
                     verbose=0).propagate(maxstep=2, stepsize=0.1)
    return e

e_db, e_func = run(pot_db, "pes_db"), run(pot_func, "pes_func")
print(f"E(db route)   = {e_db:.12f}")
print(f"E(func route) = {e_func:.12f}   |Δ| = {abs(e_db - e_func):.2e}")
assert abs(e_db - e_func) < 1e-10
"""),
]

PYRAZINE = [
    ("md", """
# Pyrazine S₂ photodynamics — 24-mode quadratic vibronic coupling

Counterpart of the reference's `pyrazine-qvc` notebook (and the
`TD_reduced_density_exciton` workflow): the 2-state × 24-mode QVC model
of Raab et al., JCP 110, 936 (1999).  Site 0 is the electronic (S₁, S₂)
site; the S₂ ⊗ vacuum wavepacket decays through the conical intersection.

The full-size model is dense-parity tested on its 4-mode reduction
(`tests/test_pyrazine.py`); production runs
(`examples/pyrazine_s2_dynamics.py`) use nprim=10, χ=20, 1500 steps —
this notebook runs a shortened, coarser version so it executes in
minutes on CPU.
"""),
    ("code", PREAMBLE + """
from pytdscf_tpu import Model, Simulator, spectra, units
from pytdscf_tpu.models.pyrazine import pyrazine_qvc, OMEGA_EV
from pytdscf_tpu.util import read_nc

NPRIM, BOND, NSTEP, DT_FS = 8, 12, 120, 0.25
basis, ham = pyrazine_qvc(nprim=NPRIM)
model = Model(basis, {"hamiltonian": ham}, bond_dim=BOND)
model.init_HartreeProduct = [
    [[0.0, 1.0]] + [[1.0] + [0.0] * (NPRIM - 1)] * (len(basis) - 1)
]
print(f"{len(basis)} sites (1 electronic + {len(basis)-1} modes)")
"""),
    ("code", """
sim = Simulator("pyrazine", model, verbose=0)
e, _ = sim.propagate(
    maxstep=NSTEP, stepsize=DT_FS,
    reduced_density=([(0, 0)], 4), autocorr=True,
)
print(f"<H> = {e:.8f} Eh")
"""),
    ("md", """
## Electronic populations through the conical intersection

The S₂ population transfers to S₁ within ~20 fs — the hallmark of this
model.
"""),
    ("code", """
rd = read_nc("pyrazine_prop/reduced_density.nc", [(0, 0)])
rho = np.asarray(rd[(0, 0)])
t = np.asarray(rd["time"])
plt.figure(figsize=(7, 3))
plt.plot(t, rho[:, 0, 0].real, label="S$_1$")
plt.plot(t, rho[:, 1, 1].real, label="S$_2$")
plt.xlabel("time [fs]"); plt.ylabel("population"); plt.legend()
plt.title("pyrazine S$_2$ → S$_1$ internal conversion (24 modes)")
plt.tight_layout(); plt.show()
print("populations at t =", round(float(t[-1]), 1), "fs:",
      np.round([rho[-1, 0, 0].real, rho[-1, 1, 1].real], 4))
assert rho[-1, 1, 1].real < 0.6   # S2 has decayed substantially
"""),
    ("md", """
## UV absorption band

Damped FFT of ⟨ψ(0)|ψ(t)⟩, shifted so the band lands on the experimental
S₂ origin window (the notebook's E₀ convention).
"""),
    ("code", """
time, auto = spectra.load_autocorr("pyrazine_prop/autocorr.dat")
damp = np.exp(-np.abs(time) / 30.0)
e0_ev = 0.5 * sum(OMEGA_EV) - (3.94 + 4.89) / 2.0
freq, inten = spectra.ifft_autocorr(time, auto * damp, E_shift=e0_ev,
                                    window="cos")
mask = freq > 0
nm, band = 1.0e7 / freq[mask], inten[mask]
sel = (nm > 200) & (nm < 300)
plt.figure(figsize=(7, 3))
plt.plot(nm[sel], band[sel] / band[sel].max())
plt.xlabel("wavelength [nm]"); plt.ylabel("absorption [arb.]")
plt.title("pyrazine UV band (short-time, coarse-basis estimate)")
plt.tight_layout(); plt.show()
print(f"band maximum: {nm[sel][np.argmax(band[sel])]:.0f} nm")
"""),
]

DONOR = [
    ("md", """
# Donor–acceptor exciton dissociation (LE/CS + discretised bath)

Counterpart of the reference's `donor-acceptor` notebook — model A of
Dorfner et al., JCTC 20, 8767 (2024): a 2-level electronic site
(|LE⟩, |CS⟩) coupled to an intermolecular mode R and a chain of
effective bath modes.  Production scale is 99 bath modes × 28 Fock
levels (`examples/donor_acceptor_relaxation.py`,
`examples/donor_acceptor_model_b.py` for model B); this notebook runs a
12-bath-mode reduction so it executes in minutes on CPU.
"""),
    ("code", PREAMBLE + """
from pytdscf_tpu import Model, Simulator
from pytdscf_tpu.models.donor_acceptor import (
    donor_acceptor, mode_number_operators,
)
from pytdscf_tpu.util import read_nc

N_BATH, NFOCK, BOND, NSTEP, DT_FS = 12, 6, 10, 100, 0.5
basis, ham = donor_acceptor(n_bath=N_BATH, nfock=NFOCK)
ops = {"hamiltonian": ham}
ops.update(mode_number_operators(basis))   # per-mode <N_i> observables
model = Model(basis, ops, bond_dim=BOND)
vac = [1.0] + [0.0] * (NFOCK - 1)
model.init_HartreeProduct = [[[1.0, 0.0]] + [vac] * (len(basis) - 1)]
print(f"{len(basis)} sites: electronic + R + {N_BATH} bath modes")
"""),
    ("code", """
sim = Simulator("donor_acceptor", model, verbose=0)
e, _ = sim.propagate(
    maxstep=NSTEP, stepsize=DT_FS,
    reduced_density=([(0, 0)], 4),
    observables=True, observables_per_step=4, autocorr=False,
)
print(f"<H> = {e:.8f} Eh")
"""),
    ("md", """
## LE → CS population transfer
"""),
    ("code", """
rd = read_nc("donor_acceptor_prop/reduced_density.nc", [(0, 0)])
rho = np.asarray(rd[(0, 0)])
t = np.asarray(rd["time"])
plt.figure(figsize=(7, 3))
plt.plot(t, rho[:, 0, 0].real, label="LE")
plt.plot(t, rho[:, 1, 1].real, label="CS")
plt.xlabel("time [fs]"); plt.ylabel("population"); plt.legend()
plt.title("exciton dissociation: LE → CS charge transfer")
plt.tight_layout(); plt.show()
print("final populations  LE %.4f  CS %.4f" %
      (rho[-1, 0, 0].real, rho[-1, 1, 1].real))
"""),
    ("md", """
## Vibrational energy flow into the bath

Per-mode occupations ⟨N̂ᵢ⟩ stream to `expectations.dat`
(`observables=True`); the heatmap shows the dissipated quanta spreading
over the bath chain.
"""),
    ("code", """
raw = np.loadtxt("donor_acceptor_prop/expectations.dat", skiprows=1)
with open("donor_acceptor_prop/expectations.dat") as fh:
    names = fh.readline().split()[3:]      # after "# time [unit]"
tt, occ = raw[:, 0], raw[:, 1:]
plt.figure(figsize=(7, 3.2))
plt.pcolormesh(tt, np.arange(1, len(names) + 1), occ.T, cmap=SEQ_CMAP,
               shading="auto")
plt.colorbar(label=r"$\\langle N_i \\rangle$")
plt.xlabel("time [fs]"); plt.ylabel("mode index (1 = R)")
plt.title("vibrational quanta spreading over the bath chain")
plt.tight_layout(); plt.show()
print("total quanta at t_end: %.4f" % occ[-1].sum())
"""),
]


LVC = [
    ("md", """
# LVC vibronic dynamics: nonadiabatic population transfer + coherences

Counterpart of the reference's `LVC` notebook (and the electronic half
of `TD_reduced_density_exciton`): a 2-state × 2-mode linear vibronic
coupling exciton model — displaced harmonic surfaces with a constant
diabatic coupling — propagated from state S₁, tracking per-state
populations, the electronic coherence, and the autocorrelation.

The flagship LVC regression (`tests/test_exciton_propagate.py`) pins the
4-site variant to the reference energy literal 0.010000180312707298 Eh.
"""),
    ("code", PREAMBLE + """
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import PolynomialHamiltonian
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util.helper_input import matJ_1D_exciton
from pytdscf_tpu.util import read_nc

freqs = [763.31, 1556.64]           # cm-1
disps = [0.317, 0.429]              # dimensionless displacements
s0 = [PrimBas_HO(0.0, f, 6) for f in freqs]
s1 = [PrimBas_HO(d, f, 6) for f, d in zip(freqs, disps)]
prim, _, _, matJ = matJ_1D_exciton(2, 6, s0, s1, 2.0e-03)
basinfo = BasInfo(prim)
ham = PolynomialHamiltonian(basinfo.get_ndof(), basinfo.get_nstate())
ham.coupleJ = matJ                  # diabatic coupling J = 2e-3 Eh
ham.set_HO_potential(basinfo)       # displaced HO surfaces per state
model = Model(basinfo, {"hamiltonian": ham}, bond_dim=8)
model.init_weight_ESTATE = [1.0, 0.0]
print("2 states x", basinfo.get_ndof(), "modes, J =", matJ[0][1])
"""),
    ("code", """
sim = Simulator("lvc", model, verbose=0)
e, wf = sim.propagate(maxstep=300, stepsize=0.2, autocorr=True,
                      populations=True, energy=True)
print(f"<H> = {e:.10f} Eh")
"""),
    ("md", """
## Populations and electronic coherence

`populations.dat` streams per-state weights; the engine's in-memory
state-pair overlap gives the coherence |⟨ψ₀|ψ₁⟩|.
"""),
    ("code", """
pops = np.loadtxt("lvc_prop/populations.dat", skiprows=1)
plt.figure(figsize=(7, 3))
plt.plot(pops[:, 0], pops[:, 1], label="S$_1$ (initial)")
plt.plot(pops[:, 0], pops[:, 2], label="S$_2$")
plt.xlabel("time [fs]"); plt.ylabel("population"); plt.legend()
plt.title("LVC nonadiabatic population transfer")
plt.tight_layout(); plt.show()
print("populations at t_end:", np.round(pops[-1, 1:], 4),
      " sum:", round(pops[-1, 1:].sum(), 8))
"""),
    ("code", """
from pytdscf_tpu import spectra
t, ac = spectra.load_autocorr("lvc_prop/autocorr.dat")
plt.figure(figsize=(7, 2.6))
plt.plot(t, np.abs(ac))
plt.xlabel("time [fs]"); plt.ylabel("|⟨ψ(0)|ψ(t)⟩| (T/2 trick)")
plt.title("autocorrelation")
plt.tight_layout(); plt.show()
print(f"|a| range: {np.abs(ac).min():.4f} – {np.abs(ac).max():.4f}")
"""),
]


HYBRID = [
    ("md", """
# MPS-MCTDH hybrid: tensor-train over contracted SPF bases

Counterpart of the reference's MPS-MCTDH workflow (its "non-standard
method": MPS site dimensions = `nspf` with a time-dependent SPF layer
below, `/root/reference/pytdscf/_mps_sop.py:111-383`).  Three runs of
the same 3-mode H₂O quartic force field:

1. **plain MPS** over the primitive HO basis (the standard method),
2. **hybrid, full-SPF limit** (`nspf == nprim`): must reproduce run 1
   *exactly* — the square SPF matrices freeze, `(1−P) ≡ 0`,
3. **hybrid, contracted** (`nspf = 4 < nprim = 6`): the production
   regime — smaller site dimensions, SPFs co-moving with the state.

Passing an explicit `spf_info` to `BasInfo` is all that switches the
engine (`is_standard_method` turns False), exactly like the reference.
"""),
    ("code", PREAMBLE + """
import math
from pytdscf_tpu import units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import h2o_k_orig
from pytdscf_tpu.simulator import Simulator

NPRIM, DT, NSTEP = 6, 0.1, 60

def prim_info():
    return [[PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1,
                        NPRIM) for i in (1, 2, 3)]]

def run(jobname, basinfo, bond_dim):
    ham = read_potential_nMR(h2o_k_orig)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=bond_dim)
    e, wf = Simulator(jobname, model, verbose=0).propagate(
        maxstep=NSTEP, stepsize=DT)
    auto = np.loadtxt(f"{jobname}_prop/autocorr.dat", dtype=complex,
                      converters={1: lambda s: complex(s)}, usecols=(1,))
    t = np.loadtxt(f"{jobname}_prop/autocorr.dat", usecols=(0,))
    return e, t, auto
"""),
    ("code", """
e_mps, t, auto_mps = run("h2o_plain", BasInfo(prim_info()), 8)

bas_full = BasInfo(prim_info(), [[NPRIM] * 3])   # nspf == nprim
print("standard method?", bas_full.is_standard_method)
e_full, _, auto_full = run("h2o_hyb_full", bas_full, 8)

bas_con = BasInfo(prim_info(), [[4, 4, 4]])      # contracted SPF layer
e_con, _, auto_con = run("h2o_hyb_con", bas_con, 4)

print(f"plain MPS        <H> = {e_mps:.12f} Eh")
print(f"hybrid full-SPF  <H> = {e_full:.12f} Eh   (Δ = {abs(e_full-e_mps):.2e})")
print(f"hybrid nspf=4    <H> = {e_con:.12f} Eh   (Δ = {abs(e_con-e_mps):.2e})")
assert abs(e_full - e_mps) < 1e-10
"""),
    ("md", """
## Autocorrelation: exact full-SPF identity, tight contracted tracking

The full-SPF hybrid curve sits bit-on-top of the plain MPS; the
contracted hybrid tracks it at the SPF-contraction error (~1e-4 here)
with sites of dimension 4 instead of 6.
"""),
    ("code", """
plt.figure(figsize=(7, 3))
plt.plot(t, np.abs(auto_mps), label="plain MPS (nprim=6)")
plt.plot(t, np.abs(auto_full), "--", label="hybrid, full SPF limit")
plt.plot(t, np.abs(auto_con), ":", label="hybrid, nspf=4")
plt.xlabel("time [fs]"); plt.ylabel("|⟨Ψ*|Ψ⟩|"); plt.legend()
plt.title("MPS-MCTDH hybrid vs plain MPS")
plt.tight_layout(); plt.show()
print("full-SPF max dev:", np.abs(auto_full - auto_mps).max())
print("contracted max dev:", np.abs(auto_con - auto_mps).max())
"""),
    ("md", """
## Hybrid → MCTDH conversion

`MPSMCTDHEngine.to_mctdh()` is the reference's `trans_mps2fci`
(`_helper.py:165-188`): the tensor train is contracted to a full CI
tensor over the SPF bases, giving a genuine MCTDH wavefunction.
"""),
    ("code", """
ham = read_potential_nMR(h2o_k_orig)
model = Model(bas_con, {"hamiltonian": ham}, bond_dim=4)
sim = Simulator("h2o_conv", model, verbose=0)
e_hyb, wf = sim.propagate(maxstep=5, stepsize=DT)
mctdh = wf.engine.to_mctdh()
print("CI tensor shape:", np.asarray(mctdh.cis[0]).shape)
e_mctdh = complex(mctdh.expectation()).real
print(f"hybrid <H> = {e_hyb:.12f}, converted MCTDH <H> = {e_mctdh:.12f}")
assert abs(e_hyb - e_mctdh) < 1e-8
"""),
]


ADAPTIVE = [
    ("md", """
# Adaptive bond dimension (a1TDVP) walkthrough

Counterpart of the reference's adaptive-rank workflow: 1-site TDVP with
subspace enrichment grows the bond dimension only where the state needs
it (projection error `p_proj` opens channels, SVD weight `p_svd` closes
them), capped at `adaptive_Dmax`.  On TPU the same algorithm runs in the
**masked** fixed-buffer form (`adaptive_masked=True`): bonds padded to
static caps with live rank carried as exact-zero channels — no host
syncs or shape retraces inside the sweep.

Model: the 2-state LVC exciton dimer at STRONG diabatic coupling
(J = 5e-2 Eh) — population transfer entangles the chain and the rank
must grow.
"""),
    ("code", PREAMBLE + """
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import PolynomialHamiltonian
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util.helper_input import matJ_1D_exciton

def build_model(bond_dim):
    freqs = [763.31, 1556.64]
    disps = [0.317, 0.429]
    s0 = [PrimBas_HO(0.0, f, 6) for f in freqs]
    s1 = [PrimBas_HO(d, f, 6) for f, d in zip(freqs, disps)]
    prim, _, _, matJ = matJ_1D_exciton(2, 6, s0, s1, 5.0e-02)
    basinfo = BasInfo(prim)
    ham = PolynomialHamiltonian(basinfo.get_ndof(), basinfo.get_nstate())
    ham.coupleJ = matJ
    ham.set_HO_potential(basinfo)
    model = Model(basinfo, {"hamiltonian": ham}, bond_dim=bond_dim)
    model.init_weight_ESTATE = [1.0, 0.0]
    return model
"""),
    ("code", """
# adaptive run: start from rank 1 (a Hartree product), grow on demand.
# adaptive_masked = the TPU-native fixed-buffer form: bonds padded to
# static caps, live rank carried as exact-zero channels — ONE compiled
# program for the whole run (the variable-shape form retraces per rank
# step; bonddim.dat streams automatically either way)
e_ad, wf_ad = Simulator("lvc_ad", build_model(1), verbose=0).propagate(
    maxstep=150, stepsize=0.2,
    adaptive=True, adaptive_masked=True, adaptive_Dmax=12, adaptive_dD=3,
    adaptive_p_proj=1e-6, adaptive_p_svd=1e-8,
)
# fixed-rank reference at the adaptive cap
e_fx, wf_fx = Simulator("lvc_fx", build_model(12), verbose=0).propagate(
    maxstep=150, stepsize=0.2,
)
print(f"adaptive <H> = {e_ad:.10f} Eh, fixed-D=12 <H> = {e_fx:.10f} Eh")
print("adaptive final bond dims:", wf_ad.bonddim())
"""),
    ("md", """
## Rank growth follows the entanglement

`bonddim.dat` streams the live per-bond ranks each step: the adaptive
run starts at rank 1 and opens channels as the wavepacket entangles,
saturating at (or below) the fixed cap — the sweep only ever pays for
the rank it uses.
"""),
    ("code", """
def max_rank(path):
    rows = []
    with open(path) as fh:
        next(fh)
        for line in fh:
            parts = line.split()
            rows.append((float(parts[0]),
                         max(int(x) for x in parts[1:])))
    return np.asarray(rows)

bd_ad = max_rank("lvc_ad_prop/bonddim.dat")
plt.figure(figsize=(7, 3))
plt.step(bd_ad[:, 0], bd_ad[:, 1], where="post", label="adaptive (a1TDVP)")
plt.axhline(12, ls="--", color=PALETTE[1], label="fixed reference D=12")
plt.xlabel("time [fs]"); plt.ylabel("max bond dimension"); plt.legend()
plt.title("adaptive rank growth"); plt.tight_layout(); plt.show()
print("adaptive final max rank:", int(bd_ad[-1, 1]))
"""),
    ("code", """
p_ad = np.loadtxt("lvc_ad_prop/populations.dat", skiprows=1)
p_fx = np.loadtxt("lvc_fx_prop/populations.dat", skiprows=1)
plt.figure(figsize=(7, 3))
plt.plot(p_ad[:, 0], p_ad[:, 1], label="S$_1$ adaptive")
plt.plot(p_fx[:, 0], p_fx[:, 1], "--", label="S$_1$ fixed D=12")
plt.plot(p_ad[:, 0], p_ad[:, 2], label="S$_2$ adaptive")
plt.plot(p_fx[:, 0], p_fx[:, 2], "--", label="S$_2$ fixed D=12")
plt.xlabel("time [fs]"); plt.ylabel("population"); plt.legend(ncol=2)
plt.title("adaptive tracks the converged fixed-rank run")
plt.tight_layout(); plt.show()
n = min(len(p_ad), len(p_fx))
print("max |Δpop|:", np.abs(p_ad[:n, 1:] - p_fx[:n, 1:]).max())
"""),
]


BUTADIENE = [
    ("md", """
# trans-Butadiene IR spectrum: a full relax → operate → propagate chain

The polyene workflow the reference documents across its
`poly-MPO-*` notebook series, on the bundled 14-active-mode local-mode
quartic PES + dipole surface of C₄H₆
(`/root/reference/pytdscf/potentials/c4h6_local_potential.py`).  Three
chained `Simulator` jobs share restart files:

1. `relax(improved=True)` — imaginary-time + CI diagonalisation to the
   vibrational ground state (writes `wf_c4h6_gs.pkl`),
2. `operate` — variational fit of μ·E |0⟩ (reads `_gs`, writes
   `_operate`),
3. `propagate` — real-time dynamics of the dipole-excited state; the
   T/2-trick autocorrelation FFTs into the IR spectrum.

Scale the same cells up with the bundled c6h8 … c14h16 tables.
"""),
    ("code", PREAMBLE + """
import math
from pytdscf_tpu import spectra, units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import load
from pytdscf_tpu.simulator import Simulator

k_orig = load("c4h6_local_potential")["k_orig"]
mu = load("c4h6_local_dipole")["mu"]
modes = sorted({i for key in k_orig for i in key})
print(f"C4H6 local-mode surface: {len(modes)} active modes")

prim = [[PrimBas_HO(0.0, math.sqrt(k_orig[(m, m)]) * units.au_in_cm1, 6)
         for m in modes]]
basinfo = BasInfo(prim)
model = Model(basinfo, {"hamiltonian": read_potential_nMR(k_orig)},
              bond_dim=12)
"""),
    ("code", """
e_gs, _ = Simulator("c4h6", model, verbose=0).relax(
    maxstep=8, stepsize=0.1, improved=True)
print(f"E_gs = {e_gs:.10f} Eh  (ZPE {e_gs * units.au_in_cm1:.1f} cm-1)")
"""),
    ("code", """
mu_ham = read_potential_nMR(None, dipole_emu=mu, efield=(1e-2, 1e-2, 1e-2),
                            active_modes=modes)
model_mu = Model(basinfo, {"hamiltonian": mu_ham}, bond_dim=12)
norm, _ = Simulator("c4h6", model_mu, verbose=0).operate(
    maxstep=10, restart=True, loadfile_ext="_gs")
print(f"|mu E |0>| = {norm:.8f}")
"""),
    ("code", """
Simulator("c4h6", model, verbose=0).propagate(
    maxstep=400, stepsize=0.2, restart=True, loadfile_ext="_operate")
t_fs, ac = spectra.load_autocorr("c4h6_prop/autocorr.dat")
print(f"{len(t_fs)} autocorr samples to {t_fs[-1]:.0f} fs")
"""),
    ("md", """
## IR spectrum

FFT of the (cos²-windowed, resampled) autocorrelation, shifted by the
ground-state energy — C-H stretch lines land near 3000 cm⁻¹, the C=C
stretch near 1700 cm⁻¹, CH₂ scissors near 1450 cm⁻¹.
"""),
    ("code", """
freq, inten = spectra.ifft_autocorr(t_fs, ac, E_shift=e_gs * units.au_in_eV)
spectra.export_spectrum(freq, inten, "c4h6_spectrum.dat")
sel = (freq > 600) & (freq < 3600)
plt.figure(figsize=(7.5, 3))
plt.plot(freq[sel], inten[sel] / inten[sel].max())
plt.xlabel("wavenumber [cm$^{-1}$]"); plt.ylabel("intensity [arb]")
plt.title("trans-butadiene IR (14 local modes, D=12)")
plt.tight_layout(); plt.show()
top = np.argsort(inten[sel])[-5:]
print("strongest lines [cm-1]:", np.sort(freq[sel][top]).round(1))
"""),
]


SSE = [
    ("md", """
# Radical-pair SSE ensembles: batched wavefunction trajectories

Counterpart of the reference's `radicalpair-sse.ipynb`: instead of the
full Liouville-space MPDO, the open system is unravelled into Hilbert-
space trajectories of the non-Hermitian H_eff (Zeeman + hyperfine +
exchange + dipolar − (i/2)·Haberkorn), with the nuclear mixed state
reconstructed by averaging over SU(2) spin-coherent initial states on a
Sobol sequence (JCP 154, 084121 (2021)).

Where the reference loops one full simulator run per trajectory, the
TPU-native route advances the ENTIRE ensemble in one scan-compiled
`shard_map` program (`parallel.batched.batched_sse_propagate`):
trajectories ride a vmap batch axis through the MXU within each device
and a `dp` mesh axis across devices; the per-step electron RDM is
psum-summed in-mesh.  Chip-measured: 9.15×/9.8× vs the serial loop at
64/256 trajectories (BASELINE.md).
"""),
    ("code", PREAMBLE + """
import jax.numpy as jnp
from scipy.stats import qmc
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.radical_pair import (
    radical_pair_hamiltonian, spin_coherent_weights)
from pytdscf_tpu.mps.lattice import alloc_hartree_product
from pytdscf_tpu.parallel import batched_sse_propagate, make_mesh

NTRAJ, NSTEP, DT_NS, D = 16, 60, 0.5, 16
hfc = [0.2, 0.35]
basis, mpo, ele_site = radical_pair_hamiltonian(
    hfcs_1=[(2, a) for a in hfc], hfcs_2=[(2, a) for a in hfc])
phys = [b.nstate for b in basis]
print(len(basis), "sites, electron-pair site at", ele_site,
      "dims", phys)
"""),
    ("code", """
SINGLET = np.array([0.0, 1 / np.sqrt(2), -1 / np.sqrt(2), 0.0])
samples = qmc.Sobol(d=2 * len(hfc) * 2, scramble=True, seed=7).random(NTRAJ)

def hartree_products():
    out = []
    for u in samples:
        hp, k = [], 0
        for s, b in enumerate(basis):
            if s == ele_site:
                hp.append(SINGLET)
            else:
                hp.append(spin_coherent_weights(
                    b.nstate, u[2 * k], u[2 * k + 1]))
                k += 1
        out.append(hp)
    return out

model = Model(basis, {"hamiltonian": mpo}, bond_dim=D)
fused = model.hamiltonian.fused_mpo(phys)[0][0]
Ws = tuple(jnp.asarray(w, jnp.complex128) for w in fused)
percore = [alloc_hartree_product(phys, D, hp) for hp in hartree_products()]
bcores = tuple(
    jnp.asarray(np.stack([t[p] for t in percore]), jnp.complex128)
    for p in range(len(phys)))
"""),
    ("md", """
## One dispatch for the whole ensemble

`batched_sse_propagate` scan-compiles `NSTEP` Arnoldi-TDVP steps for all
`NTRAJ` trajectories, dp-sharded over every available device (8 virtual
CPU devices here; identical code on a TPU mesh).  Norms decay under the
Haberkorn CAP — survival is physics, not error.
"""),
    ("code", """
import jax
ndev = len(jax.devices())
ndp = max(d for d in range(1, ndev + 1) if NTRAJ % d == 0)
mesh = make_mesh({"dp": ndp})
print(f"{NTRAJ} trajectories over {ndp} devices")
_, rdms = batched_sse_propagate(
    mesh, bcores, Ws, -0.5j * DT_NS, NSTEP - 1, ele_site)
rho0 = np.outer(SINGLET, SINGLET.conj())[None]
rho_t = np.concatenate([rho0, np.asarray(rdms) / NTRAJ])
print("ensemble RDM trajectory:", rho_t.shape)
"""),
    ("code", """
t_ns = DT_NS * np.arange(NSTEP)
surv = np.real(np.einsum("tij,ij->t", rho_t,
                         np.outer(SINGLET, SINGLET.conj()).T))
trace = np.real(np.einsum("tii->t", rho_t))
plt.figure(figsize=(7, 3))
plt.plot(t_ns, surv, label="singlet ⟨S|ρ_e|S⟩")
plt.plot(t_ns, trace, "--", label="Tr ρ_e (Haberkorn survival)")
plt.xlabel("time [ns]"); plt.ylabel("probability"); plt.legend()
plt.title(f"radical-pair SSE ensemble ({NTRAJ} trajectories)")
plt.tight_layout(); plt.show()
print(f"singlet: {surv[0]:.4f} -> {surv[-1]:.4f}; "
      f"survival {trace[-1]:.4f}")
assert trace[0] > trace[-1] > 0.2
"""),
]


POLY_SOP = [
    ("md", """
# The polynomial-SOP input route: H₂O relax → operate → propagate

Counterpart of the reference's `poly-SOP-H2O-{relax,operate,propagate}`
notebook trio (`/root/reference/docs/notebook/`): the Hamiltonian enters
as a **sum-of-products polynomial** (`PolynomialHamiltonian` from
`read_potential_nMR`) rather than a pre-built MPO.  In this package the
SOP is compiled ONCE into a single fused MPO per electronic-state pair
(`operators/sop.py:fused_mpo`) — the runtime engine never loops over
terms — so the SOP route and the MPO route share the same hot path.

This walkthrough inspects the term structure that the reference prints
(`hamiltonian.onesite` / `hamiltonian.general`), shows the compiled MPO
bond widths, and runs the full relax → operate(μ) → propagate chain.
The companion `h2o_ir_spectrum` notebook takes the same model through
the IR-spectrum FFT.
"""),
    ("code", PREAMBLE + """
import math
from pytdscf_tpu import units
from pytdscf_tpu.basis import PrimBas_HO
from pytdscf_tpu.model import BasInfo, Model
from pytdscf_tpu.operators.sop import read_potential_nMR
from pytdscf_tpu.potentials import h2o_k_orig, h2o_mu
from pytdscf_tpu.simulator import Simulator
"""),
    ("md", """
## The polynomial as a SOP operator

`read_potential_nMR` splits the nMR force-field dictionary into
**onesite** terms (all operators on one DOF — evaluated as dense
one-site matrices) and **general** product terms, with the same
factorial conventions and `cut_off` filter as the reference
(`hamiltonian_cls.read_potential_nMR`).
"""),
    ("code", """
prim = [[PrimBas_HO(0.0, math.sqrt(h2o_k_orig[(i, i)]) * units.au_in_cm1, 9)
         for i in (1, 2, 3)]]
basinfo = BasInfo(prim)
ham = read_potential_nMR(h2o_k_orig, cut_off=-1.0e-10)
print(f"onesite terms: {len(ham.onesite[0][0])}")
for t in ham.onesite[0][0][:5]:
    print(f"  {t.coef:+.6e} x {t.mode_ops}")
print(f"general product terms: {len(ham.general[0][0])}")
for t in ham.general[0][0][:5]:
    print(f"  {t.coef:+.6e} x {t.mode_ops}")
"""),
    ("md", """
## SOP → one fused MPO

The reference dispatches term-by-term at every site update
(`mps_cls` 27-case einsum zoo); here the SOP compiles once into a
balanced dense MPO and the sweep contracts plain (L, W, R) chains.
"""),
    ("code", """
model = Model(basinfo, {"hamiltonian": ham}, bond_dim=9)
fused = model.hamiltonian.fused_mpo([9, 9, 9])[0][0]
print("fused MPO core shapes:", [w.shape for w in fused])
"""),
    ("md", """
## Relax → operate → propagate

Improved relaxation (CI diagonalisation) to the zero-point state, a
variational fit of μ|0⟩, then 100 × 0.2 fs of real-time dynamics.
"""),
    ("code", """
e_gs, _ = Simulator("h2o_sop", model, verbose=0).relax(
    maxstep=10, stepsize=0.1, improved=True
)
print(f"E_gs = {e_gs:.10f} Eh")
"""),
    ("code", """
mu_ham = read_potential_nMR(None, dipole_emu=h2o_mu, efield=(1e-2, 1e-2, 1e-2))
model_mu = Model(basinfo, {"hamiltonian": mu_ham}, bond_dim=9)
norm, _ = Simulator("h2o_sop", model_mu, verbose=0).operate(
    maxstep=10, restart=True, loadfile_ext="_gs"
)
print(f"|mu|0>| = {norm:.8f}")
"""),
    ("code", """
e_prop, _ = Simulator("h2o_sop", model, verbose=0).propagate(
    maxstep=100, stepsize=0.2, restart=True, loadfile_ext="_operate"
)
from pytdscf_tpu import spectra
t_fs, ac = spectra.load_autocorr("h2o_sop_prop/autocorr.dat")
plt.figure(figsize=(7, 3))
plt.plot(t_fs, ac.real, label="Re a(t)")
plt.plot(t_fs, ac.imag, label="Im a(t)")
plt.xlabel("time [fs]"); plt.ylabel("autocorrelation"); plt.legend()
plt.title("H$_2$O: $\\\\langle\\\\psi(0)|\\\\psi(t)\\\\rangle$ after dipole kick")
plt.tight_layout(); plt.show()
print(f"<H> during propagation = {e_prop:.10f} Eh")
"""),
]

TD_RD_EXCITON = [
    ("md", """
# Time-dependent reduced densities with the exciton as an MPS site

Counterpart of the reference's `TD_reduced_density_exciton.ipynb`
(Example 11): the electronic manifold enters the tensor train as its own
**Exciton site** (one longer MPS) instead of separate per-state MPS — so
a single wavefunction carries the vibronic dynamics, and reduced
densities over any site subset stream to netCDF4 during propagation.

Model: 3 HO-DVR modes (1000/2000/3000 cm⁻¹) linearly coupled to a
2-level exciton site — the LVC model whose final energy and site-RDM
literals this package pins against the reference test suite
(`tests/test_exciton_propagate.py`; reference
`tests/test_exiciton_propagate.py`).
"""),
    ("code", PREAMBLE + """
from pytdscf_tpu.basis import Exciton, HarmonicOscillator as HO
from pytdscf_tpu.model import Model
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.units import au_in_cm1, au_in_fs
from pytdscf_tpu.util import read_nc
"""),
    ("md", """
## Hand-built vibronic MPO

The LVC Hamiltonian (diabatic shift `dE`, inter-state coupling `J`,
linear vibronic couplings λ, κ) written directly as a 4-core MPO over
(mode, mode, mode, exciton) — the `TensorOperator` route for operators
that are already low-rank in MPO form.
"""),
    ("code", """
freqs_cm1 = [1000, 2000, 3000]
omega2 = [(f / au_in_cm1) ** 2 for f in freqs_cm1]
nprim = 8
basis = [HO(nprim, f, units="cm-1") for f in freqs_cm1] + [
    Exciton(nstate=2, names=["S0", "S1"])
]
dE, J, lamb, kappa = 0.01, 0.001, 0.0001, 0.0001
q1 = [np.array(ho.get_grids()) for ho in basis[:3]]
q2 = [q * q for q in q1]
one = [np.ones_like(q) for q in q1]
a = basis[3].get_annihilation_matrix()
a_dag = basis[3].get_creation_matrix()

W0 = np.zeros((1, nprim, 3), dtype=np.complex128)
W1 = np.zeros((3, nprim, 4), dtype=np.complex128)
W2 = np.zeros((4, nprim, 3), dtype=np.complex128)
W3 = np.zeros((3, 2, 2, 1), dtype=np.complex128)
W0[0, :, 0] = one[0]; W0[0, :, 1] = q1[0]
W0[0, :, 2] = omega2[0] / 2 * q2[0]
W1[0, :, 0] = J * one[1] + lamb * q1[1]; W1[0, :, 1] = one[1]
W1[0, :, 2] = kappa * q1[1] + omega2[1] ** 2 / 2 * q2[1]
W1[0, :, 3] = omega2[1] / 2 * q2[1]
W1[1, :, 0] = lamb * one[1]; W1[1, :, 2] = kappa * one[1]
W1[2, :, 2] = one[1]; W1[2, :, 3] = one[1]
W2[0, :, 2] = one[2]
W2[1, :, 0] = dE * one[2] + kappa * q1[2] + omega2[2] / 2 * q2[2]
W2[1, :, 1] = omega2[2] / 2 * q2[2]
W2[1, :, 2] = lamb * q1[2]
W2[2, :, 0] = one[2]
W2[3, :, 1] = one[2]
W3[0, :, :, 0] = a_dag @ a
W3[1, :, :, 0] = a @ a_dag
W3[2, :, :, 0] = a_dag + a
potential = [[{(0, 1, 2, (3, 3)): TensorOperator(
    mpo=[W0, W1, W2, W3], legs=(0, 1, 2, 3, 3))}]]
kin_mpo = []
for idof in range(3):
    d2 = basis[idof].get_2nd_derivative_matrix_dvr() / 2
    if idof == 0:
        core = np.zeros((1, nprim, nprim, 2), dtype=np.complex128)
        core[0, :, :, 0] = d2; core[0, :, :, 1] = np.eye(nprim)
    elif idof == 2:
        core = np.zeros((2, nprim, nprim, 1), dtype=np.complex128)
        core[0, :, :, 0] = np.eye(nprim); core[1, :, :, 0] = d2
    else:
        core = np.zeros((2, nprim, nprim, 2), dtype=np.complex128)
        core[0, :, :, 0] = np.eye(nprim); core[1, :, :, 1] = np.eye(nprim)
        core[0, :, :, 1] = d2
    kin_mpo.append(core)
kinetic = [[{((0, 0), (1, 1), (2, 2)): TensorOperator(
    mpo=kin_mpo, legs=(0, 0, 1, 1, 2, 2))}]]
ham = TensorHamiltonian(ndof=4, potential=potential, kinetic=kinetic,
                        backend="numpy")
"""),
    ("md", """
## Propagate with streaming reduced densities

`reduced_density=([(3, 3), (0, 0)], 1)` asks for the exciton-site RDM
AND the mode-0 DVR density at every step — both land as compound-complex
variables in `*_prop/reduced_density.nc` (the reference's netCDF4 layout,
readable by its tools).
"""),
    ("code", """
model = Model(basis, {"hamiltonian": ham}, bond_dim=4)
model.init_HartreeProduct = [
    [b.get_unitary()[0].tolist() for b in basis[:3]] + [[0.0, 1.0]]
]
ener, _ = Simulator("td_rd_exciton", model, backend="numpy",
                    verbose=0).propagate(
    stepsize=0.2, maxstep=120, reduced_density=([(3, 3), (0, 0)], 1),
)
print(f"<H> = {ener:.12f} Eh")
"""),
    ("code", """
rd = read_nc("td_rd_exciton_prop/reduced_density.nc", [(3, 3), (0, 0)])
rho_e = rd[(3, 3)]
rho_q = rd[(0, 0)]
t_fs = 0.2 * np.arange(rho_e.shape[0])
fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 3.5))
ax1.plot(t_fs, rho_e[:, 1, 1].real, label="S1")
ax1.plot(t_fs, rho_e[:, 0, 0].real, label="S0")
ax1.plot(t_fs, np.abs(rho_e[:, 0, 1]), "--", label="|coherence|")
ax1.set_xlabel("time [fs]"); ax1.set_ylabel("population")
ax1.legend(); ax1.set_title("exciton-site reduced density")
grids = np.array(basis[0].get_grids())
im = ax2.pcolormesh(
    t_fs, grids, np.real(np.einsum("tii->ti", rho_q)).T,
    shading="nearest", cmap="magma",
)
ax2.set_xlabel("time [fs]"); ax2.set_ylabel("$Q_0$ [mwc a.u.]")
ax2.set_title("mode-0 DVR density $\\\\rho(Q_0, t)$")
fig.colorbar(im, ax=ax2)
plt.tight_layout(); plt.show()
print("S1 population:", rho_e[0, 1, 1].real, "->", rho_e[-1, 1, 1].real)
"""),
]

VISUALIZE = [
    ("md", """
# Visualising reduced-density trajectories

Counterpart of the reference's `visualize.ipynb`, which post-processes
`reduced_density.nc` files from the singlet-fission runs, plus its
`anim_density_matrix` animator: run a (small) singlet-fission Holstein
chain, stream the exciton-site reduced density to netCDF4, and render

1. population/coherence time series (the reference's line plots),
2. the annotated phase-coloured Hinton **animation**
   (`util.plotting.ComplexMatrixAnimation` — feature parity with the
   reference's `anim_density_matrix`, plus value annotations).
"""),
    ("code", PREAMBLE + """
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.holstein import singlet_fission_chain
from pytdscf_tpu.simulator import Simulator
from pytdscf_tpu.util import read_nc
from pytdscf_tpu.util.plotting import ComplexMatrixAnimation
"""),
    ("md", """
## A 13-site singlet-fission chain

4 + 8 Holstein bath modes around a 3-level exciton site (S1 / TT / CS
ladder) — the same model family as the 184-site benchmark
(`models/holstein.py`), shrunk to notebook scale.
"""),
    ("code", """
basis, ham = singlet_fission_chain(
    n_left=4, n_right=8, nlevels=4, nexciton=3)
exc = 4
model = Model(basis, {"hamiltonian": ham}, bond_dim=10)
init = []
for s, b in enumerate(basis):
    v = np.zeros(b.nstate); v[0] = 1.0
    if s == exc:
        v[:] = 0.0; v[0] = 1.0
    init.append(v.tolist())
model.init_HartreeProduct = [init]
ener, _ = Simulator("sf_visualize", model, verbose=0).propagate(
    stepsize=0.4, maxstep=100, reduced_density=([(exc, exc)], 2),
)
print(f"<H> = {ener:.8f}")
"""),
    ("code", """
rd = read_nc("sf_visualize_prop/reduced_density.nc", [(exc, exc)])
rho_t = rd[(exc, exc)]
t_fs = 0.4 * 2 * np.arange(rho_t.shape[0])
labels = ["S1", "TT", "CS"]
plt.figure(figsize=(7, 3))
for k, lab in enumerate(labels):
    plt.plot(t_fs, rho_t[:, k, k].real, label=lab)
plt.plot(t_fs, np.abs(rho_t[:, 0, 1]), "--", label="|S1-TT coherence|")
plt.xlabel("time [fs]"); plt.ylabel("population")
plt.legend(); plt.title("exciton-site reduced density (13-site chain)")
plt.tight_layout(); plt.show()
"""),
    ("md", """
## Phase-coloured Hinton animation

Square size = |ρ_ij| (relative to the global max), colour = arg ρ_ij on
a cyclic map, with per-frame timestamps, state labels, and value
annotations.  Saved as a GIF and embedded below.
"""),
    ("code", """
anim = ComplexMatrixAnimation(
    rho_t[::5], times=t_fs[::5], title="exciton RDM",
    row_names=labels, col_names=labels, add_text=True,
)
path = anim.save("sf_rdm.gif", interval_ms=200)
from IPython.display import Image as _Image, display as _display
_display(_Image(filename=path))
print("frames:", rho_t[::5].shape[0])
"""),
]


def main() -> None:
    os.makedirs(OUTDIR, exist_ok=True)
    jobs = [
        ("h2o_ir_spectrum.ipynb", H2O),
        ("radical_pair_liouville.ipynb", RADICAL_PAIR),
        ("parallel_spmd.ipynb", PARALLEL),
        ("henon_heiles_dvr.ipynb", HENON),
        ("grid_pes_database.ipynb", GRIDPES),
        ("pyrazine_qvc.ipynb", PYRAZINE),
        ("donor_acceptor.ipynb", DONOR),
        ("lvc_vibronic.ipynb", LVC),
        ("mps_mctdh_hybrid.ipynb", HYBRID),
        ("adaptive_bond_dimension.ipynb", ADAPTIVE),
        ("butadiene_ir_chain.ipynb", BUTADIENE),
        ("sse_ensemble.ipynb", SSE),
        ("poly_sop_h2o.ipynb", POLY_SOP),
        ("td_reduced_density_exciton.ipynb", TD_RD_EXCITON),
        ("visualize.ipynb", VISUALIZE),
    ]
    only = sys.argv[1:] or None
    if REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
    for name, cells in jobs:
        if only and not any(o in name for o in only):
            continue
        nb = build(cells)
        with tempfile.TemporaryDirectory() as wd:
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
