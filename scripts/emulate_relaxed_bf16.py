"""Emulate TPU 'default' (1-pass bf16) matvec precision on CPU to predict
the relaxed-Krylov population drift on the radical-pair MPDO."""
import os
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from functools import partial

from pytdscf_tpu.mps import kernels as K

# emulate: prec="default" => operands rounded through bfloat16 (one pass)
def bf16_round(x):
    return jax.lax.convert_element_type(
        jax.lax.convert_element_type(x.real.astype(jnp.float32), jnp.bfloat16),
        jnp.float32,
    ) + 1j * jax.lax.convert_element_type(
        jax.lax.convert_element_type(x.imag.astype(jnp.float32), jnp.bfloat16),
        jnp.float32,
    ).astype(jnp.float32)

_orig_heff = K.heff_apply
_orig_keff = K.keff_apply

@partial(jax.jit, static_argnames=("prec",))
def heff_emu(L, W, R, psi, prec="highest"):
    if prec == "default":
        L, W, R, psi = (bf16_round(x).astype(psi.dtype) for x in (L, W, R, psi))
    return jnp.einsum("bak,aijc,xcr,kjr->bix", L, W, R, psi, optimize=True,
                      precision=jax.lax.Precision.HIGHEST)

@partial(jax.jit, static_argnames=("prec",))
def keff_emu(L, R, sig, prec="highest"):
    if prec == "default":
        L, R, sig = (bf16_round(x).astype(sig.dtype) for x in (L, R, sig))
    return jnp.einsum("bak,xar,kr->bx", L, R, sig, optimize=True,
                      precision=jax.lax.Precision.HIGHEST)

K.heff_apply = heff_emu
K.keff_apply = keff_emu
import pytdscf_tpu.mps.tdvp as tdvp
# tdvp imports `kernels as K` module (attribute lookup at call time) — OK.

from pytdscf_tpu.config import Config
from pytdscf_tpu.model import Model
from pytdscf_tpu.models.radical_pair import radical_pair_liouvillian, singlet_product_state
from pytdscf_tpu.mps.lattice import alloc_hartree_product, bond_dims_for_site
from pytdscf_tpu.mps.tdvp import TDVPEngine

chi = int(os.environ.get("EMU_CHI", "48"))
hfc = [0.15, 0.22, 0.29, 0.36]
basis, mpo, ele = radical_pair_liouvillian(
    hfcs_1=[(2, a) for a in hfc], hfcs_2=[(2, a) for a in hfc],
    split_electron=True)
model = Model(basis, {"hamiltonian": mpo}, space="liouville", bond_dim=chi)
phys = [b.nstate for b in basis]
vecs = singlet_product_state(basis, ele, split_electron=True)
cores = alloc_hartree_product(phys, 4, vecs, space="liouville")
rng = np.random.default_rng(42)
full = []
for p, c in enumerate(cores):
    ml, mr = bond_dims_for_site(phys, p, chi)
    fc = np.zeros((ml, phys[p], mr), dtype=complex)
    fc[:c.shape[0], :, :c.shape[2]] = c
    fc += 1e-4 * (rng.normal(size=fc.shape) + 1j * rng.normal(size=fc.shape))
    full.append(fc)

def run(relaxed):
    cfg = Config(jobname=f"emu{relaxed}", space="liouville",
                 integrator="arnoldi", conserve_norm=False,
                 thresh_exp=1e-6, max_krylov=7, dtype="complex128",
                 krylov_relaxed=relaxed, scan_sweep=True)
    eng = TDVPEngine([list(map(np.array, full))], model.hamiltonian, cfg)
    eng.right_canonicalize()
    for _ in range(10):
        eng.propagate(0.5)
    rp = eng.reduced_density_liouville((0,) * ele + (2, 2))
    pops = np.real(np.einsum("aabb->ab", np.asarray(rp)).reshape(-1))
    tr = complex(eng.trace(0))
    return pops, tr

p0, t0 = run(False)
p1, t1 = run(True)
print("exact  pops:", np.round(p0, 8), "trace", f"{t0.real:.8f}")
print("relax  pops:", np.round(p1, 8), "trace", f"{t1.real:.8f}")
print("max|dpop| =", np.max(np.abs(p1 - p0)), " dtrace =", abs(t1 - t0))
