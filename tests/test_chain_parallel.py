"""Chain-axis sharded observables vs the serial engine (8 virtual devices).

Mirrors the reference's MPI distributed-observable tests
(``/root/reference/tests/test_mpi.py``): distributed results must equal the
serial contraction bit-for-nearly-bit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytdscf_tpu.basis import Boson
from pytdscf_tpu.mps.lattice import alloc_hartree_product
from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
from pytdscf_tpu.operators.tensor_op import TensorOperator
from pytdscf_tpu.parallel import make_mesh
from pytdscf_tpu.parallel.chain import (
    chain_expectation,
    chain_norm_sq,
    pad_cores,
    pad_mpo,
    segment_boundaries,
)

NSITE = 16
NLEV = 4
D = 6


def _model():
    basis = [Boson(NLEV) for _ in range(NSITE)]
    n_mat = basis[0].get_number_matrix()
    q_mat = basis[0].get_q_matrix()
    pot = {}
    for s in range(NSITE):
        pot[(s, s)] = TensorOperator(
            mpo=[(0.01 * (s + 1) * n_mat)[None, :, :, None]], legs=(s, s)
        )
    for s in range(NSITE - 1):
        key = (s, s, s + 1, s + 1)
        pot[key] = TensorOperator(
            mpo=[
                (0.001 * q_mat)[None, :, :, None],
                q_mat[None, :, :, None],
            ],
            legs=key,
        )
    return basis, TensorHamiltonian(NSITE, [[pot]], kinetic=None)


@pytest.fixture(scope="module")
def setup():
    basis, ham = _model()
    phys = [b.nprim for b in basis]
    rng = np.random.default_rng(7)
    vecs = [
        rng.normal(size=NLEV) + 1j * rng.normal(size=NLEV)
        for _ in range(NSITE)
    ]
    cores = alloc_hartree_product(phys, D, vecs)
    fused = ham.fused_mpo(phys)[0][0]
    return cores, fused


def _serial_norm_exp(cores, fused):
    from pytdscf_tpu.mps import kernels as K

    S = jnp.ones((1, 1), dtype=jnp.complex128)
    for c in cores:
        S = K.ovlp_left_conj(S, jnp.asarray(c), jnp.asarray(c))
    norm_sq = complex(S[0, 0]).real
    blk = jnp.ones((1, 1, 1), dtype=jnp.complex128)
    for c, w in zip(cores[::-1], fused[::-1]):
        blk = K.renorm_block_right(
            blk, jnp.asarray(c), jnp.asarray(w), jnp.asarray(c)
        )
    return norm_sq, complex(blk[0, 0, 0])


def test_chain_norm_and_expectation(setup):
    cores, fused = setup
    norm_ref, e_ref = _serial_norm_exp(cores, fused)

    mesh = make_mesh({"chain": 8})
    stacked = jnp.asarray(pad_cores(cores, D))
    wmax = max(w.shape[0] for w in fused) | 1
    wmax = max(wmax, max(w.shape[-1] for w in fused))
    Wst = jnp.asarray(pad_mpo(fused, wmax))

    n2 = float(chain_norm_sq(mesh, stacked))
    assert n2 == pytest.approx(norm_ref, rel=1e-10)

    ev = complex(chain_expectation(mesh, stacked, Wst))
    assert ev == pytest.approx(e_ref, rel=1e-10)


def test_segment_boundaries_consistency(setup):
    """Boundary environments must contract with local segments to ⟨H⟩."""
    cores, fused = setup
    _, e_ref = _serial_norm_exp(cores, fused)
    mesh = make_mesh({"chain": 8})
    stacked = jnp.asarray(pad_cores(cores, D))
    wmax = max(max(w.shape[0], w.shape[-1]) for w in fused)
    Wst = jnp.asarray(pad_mpo(fused, wmax))
    Lb, Rb = segment_boundaries(mesh, stacked, Wst)
    Lb, Rb = np.asarray(Lb), np.asarray(Rb)
    # device 3's segment: contract Lb[3] · (local sites) · Rb[3]
    seg = slice(3 * 2, 3 * 2 + 2)  # 16 sites over 8 devices → 2 per device
    from pytdscf_tpu.mps import kernels as K

    blk = jnp.asarray(Lb[3])
    for p in range(seg.start, seg.stop):
        c = jnp.asarray(pad_cores(cores, D)[p])
        w = jnp.asarray(pad_mpo(fused, wmax)[p])
        blk = K.renorm_block_left(blk, c, w, c)
    val = complex(jnp.einsum("bak,bak->", blk, jnp.asarray(Rb[3])))
    assert val == pytest.approx(e_ref, rel=1e-10)
