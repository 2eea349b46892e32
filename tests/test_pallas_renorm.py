"""Pallas-fused bf16x3 environment transfers (interpret mode on CPU).

``pallas_renorm`` maps both env renormalisations onto the fused H_eff
chain kernel with permuted operands and hi/lo-split (bf16x3) products —
the accuracy contract of the engine's ``env_precision="high"`` default.
These tests pin the kernel math against the f32-exact einsum; the TPU
wall-clock A/B lives in scripts/TPU_RUNBOOK.md.  Parity target: the
reference's per-term block renormalisation loops
(``/root/reference/pytdscf/_contraction.py``, op_lcr transfers).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pytdscf_tpu.mps import kernels as K
from pytdscf_tpu.mps import pallas_renorm as PR

RNG = np.random.default_rng(11)

# bf16x3 (hi+lo ≈ 16 mantissa bits per operand, f32 accumulation):
# per-product relative error ~2^-17, random-sign accumulation keeps the
# block-level relative error at a few 1e-5.
TOL = 1.0e-4


def _c(*sh):
    return jnp.asarray(
        RNG.normal(size=sh) + 1j * RNG.normal(size=sh), jnp.complex128
    )


@pytest.mark.parametrize("b,k,p,o", [(256, 128, 128, 48), (128, 256, 256, 128)])
def test_renorm_left_pallas_matches_exact(b, k, p, o):
    w, d = 8, 4
    L, W = _c(b, w, k), _c(w, d, d, w)
    a_bra, a_ket = _c(b, d, o), _c(k, d, p)
    assert PR.left_shapes_ok(L, a_bra, W, a_ket)
    exact = K.renorm_block_left(L, a_bra, W, a_ket, "highest")
    got = PR.renorm_left_pallas(L, a_bra, W, a_ket)
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < TOL, rel


@pytest.mark.parametrize("b,k,p,o", [(256, 128, 128, 48), (128, 128, 256, 128)])
def test_renorm_right_pallas_matches_exact(b, k, p, o):
    w, d = 8, 4
    R, W = _c(b, w, k), _c(w, d, d, w)
    b_bra, b_ket = _c(o, d, b), _c(p, d, k)
    assert PR.right_shapes_ok(R, b_bra, W, b_ket)
    exact = K.renorm_block_right(R, b_bra, W, b_ket, "highest")
    got = PR.renorm_right_pallas(R, b_bra, W, b_ket)
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < TOL, rel


def test_small_tiles_both_directions():
    """tk=tx=8 on tiny dims — fast full-layout coverage of both mappings."""
    w, d = 3, 2
    b = k = p = o = 16
    L, W = _c(b, w, k), _c(w, d, d, w)
    a_bra, a_ket = _c(b, d, o), _c(k, d, p)
    exact_l = K.renorm_block_left(L, a_bra, W, a_ket, "highest")
    got_l = PR.renorm_left_pallas(L, a_bra, W, a_ket, tk=8, tx=8)
    rel_l = float(jnp.linalg.norm(got_l - exact_l) / jnp.linalg.norm(exact_l))
    assert rel_l < TOL, rel_l
    b_bra, b_ket = _c(o, d, b), _c(p, d, k)
    exact_r = K.renorm_block_right(L, b_bra, W, b_ket, "highest")
    got_r = PR.renorm_right_pallas(L, b_bra, W, b_ket, tk=8, tx=8)
    rel_r = float(jnp.linalg.norm(got_r - exact_r) / jnp.linalg.norm(exact_r))
    assert rel_r < TOL, rel_r


def test_edge_shapes_fall_back():
    """Non-tile-divisible bonds must be rejected by the gates."""
    w, d = 8, 4
    L, W = _c(24, w, 24), _c(w, d, d, w)
    a_bra, a_ket = _c(24, d, 24), _c(24, d, 24)
    assert not PR.left_shapes_ok(L, a_bra, W, a_ket)
    assert not PR.right_shapes_ok(L, a_bra, W, a_ket)
