"""MCTDH mode: CI tensor + single-particle-function (SPF) layer.

Functional counterpart of the reference's MCTDH machinery
(``/root/reference/pytdscf/_ci_cls.py`` — full CI tensor with SIL
propagation and mean-field construction; ``_spf_cls.py`` — SPF matrices with
the (1−P)ρ⁻¹⟨H⟩φ EOM, RK45; ``_ode_cls.py`` — RK4 / Dormand–Prince
steppers; ``wavefunction.py:176`` — VMF propagation), redesigned jax-first:
the CI tensor is a dense jax array contracted per-DOF with tensordots (MXU
matmuls), the SIL reuses the on-device Krylov propagator of the MPS engine,
and SPF updates are batched matrix ODEs.

Scope of this implementation: one electronic state, SOP
(:class:`~pytdscf_tpu.operators.sop.PolynomialHamiltonian`) Hamiltonians —
the reference's supported MCTDH surface minus its deprecated multi-state
SPF bookkeeping.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pytdscf_tpu.basis.op_matrix import op_matrix
from pytdscf_tpu.config import Config
from pytdscf_tpu.mps import device_io as dio
from pytdscf_tpu.mps.integrator import krylov_expm
from pytdscf_tpu.operators.sop import PolynomialHamiltonian


# ---------------------------------------------------------------- steppers
def rk4_step(f, y, dt):
    """Classic fixed-step Runge–Kutta 4 (reference ``algorithm_RK4``)."""
    k1 = f(y)
    k2 = f(y + 0.5 * dt * k1)
    k3 = f(y + 0.5 * dt * k2)
    k4 = f(y + dt * k3)
    return y + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


# Dormand–Prince 4(5) tableau
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
_DP_B4 = [
    5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
    -92097 / 339200, 187 / 2100, 1 / 40,
]


def rk45_step(f, y, dt, tol: float = 1.0e-09):
    """One adaptive Dormand–Prince step; returns (y5, err, dt_suggest)."""
    ks = []
    for row in _DP_A:
        yi = y
        for a, k in zip(row, ks):
            yi = yi + dt * a * k
        ks.append(f(yi))
    y5 = y
    y4 = y
    for b5, b4, k in zip(_DP_B5, _DP_B4, ks):
        y5 = y5 + dt * b5 * k
        y4 = y4 + dt * b4 * k
    err = float(jnp.linalg.norm((y5 - y4).ravel()))
    dt_new = dt * min(5.0, max(0.2, 0.9 * (tol / max(err, 1e-300)) ** 0.2))
    return y5, err, dt_new


def ode_propagate(f, y, dt_total, tol: float = 1.0e-09):
    """Integrate over dt_total with error-controlled RK45 substeps."""
    t = 0.0
    dt = dt_total
    while t < dt_total - 1e-15:
        dt = min(dt, dt_total - t)
        y5, err, dt_new = rk45_step(f, y, dt, tol)
        if err <= tol or dt <= 1e-8 * dt_total:
            y = y5
            t += dt
        dt = dt_new
    return y


# ------------------------------------------------------------- SPF layer
class SPFCoef:
    """SPF matrices ``phi[idof]`` of shape (nspf, nprim), orthonormal rows."""

    def __init__(self, phis: list[jnp.ndarray]):
        self.phis = [jnp.asarray(p, jnp.complex128) for p in phis]

    @classmethod
    def init_ground(cls, nspf_list: list[int], nprim_list: list[int]):
        """Lowest-nspf primitive basis vectors as the initial SPFs."""
        phis = []
        for nspf, nprim in zip(nspf_list, nprim_list):
            phis.append(jnp.eye(nspf, nprim, dtype=jnp.complex128))
        return cls(phis)

    def gram_schmidt(self) -> None:
        for k, phi in enumerate(self.phis):
            q, _ = jnp.linalg.qr(phi.T)
            self.phis[k] = q.T

    def ovlp(self, idof: int) -> jnp.ndarray:
        p = self.phis[idof]
        return p.conj() @ p.T


class SPFInts:
    """⟨φ_j|op|φ_l⟩ per DOF for every op key a Hamiltonian uses
    (reference ``_spf_cls.SPFInts``)."""

    def __init__(self, basinfo, spf: SPFCoef, op_keys_per_dof: list[set]):
        self.mats: list[dict[str, jnp.ndarray]] = []
        for idof, keys in enumerate(op_keys_per_dof):
            bas = basinfo.get_primbas(0, idof)
            phi = spf.phis[idof]
            dof_mats = {}
            for key in keys | {"ovlp"}:
                prim = jnp.asarray(op_matrix(bas, bas, key), jnp.complex128)
                dof_mats[key] = phi.conj() @ prim @ phi.T
            self.mats.append(dof_mats)

    def __getitem__(self, idof: int) -> dict[str, jnp.ndarray]:
        return self.mats[idof]


# --------------------------------------------------------------- CI layer
def _apply_term(ci, mode_ops: dict[int, jnp.ndarray]):
    """Apply Π_d (matrix on axis d) to the CI tensor."""
    out = ci
    for d, mat in mode_ops.items():
        out = jnp.tensordot(mat, out, axes=(1, d))
        out = jnp.moveaxis(out, 0, d)
    return out


def ci_matvec(ci, ham: PolynomialHamiltonian, ints: SPFInts):
    """H·A in the SPF basis (SOP term loop; reference ``multiplyH_CI``)."""
    out = jnp.zeros_like(ci)
    for term in ham.general[0][0] + ham.onesite[0][0]:
        mats = {
            d: ints[d][k] for d, k in term.mode_ops.items()
        }
        out = out + term.coef * _apply_term(ci, mats)
    if ham.coupleJ[0][0] != 0.0:
        out = out + ham.coupleJ[0][0] * ci
    return out


def ci_density(ci, idof: int) -> jnp.ndarray:
    """ρ^κ_{jl} = ⟨A|_j |A⟩_l with all other axes contracted."""
    axes = [d for d in range(ci.ndim) if d != idof]
    return jnp.tensordot(ci.conj(), ci, axes=(axes, axes))


def ci_meanfield(ci, ham, ints, idof: int, nspf: int):
    """Mean-field matrices in the PRIMITIVE basis for DOF ``idof``:
    Σ_r c_r ⟨A|Π_{d≠idof} h̃_d|A⟩_{jl} ⊗ h^prim_r(idof) assembled later;
    here we return list of (weight_{jl}, op_key)."""
    out = []
    for term in ham.general[0][0] + ham.onesite[0][0]:
        mode_ops = term.mode_ops
        mats = {
            d: ints[d][k] for d, k in mode_ops.items() if d != idof
        }
        hA = _apply_term(ci, mats)
        axes = [d for d in range(ci.ndim) if d != idof]
        w = jnp.tensordot(ci.conj(), hA, axes=(axes, axes))
        out.append((term.coef * w, mode_ops.get(idof, "ovlp")))
    return out


class MCTDHEngine:
    """VMF-propagated MCTDH wavefunction (CI ⊗ SPF) with the Simulator
    interface (propagate / expectation / autocorr / norm / pop_states)."""

    def __init__(self, model, config: Config):
        self.model = model
        self.config = config
        basinfo = model.basinfo
        self.ndof = basinfo.get_ndof()
        ham = model.hamiltonian
        if not isinstance(ham, PolynomialHamiltonian):
            raise NotImplementedError("MCTDH requires PolynomialHamiltonian")
        if ham.nstate != 1:
            raise NotImplementedError("MCTDH: single electronic state only")
        self.ham = ham
        self.nspf = [basinfo.get_nspf(0, d) for d in range(self.ndof)]
        self.nprim = [basinfo.get_nprim(0, d) for d in range(self.ndof)]
        self.op_keys = [set() for _ in range(self.ndof)]
        for term in ham.general[0][0] + ham.onesite[0][0]:
            for d, k in term.mode_ops.items():
                self.op_keys[d].add(k)
        self.spf = SPFCoef.init_ground(self.nspf, self.nprim)
        ci = np.zeros(self.nspf, dtype=complex)
        ci[(0,) * self.ndof] = 1.0
        if model.init_weight_VIBSTATE is not None:
            # occupation vector per DOF (in the SPF basis, product state)
            ci[...] = 0.0
            vecs = [
                np.asarray(v[: self.nspf[d]], complex)
                for d, v in enumerate(model.init_weight_VIBSTATE[0])
            ]
            prod = vecs[0]
            for v in vecs[1:]:
                prod = np.multiply.outer(prod, v)
            ci = prod / np.linalg.norm(prod)
        self.ci = jnp.asarray(ci)
        self.ci0 = self.ci
        self.spf0 = [p for p in self.spf.phis]
        self.epsrho = config.epsrho

    # ------------------------------------------------------------------
    def _ints(self) -> SPFInts:
        return SPFInts(self.model.basinfo, self.spf, self.op_keys)

    def _spf_derivative(self, phis, ci, ints):
        """i φ̇ = (1−P)ρ⁻¹ Σ_r ⟨H⟩_mf h^prim φ (reference
        ``derivatives_SPF``, ``_spf_cls.py:192-309``)."""
        derivs = []
        basinfo = self.model.basinfo
        for idof in range(self.ndof):
            phi = phis[idof]
            rho = ci_density(ci, idof)
            # regularised inverse (reference _helper.py:125)
            w, v = jnp.linalg.eigh(rho)
            w = w + self.epsrho * jnp.exp(-w / self.epsrho)
            rho_inv = (v / w[None, :]) @ v.conj().T
            mf = ci_meanfield(ci, self.ham, ints, idof, self.nspf[idof])
            bas = basinfo.get_primbas(0, idof)
            acc = jnp.zeros_like(phi)
            for weight, key in mf:
                prim = jnp.asarray(
                    op_matrix(bas, bas, key), jnp.complex128
                )
                acc = acc + weight @ (phi @ prim.T)
            hphi = rho_inv @ acc
            # project out the occupied SPF space: (1−P)
            proj = phi.conj() @ hphi.T  # ⟨φ_j|hφ_l⟩
            hphi = hphi - proj.T @ phi
            derivs.append(-1j * hphi)
        return derivs

    def propagate(self, dt: float, one_gate_to_apply=None, kraus_op=None):
        """One VMF step: CI half-SIL, SPF RK45, CI half-SIL (Strang)."""
        ints = self._ints()
        shape = self.ci.shape

        def mv(vec):
            return ci_matvec(vec.reshape(shape), self.ham, ints).ravel()

        self.ci = krylov_expm(
            mv, self.ci.ravel(), -0.5j * dt, self.config.thresh_exp,
            conserve_norm=True,
        ).reshape(shape)

        # SPF propagation with frozen mean fields (CMF-style split)
        phis = list(self.spf.phis)
        flat = jnp.concatenate([p.ravel() for p in phis])
        sizes = [p.size for p in phis]
        shapes = [p.shape for p in phis]

        def f(y):
            ps, ofs = [], 0
            for sz, sh in zip(sizes, shapes):
                ps.append(y[ofs:ofs + sz].reshape(sh))
                ofs += sz
            ds = self._spf_derivative(ps, self.ci, ints)
            return jnp.concatenate([d.ravel() for d in ds])

        flat = ode_propagate(f, flat, dt, tol=self.config.thresh_exp)
        ofs = 0
        for k, (sz, sh) in enumerate(zip(sizes, shapes)):
            self.spf.phis[k] = flat[ofs:ofs + sz].reshape(sh)
            ofs += sz
        self.spf.gram_schmidt()

        ints = self._ints()

        def mv2(vec):
            return ci_matvec(vec.reshape(shape), self.ham, ints).ravel()

        self.ci = krylov_expm(
            mv2, self.ci.ravel(), -0.5j * dt, self.config.thresh_exp,
            conserve_norm=True,
        ).reshape(shape)

    # ---------------------------------------------------------- observables
    def expectation(self, op=None) -> complex:
        ham = self.ham if op is None or op is self.ham else op
        ints = SPFInts(
            self.model.basinfo, self.spf,
            [
                {k for t in ham.general[0][0] + ham.onesite[0][0]
                 for d, k in t.mode_ops.items() if d == idof}
                for idof in range(self.ndof)
            ],
        )
        hci = ci_matvec(self.ci, ham, ints)
        return complex(jnp.vdot(self.ci, hci))

    def autocorr(self) -> complex:
        # ⟨Ψ(0)*|Ψ(t)⟩ (T/2 trick needs SPF overlaps of φ* with φ)
        ov = jnp.asarray(1.0 + 0.0j)
        ci_t = self.ci
        for idof in range(self.ndof):
            s = self.spf.phis[idof] @ self.spf.phis[idof].T
            ci_t = jnp.tensordot(s, ci_t, axes=(1, idof))
            ci_t = jnp.moveaxis(ci_t, 0, idof)
        return complex(jnp.tensordot(self.ci, ci_t, axes=self.ci.ndim))

    def norm(self) -> float:
        return float(jnp.linalg.norm(self.ci))

    def pop_states(self) -> list[float]:
        return [self.norm() ** 2]

    def bond_dims(self) -> list[int]:
        return list(self.nspf)

    def reduced_density(self, remain_nleg, istate=0):
        """ρ in the PRIMITIVE basis for kept DOFs (nleg=2 sites)."""
        keep = [d for d, n in enumerate(remain_nleg) if n == 2]
        if len(keep) != 1:
            raise NotImplementedError("MCTDH RDM: one kept DOF")
        d = keep[0]
        rho_spf = ci_density(self.ci, d).T
        phi = self.spf.phis[d]
        return np.asarray(phi.T @ rho_spf @ phi.conj())

    def to_numpy(self):
        return {
            "ci": np.asarray(self.ci),
            "spf": [np.asarray(p) for p in self.spf.phis],
        }
