"""MCTDH mode: CI tensor + single-particle-function (SPF) layer.

Functional counterpart of the reference's MCTDH machinery
(``/root/reference/pytdscf/_ci_cls.py`` — multi-state CI tensors with SIL
propagation and mean-field construction; ``_spf_cls.py`` — SPF matrices with
the (1−P)ρ⁻¹⟨H⟩φ EOM, RK45; ``_ode_cls.py`` — RK4 / Dormand–Prince
steppers; ``wavefunction.py:176`` — VMF propagation and ``:418-586`` — CMF
constant-mean-field propagation with adaptive step-size control), redesigned
jax-first: CI tensors are dense jax arrays contracted per-DOF with
tensordots (MXU matmuls), the SIL reuses the on-device Krylov propagator of
the MPS engine, and SPF updates are batched matrix ODEs.

Multi-state structure: each electronic state carries its own SPF set
(state-specific SPFs, reference ``_spf_cls.SPFCoef`` indexed by state) and
its own CI tensor; off-diagonal Hamiltonian blocks contract through
cross-state SPF overlap/operator integrals on EVERY degree of freedom
(reference ``multiplyH_CI`` over (istate, jstate) pairs,
``_ci_cls.py:616-899``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pytdscf_tpu.basis.op_matrix import op_matrix
from pytdscf_tpu.config import Config
from pytdscf_tpu.mps.integrator import krylov_expm, lanczos_ground_state
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
    sign = 1.0 if dt_total >= 0 else -1.0
    span = abs(dt_total)
    while t < span - 1e-15:
        dt = min(abs(dt), span - t)
        y5, err, dt_new = rk45_step(f, y, sign * dt, tol)
        if err <= tol or dt <= 1e-8 * span:
            y = y5
            t += dt
        dt = abs(dt_new)
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

    def copy(self) -> "SPFCoef":
        return SPFCoef([p for p in self.phis])

    def gram_schmidt(self) -> None:
        for k, phi in enumerate(self.phis):
            q, _ = jnp.linalg.qr(phi.T)
            self.phis[k] = q.T

    def ovlp(self, idof: int) -> jnp.ndarray:
        p = self.phis[idof]
        return p.conj() @ p.T


class SPFInts:
    """⟨φ^i_j|op|φ^k_l⟩ per DOF for every op key a Hamiltonian block uses,
    for every coupled electronic-state pair (reference ``_spf_cls.SPFInts``;
    cross-state blocks additionally need the plain overlap on every DOF).
    """

    def __init__(
        self, basinfo, spfs: list[SPFCoef], keys_per_pair: dict,
        spfs_ket: list[SPFCoef] | None = None,
    ):
        """``spfs_ket``: a DIFFERENT ket SPF set (the reference's
        ``SPFInts(..., spf_coef_ket=...)`` used by the dipole fit) — then
        even same-state blocks have non-identity overlaps on every DOF,
        flagged via :attr:`mixed` for the CI contractions."""
        kets = spfs if spfs_ket is None else spfs_ket
        self.mixed = spfs_ket is not None
        #: {(i, j): [per-dof {key: (nspf_i, nspf_j) matrix}]}
        self.mats: dict[tuple[int, int], list[dict[str, jnp.ndarray]]] = {}
        for (i, j), keys_per_dof in keys_per_pair.items():
            pair = []
            for idof, keys in enumerate(keys_per_dof):
                bas_i = basinfo.get_primbas(i, idof)
                bas_j = basinfo.get_primbas(j, idof)
                phi_i, phi_j = spfs[i].phis[idof], kets[j].phis[idof]
                dof_mats = {}
                for key in keys | {"ovlp"}:
                    prim = jnp.asarray(
                        op_matrix(bas_i, bas_j, key), jnp.complex128
                    )
                    dof_mats[key] = phi_i.conj() @ prim @ phi_j.T
                pair.append(dof_mats)
            self.mats[(i, j)] = pair

    def pair(self, i: int, j: int) -> list[dict[str, jnp.ndarray]]:
        return self.mats[(i, j)]

    def __getitem__(self, idof: int) -> dict[str, jnp.ndarray]:
        # single-state convenience (state pair (0, 0))
        return self.mats[(0, 0)][idof]


# --------------------------------------------------------------- CI layer
def _apply_term(ci, mode_ops: dict[int, jnp.ndarray]):
    """Apply Π_d (matrix on axis d) to the CI tensor."""
    out = ci
    for d, mat in mode_ops.items():
        out = jnp.tensordot(mat, out, axes=(1, d))
        out = jnp.moveaxis(out, 0, d)
    return out


def _pair_term_mats(ints_pair, term_mode_ops, ndof: int, cross: bool):
    """Per-DOF matrices of one SOP term for a state pair.

    Same-state blocks skip identity DOFs; cross-state blocks must contract
    the SPF overlap on every DOF (state-specific SPF bases)."""
    mats = {}
    for d in range(ndof):
        key = term_mode_ops.get(d)
        if key is not None:
            mats[d] = ints_pair[d][key]
        elif cross:
            mats[d] = ints_pair[d]["ovlp"]
    return mats


def ci_matvec_ms(cis, ham: PolynomialHamiltonian, ints: SPFInts, ndof: int):
    """H·A over all electronic-state blocks (reference ``multiplyH_CI``)."""
    out = [jnp.zeros_like(c) for c in cis]
    for i in range(ham.nstate):
        for j in range(ham.nstate):
            if (i, j) not in ints.mats:
                continue
            cross = i != j or ints.mixed
            pair = ints.pair(i, j)
            for term in ham.general[i][j] + ham.onesite[i][j]:
                mats = _pair_term_mats(pair, term.mode_ops, ndof, cross)
                out[i] = out[i] + term.coef * _apply_term(cis[j], mats)
            cj = ham.coupleJ[i][j]
            if cj != 0.0:
                if cross:
                    mats = {d: pair[d]["ovlp"] for d in range(ndof)}
                    out[i] = out[i] + cj * _apply_term(cis[j], mats)
                else:
                    out[i] = out[i] + cj * cis[j]
    return out


def ci_matvec(ci, ham: PolynomialHamiltonian, ints: SPFInts):
    """Single-state H·A (kept for the test-exercised 1-state surface)."""
    return ci_matvec_ms([ci], ham, ints, ci.ndim)[0]


def ci_density(ci, idof: int) -> jnp.ndarray:
    """ρ^κ_{jl} = ⟨A|_j |A⟩_l with all other axes contracted."""
    axes = [d for d in range(ci.ndim) if d != idof]
    return jnp.tensordot(ci.conj(), ci, axes=(axes, axes))


def rotate_rdm_to_primitive(rho, phis, nlegs):
    """SPF-basis RDM (site-major leg pairs, ket before bra) → primitive.

    ``phis[t]``: the kept DOF's SPF matrix (nspf, nprim); ``nlegs[t]`` ∈
    {1, 2} — 1 extracts the diagonal after rotation (grid populations)."""
    rho = np.asarray(rho)
    ax = 0
    for phi in phis:
        phi = np.asarray(phi)
        # ket leg: Σ_s phi[s, p] ρ[.., s(ket), ..]
        rho = np.moveaxis(
            np.tensordot(phi.T, np.moveaxis(rho, ax, 0), axes=(1, 0)),
            0, ax,
        )
        # bra leg: Σ_s ρ[.., s(bra), ..] phi*[s, p]
        rho = np.moveaxis(
            np.tensordot(
                np.moveaxis(rho, ax + 1, 0), phi.conj(), axes=(0, 0)
            ),
            -1, ax + 1,
        )
        ax += 2
    ax = 0
    for nleg in nlegs:
        if nleg == 1:
            rho = np.diagonal(rho, axis1=ax, axis2=ax + 1)
            rho = np.moveaxis(rho, -1, ax)
            ax += 1
        else:
            ax += 2
    return rho


def ci_meanfield_ms(
    cis, ham: PolynomialHamiltonian, ints: SPFInts, idof: int, ndof: int,
    cis_ket=None,
):
    """Mean-field weights for DOF ``idof`` of every state.

    Returns ``{istate: [(W_{ab}, op_key, jstate), ...]}`` with
    W = ⟨A^i| Π_{d≠idof} h̃_d |A^j⟩ so the SPF EOM contribution is
    W @ φ^j @ h_prim(idof)ᵀ (reference ``construct_mfop``,
    ``_ci_cls.py:129`` and ``_mps_sop.py:839-1172``).  ``cis_ket``
    supplies a different ket CI set (the dipole fit's mean field between
    the current bra and the initial ket, reference
    ``construct_mfop_TEMP4DIPOLE``)."""
    kets = cis if cis_ket is None else cis_ket
    out: dict[int, list] = {i: [] for i in range(ham.nstate)}
    for i in range(ham.nstate):
        for j in range(ham.nstate):
            if (i, j) not in ints.mats:
                continue
            cross = i != j or ints.mixed
            pair = ints.pair(i, j)
            axes = [d for d in range(ndof) if d != idof]
            for term in ham.general[i][j] + ham.onesite[i][j]:
                mats = _pair_term_mats(pair, term.mode_ops, ndof, cross)
                mats.pop(idof, None)
                hA = _apply_term(kets[j], mats)
                w = jnp.tensordot(cis[i].conj(), hA, axes=(axes, axes))
                out[i].append(
                    (term.coef * w, term.mode_ops.get(idof, "ovlp"), j)
                )
            cj = ham.coupleJ[i][j]
            if cj != 0.0:
                if cross:
                    mats = {d: pair[d]["ovlp"] for d in axes}
                    hA = _apply_term(kets[j], mats)
                else:
                    hA = kets[j]
                w = jnp.tensordot(cis[i].conj(), hA, axes=(axes, axes))
                out[i].append((cj * w, "ovlp", j))
    return out


def regularized_inverse(rho, epsrho: float):
    """ρ⁻¹ with the reference's exponential regularisation
    (``_helper.py:125``)."""
    w, v = jnp.linalg.eigh(rho)
    w = w + epsrho * jnp.exp(-w / epsrho)
    return (v / w[None, :]) @ v.conj().T


def spf_derivative_frozen(
    basinfo, nstate, ndof, epsrho, phis_all, mfop, relax: bool = False
):
    """i φ̇ = (1−P)ρ⁻¹ Σ_j W^{ij} φ^j h_prim ᵀ with FROZEN (ρ, W)
    — the constant-mean-field EOM (reference ``_spf_cls.py:192-309``).
    ``phis_all[i][d]`` is state i's SPF matrix for dof d; shared by the
    MCTDH engine and the MPS-MCTDH hybrid.  Under relaxation the EOM
    factor switches −i → −1 (imaginary-time orbital optimisation,
    reference ``_spf_cls.py:307``); the caller's Gram–Schmidt restores
    orthonormality after the decaying flow."""
    derivs = []
    for i in range(nstate):
        state_derivs = []
        for idof in range(ndof):
            phi = phis_all[i][idof]
            rho_inv = regularized_inverse(mfop["rho"][i][idof], epsrho)
            acc = jnp.zeros_like(phi)
            for (w, key, j) in mfop["terms"][idof][i]:
                bas_i = basinfo.get_primbas(i, idof)
                bas_j = basinfo.get_primbas(j, idof)
                prim = jnp.asarray(
                    op_matrix(bas_i, bas_j, key), jnp.complex128
                )
                acc = acc + w @ (phis_all[j][idof] @ prim.T)
            hphi = rho_inv @ acc
            proj = phi.conj() @ hphi.T  # ⟨φ_j|hφ_l⟩
            hphi = hphi - proj.T @ phi
            state_derivs.append((-1.0 if relax else -1j) * hphi)
        derivs.append(state_derivs)
    return derivs


def propagate_spfs(
    basinfo, nstate, ndof, epsrho, spfs, mfop, dt, tol: float = 1.0e-09,
    relax: bool = False,
):
    """Propagate every state's SPFs under frozen mean fields (RK45)."""
    phis_all = [list(s.phis) for s in spfs]
    sizes, shapes = [], []
    flat_parts = []
    for ps in phis_all:
        for p in ps:
            sizes.append(p.size)
            shapes.append(p.shape)
            flat_parts.append(p.ravel())
    flat = jnp.concatenate(flat_parts)

    def unpack(y):
        out, ofs, k = [], 0, 0
        for i in range(nstate):
            ps = []
            for _ in range(ndof):
                ps.append(y[ofs:ofs + sizes[k]].reshape(shapes[k]))
                ofs += sizes[k]
                k += 1
            out.append(ps)
        return out

    def f(y):
        ds = spf_derivative_frozen(
            basinfo, nstate, ndof, epsrho, unpack(y), mfop, relax=relax
        )
        return jnp.concatenate([d.ravel() for state in ds for d in state])

    flat = ode_propagate(f, flat, dt, tol=tol)
    return [SPFCoef(ps) for ps in unpack(flat)]


class MCTDHEngine:
    """VMF/CMF-propagated MCTDH wavefunction (CI ⊗ SPF per electronic
    state) with the Simulator interface (propagate / propagate_CMF /
    expectation / autocorr / norm / pop_states)."""

    def __init__(self, model, config: Config, payload=None):
        """``payload``: a dict from :meth:`to_numpy` — restores the CI
        tensors and SPF coefficients for checkpoint resume (the MPS path's
        restart analogue, reference ``simulator_cls.py:577-589``)."""
        self.model = model
        self.config = config
        basinfo = model.basinfo
        self.ndof = basinfo.get_ndof()
        ham = model.hamiltonian
        if not isinstance(ham, PolynomialHamiltonian):
            raise NotImplementedError("MCTDH requires PolynomialHamiltonian")
        self.ham = ham
        self.nstate = ham.nstate
        self.nspf = [
            [basinfo.get_nspf(i, d) for d in range(self.ndof)]
            for i in range(self.nstate)
        ]
        self.nprim = [
            [basinfo.get_nprim(i, d) for d in range(self.ndof)]
            for i in range(self.nstate)
        ]
        #: op keys per coupled state pair per dof
        self.keys_per_pair = self._keys_for(ham)
        self.spfs = [
            SPFCoef.init_ground(self.nspf[i], self.nprim[i])
            for i in range(self.nstate)
        ]
        if model.init_weight_ESTATE is not None:
            w = np.asarray(model.init_weight_ESTATE, dtype=float)
            weights = (w / w.sum()).tolist()
        else:
            weights = [1.0] + [0.0] * (self.nstate - 1)
        cis = []
        for i in range(self.nstate):
            ci = np.zeros(self.nspf[i], dtype=complex)
            ci[(0,) * self.ndof] = 1.0
            if model.init_weight_VIBSTATE is not None:
                vecs = [
                    np.asarray(v[: self.nspf[i][d]], complex)
                    for d, v in enumerate(model.init_weight_VIBSTATE[i])
                ]
                prod = vecs[0]
                for v in vecs[1:]:
                    prod = np.multiply.outer(prod, v)
                ci = prod / np.linalg.norm(prod)
            cis.append(jnp.asarray(ci * math.sqrt(weights[i])))
        self.cis = cis
        self.epsrho = config.epsrho
        if payload is not None:
            self.cis = [jnp.asarray(c) for c in payload["ci"]]
            self.spfs = [
                SPFCoef([jnp.asarray(p) for p in phis])
                for phis in payload["spf"]
            ]

    def _keys_for(self, ham) -> dict[tuple[int, int], list]:
        """Op keys per coupled state pair per dof for any SOP operator."""
        out: dict[tuple[int, int], list] = {}
        for i in range(ham.nstate):
            for j in range(ham.nstate):
                terms = ham.general[i][j] + ham.onesite[i][j]
                if not terms and ham.coupleJ[i][j] == 0.0:
                    continue
                keys = [set() for _ in range(self.ndof)]
                for term in terms:
                    for d, k in term.mode_ops.items():
                        keys[d].add(k)
                out[(i, j)] = keys
        return out

    # ------------------------------------------------- legacy 1-state views
    @property
    def ci(self):
        return self.cis[0]

    @ci.setter
    def ci(self, value):
        self.cis[0] = value

    @property
    def spf(self) -> SPFCoef:
        return self.spfs[0]

    # ------------------------------------------------------------------
    def _ints(self, spfs=None) -> SPFInts:
        return SPFInts(
            self.model.basinfo, spfs or self.spfs, self.keys_per_pair
        )

    def _flat(self, cis):
        return jnp.concatenate([c.ravel() for c in cis])

    def _unflat(self, vec):
        out, ofs = [], 0
        for i in range(self.nstate):
            sz = int(np.prod(self.nspf[i]))
            out.append(vec[ofs:ofs + sz].reshape(self.nspf[i]))
            ofs += sz
        return out

    def _propagate_ci(self, cis, ints, scale):
        """exp(scale·H)·A via the on-device Krylov propagator."""

        def mv(vec):
            return self._flat(
                ci_matvec_ms(self._unflat(vec), self.ham, ints, self.ndof)
            )

        flat = krylov_expm(
            mv, self._flat(cis), scale, self.config.thresh_exp,
            conserve_norm=self.config.conserve_norm
            and self.config.space == "hilbert",
        )
        return self._unflat(flat)

    # --------------------------------------------------------- SPF motion
    def _mfop(self, cis, ints):
        """Frozen mean-field data: ρ per state/dof + mean-field weights
        (reference ``construct_mfop``)."""
        rho = [
            [ci_density(cis[i], d) for d in range(self.ndof)]
            for i in range(self.nstate)
        ]
        terms = [
            ci_meanfield_ms(cis, self.ham, ints, d, self.ndof)
            for d in range(self.ndof)
        ]
        return {"rho": rho, "terms": terms}

    def _rho_inv(self, rho):
        return regularized_inverse(rho, self.epsrho)

    def _spf_derivative_frozen(self, phis_all, mfop):
        return spf_derivative_frozen(
            self.model.basinfo, self.nstate, self.ndof, self.epsrho,
            phis_all, mfop,
        )

    def _propagate_spfs(self, spfs, mfop, dt):
        return propagate_spfs(
            self.model.basinfo, self.nstate, self.ndof, self.epsrho,
            spfs, mfop, dt, tol=self.config.thresh_exp,
            relax=self.config.relax != "none",
        )

    def _diagonalize_ci(self, cis, ints):
        """Improved (diagonalisation) relaxation of the CI tensor: restarted
        Lanczos to the lowest Ritz vector of H in the frozen-SPF CI space
        (reference ``_helper.diagonalize_CI`` via ``_ci_cls.propagate``,
        ``/root/reference/pytdscf/_ci_cls.py:255-262``)."""

        def mv(vec):
            return self._flat(
                ci_matvec_ms(self._unflat(vec), self.ham, ints, self.ndof)
            )

        v = self._flat(cis)
        v = v / jnp.linalg.norm(v)
        e = jnp.vdot(v, mv(v)).real
        for _ in range(100):
            v = lanczos_ground_state(mv, v)
            e_new = jnp.vdot(v, mv(v)).real
            if abs(float(e_new - e)) < 1.0e-12:
                break
            e = e_new
        return self._unflat(v)

    # ------------------------------------------------------------ VMF step
    def propagate(self, dt: float, one_gate_to_apply=None, kraus_op=None):
        """One VMF step: CI half-SIL, SPF RK45, CI half-SIL (Strang)."""
        if one_gate_to_apply is not None or kraus_op is not None:
            # the reference routes gates/Kraus only through its MPS paths
            # (``wavefunction.py:398-406``); never silently ignore them
            raise NotImplementedError(
                "gates/Kraus are not supported for ci_type='mctdh'; use "
                "the MPS or MPS-MCTDH hybrid ansatz"
            )
        if self.config.relax == "improved":
            # improved relaxation: the CI half-steps become diagonalisation
            # to the lowest Ritz vector, the SPFs flow in imaginary time
            # (reference ``_ci_cls.propagate`` under doRelax)
            step_ci = self._diagonalize_ci
        else:
            scale = (
                -0.5 * dt if self.config.relax == "imaginary" else -0.5j * dt
            )
            step_ci = lambda cis, ints: self._propagate_ci(cis, ints, scale)  # noqa: E731
        ints = self._ints()
        self.cis = step_ci(self.cis, ints)

        # SPF propagation with mean fields recomputed per RK stage from the
        # frozen CI (VMF-style split)
        mfop = self._mfop(self.cis, ints)
        self.spfs = self._propagate_spfs(self.spfs, mfop, dt)
        for s in self.spfs:
            s.gram_schmidt()

        ints = self._ints()
        self.cis = step_ci(self.cis, ints)

    # ------------------------------------------------------------ CMF step
    def propagate_CMF(self, stepsize_guess: float):
        """One constant-mean-field step with adaptive step-size control.

        Implements the reference's predictor/corrector error control
        (``/root/reference/pytdscf/wavefunction.py:418-586``): the SPF error
        compares half-steps driven by MFOP(t=0) vs MFOP(t=h/2); the CI error
        back-propagates the half-stepped CI with the t=h integrals; both
        shrink the step by Beck's 0.7·(tol/err)^0.25 rule and grow the next
        guess by ≤1.5×.  Returns ``(stepsize_actual, stepsize_next)``.
        """
        if self.config.relax == "improved":
            # diagonalisation has no step size to control — improved
            # relaxation runs under the VMF stepper (as in the reference,
            # where doRelax bypasses the CI SIL entirely)
            raise NotImplementedError(
                "improved relaxation uses the VMF stepper; call "
                "propagate() or Simulator.relax() without CMF"
            )
        tol = self.config.tol_cmf
        h_max = self.config.max_stepsize
        h = min(stepsize_guess, h_max)
        ints0 = self._ints()
        mfop0 = self._mfop(self.cis, ints0)
        scale = (
            -0.5 if self.config.relax == "imaginary" else -0.5j
        )

        while True:
            # --- inner loop: SPF error control -------------------------
            while True:
                # (1) CI(t=0 → h/2) with IntsSPF(t=0)
                cis_half = self._propagate_ci(self.cis, ints0, scale * h)
                # (2) SPF(t=0 → h/2) with MFOP(t=0)
                spfs_approx = self._propagate_spfs(self.spfs, mfop0, h / 2)
                # MFOP at t=h/2 from the half-stepped CI
                mfop_half = self._mfop(cis_half, ints0)
                # (3) SPF(t=0 → h/2) with MFOP(t=h/2)
                spfs_half = self._propagate_spfs(self.spfs, mfop_half, h / 2)
                err_spf = 1.0e-16
                for i in range(self.nstate):
                    for d in range(self.ndof):
                        diff = (
                            spfs_approx[i].phis[d] - spfs_half[i].phis[d]
                        )
                        rho = mfop0["rho"][i][d]
                        err_spf += float(
                            jnp.einsum(
                                "kp,kl,lp->", diff.conj(), rho, diff
                            ).real
                        )
                if err_spf < tol * 2.0:
                    h_next = min(
                        h * min(1.5, ((tol * 2.0) / err_spf) ** 0.25),
                        h_max,
                    )
                    break
                h = min(h * ((tol * 2.0) / err_spf) ** 0.25 * 0.7, h_max)

            # (4) SPF(t=h/2 → h) with MFOP(t=h/2)
            spfs_full = self._propagate_spfs(spfs_half, mfop_half, h / 2)
            ints_full = self._ints(spfs_full)
            # (5) CI back-propagation (t=h/2 → 0) with IntsSPF(t=h)
            cis_back = self._propagate_ci(cis_half, ints_full, -scale * h)
            err_ci = 0.25 * sum(
                float(jnp.linalg.norm((a - b).ravel()) ** 2)
                for a, b in zip(self.cis, cis_back)
            )
            if (err_ci + err_spf) < tol * 2.0:
                h_next = min(
                    h * min(1.5, ((tol * 2.0) / (err_spf + err_ci)) ** 0.25),
                    h_max,
                )
                break
            h = min(h * (tol / (err_spf + err_ci)) ** 0.25 * 0.7, h_max)

        # (6) CI(t=h/2 → h) with IntsSPF(t=h); commit
        self.cis = self._propagate_ci(cis_half, ints_full, scale * h)
        self.spfs = spfs_full
        return h, h_next

    # ------------------------------------------------------- operator fit
    def apply_operator_fit(
        self, operator, maxiter: int = 10, conv_tol: float = 1.0e-08
    ) -> float:
        """Fit |Φ⟩ ≈ O|Ψ₀⟩ in MCTDH form, returning ‖O|Ψ₀⟩‖ in the fitted
        subspace (the Simulator ``operate`` contract shared with
        ``TDVPEngine.apply_operator_fit``).

        Reference semantics (``wavefunction.apply_dipole``,
        ``/root/reference/pytdscf/wavefunction.py:303-360``): alternate
        (1) SPF rotation toward the mean-field-weighted O·φ₀ — mean fields
        between the CURRENT CI (bra) and the INITIAL CI (ket) over
        mixed-SPF-set integrals (``construct_mfop_TEMP4DIPOLE`` /
        ``apply_dipole_spf_coef``) — and (2) the CI update
        A ← ⟨Φ(φ)|O|Ψ₀(φ₀)⟩ (``apply_dipole_ci_coef``), until the CI
        coefficient overlap stabilises.  With full-rank SPFs one projection
        is exact and the loop exits immediately."""
        if not isinstance(operator, PolynomialHamiltonian):
            raise NotImplementedError(
                "MCTDH operator fit requires a PolynomialHamiltonian (SOP)"
            )
        basinfo = self.model.basinfo
        keys = self._keys_for(operator)
        cis0 = list(self.cis)
        spfs0 = [s.copy() for s in self.spfs]
        contracted = any(
            self.nspf[i][d] < self.nprim[i][d]
            for i in range(self.nstate)
            for d in range(self.ndof)
        )
        prev = None
        norm = 0.0
        for _ in range(maxiter):
            if contracted:
                ints = SPFInts(basinfo, self.spfs, keys, spfs_ket=spfs0)
                mfs = [
                    ci_meanfield_ms(
                        self.cis, operator, ints, d, self.ndof, cis_ket=cis0
                    )
                    for d in range(self.ndof)
                ]
                for i in range(self.nstate):
                    new_phis = []
                    for d in range(self.ndof):
                        acc = jnp.zeros_like(self.spfs[i].phis[d])
                        for (w, key, j) in mfs[d][i]:
                            prim = jnp.asarray(
                                op_matrix(
                                    basinfo.get_primbas(i, d),
                                    basinfo.get_primbas(j, d),
                                    key,
                                ),
                                jnp.complex128,
                            )
                            acc = acc + w @ (spfs0[j].phis[d] @ prim.T)
                        new_phis.append(acc)
                    # a state with no weight in O|Ψ₀⟩ gets vanishing mean
                    # fields — keep its old orbitals (Gram-Schmidt of a
                    # zero matrix is junk)
                    if min(
                        float(jnp.linalg.norm(p)) for p in new_phis
                    ) > 1.0e-12:
                        self.spfs[i] = SPFCoef(new_phis)
                        self.spfs[i].gram_schmidt()
            ints = SPFInts(basinfo, self.spfs, keys, spfs_ket=spfs0)
            vec = self._flat(ci_matvec_ms(cis0, operator, ints, self.ndof))
            norm = float(jnp.linalg.norm(vec))
            if norm < 1.0e-300:
                raise ValueError("operator annihilates the wavefunction")
            vec = vec / norm
            self.cis = self._unflat(vec)
            if not contracted or (
                prev is not None
                and abs(1.0 - abs(complex(jnp.vdot(prev, vec)))) < conv_tol
            ):
                break
            prev = vec
        return norm

    # ---------------------------------------------------------- observables
    def expectation(self, op=None) -> complex:
        ham = self.ham if op is None or op is self.ham else op
        ints = SPFInts(self.model.basinfo, self.spfs, self._keys_for(ham))
        hcis = ci_matvec_ms(self.cis, ham, ints, self.ndof)
        return complex(
            sum(jnp.vdot(c, hc) for c, hc in zip(self.cis, hcis))
        )

    def autocorr(self) -> complex:
        # ⟨Ψ(0)*|Ψ(t)⟩ (T/2 trick needs SPF overlaps of φ* with φ)
        total = 0.0 + 0.0j
        for i in range(self.nstate):
            ci_t = self.cis[i]
            for idof in range(self.ndof):
                s = self.spfs[i].phis[idof] @ self.spfs[i].phis[idof].T
                ci_t = jnp.tensordot(s, ci_t, axes=(1, idof))
                ci_t = jnp.moveaxis(ci_t, 0, idof)
            total += complex(
                jnp.tensordot(self.cis[i], ci_t, axes=self.cis[i].ndim)
            )
        return total

    def norm(self) -> float:
        return float(
            math.sqrt(
                sum(float(jnp.linalg.norm(c)) ** 2 for c in self.cis)
            )
        )

    def pop_states(self) -> list[float]:
        return [float(jnp.linalg.norm(c)) ** 2 for c in self.cis]

    def bond_dims(self) -> list[int]:
        return list(self.nspf[0])

    def reduced_density(self, remain_nleg, istate=0):
        """ρ in the PRIMITIVE basis over any set of kept DOFs.

        ``remain_nleg[d]`` ∈ {0, 1, 2}: trace out / keep diagonal /
        keep bra+ket — the MPS engine's convention (site-major legs, ket
        before bra; reference general ``get_reduced_densities``,
        ``/root/reference/pytdscf/_mps_cls.py:1628``)."""
        keep = [d for d, n in enumerate(remain_nleg) if n > 0]
        if not keep:
            raise ValueError("no kept legs")
        import string

        ci = self.cis[istate]
        nd = ci.ndim
        L = string.ascii_lowercase
        bra = list(L[:nd])
        ket = list(L[:nd])
        for t, d in enumerate(keep):
            ket[d] = L[nd + t]
        out_sub = "".join(ket[d] + bra[d] for d in keep)
        rho = np.asarray(jnp.einsum(
            f"{''.join(bra)},{''.join(ket)}->{out_sub}",
            jnp.conj(ci), ci,
        ))
        phis = [np.asarray(self.spfs[istate].phis[d]) for d in keep]
        return rotate_rdm_to_primitive(
            rho, phis, [remain_nleg[d] for d in keep]
        )

    def to_numpy(self):
        return {
            "ci": [np.asarray(c) for c in self.cis],
            "spf": [
                [np.asarray(p) for p in s.phis] for s in self.spfs
            ],
        }
