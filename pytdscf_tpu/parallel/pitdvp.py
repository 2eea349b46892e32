"""Chain-partitioned parallel TDVP (real-space parallelism, PITDVP).

Algorithmic counterpart of the reference's MPI parallel MPS
(``/root/reference/pytdscf/_mps_parallel.py:59-1471``; Secular et al., npj
Comput. Mater. 6, 1 (2020)): the chain splits into P contiguous segments
that sweep in opposite directions concurrently; boundary bonds carry either
a plain bond factor σ_b or a *double-centre* form — the σ absorbed into
BOTH neighbouring cores with the pseudo-inverse σ_b⁺ between them — so each
segment holds a genuine orthogonality centre while the global state stays
exact.

One full step dt (P even; boundary b sits between segments b−1 and b):

  re-centre odd boundaries   σ_b → ψ|σ_b⁺|ψ       (double-centre)
  inward sweeps              even segs →, odd segs ← (dt/2 per site,
                             skipping the boundary-adjacent end sites)
  joint updates              odd boundaries: merge ψσ⁺ψ, canonicalise,
                             1-site TDVP pair over the two boundary sites,
                             SVD split → A σ_b' B  (plain)
  re-centre even boundaries  σ_b → ψ|σ_b⁺|ψ
  outward sweeps             even segs ←, odd segs → (the sweep start
                             evolves the boundary site's second half-step)
  joint updates              even boundaries

Segment sweeps within a phase touch disjoint data — on a multi-chip mesh
each segment is a device and the σ/environment handoffs are neighbour
``ppermute``s; here they dispatch as independent XLA computations on one
device.  Boundary SVD truncation and the Tikhonov-regularised σ⁺ follow the
reference (``_site_cls.py:586-822``).

Single electronic state; norm conservation off (as the reference forces
for parallel runs, ``_const_cls.py:251``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pytdscf_tpu.config import Config
from pytdscf_tpu.mps import device_io as dio
from pytdscf_tpu.mps import kernels as K
from pytdscf_tpu.mps.integrator import krylov_expm
from pytdscf_tpu.mps.tdvp import _normalize_block

PREC = jax.lax.Precision.HIGHEST

from functools import partial


@partial(jax.jit, static_argnames=("thresh", "max_dim"))
def _site_evolve_jit(L, W, R, psi, scale, hfac, thresh, max_dim):
    sh = psi.shape

    def hmv(v):
        return (
            K.heff_apply(L, W, R, v.reshape(sh)) * hfac.astype(psi.dtype)
        ).ravel()

    return krylov_expm(
        hmv, psi.ravel(), scale, thresh, max_dim=max_dim,
        conserve_norm=False,
    ).reshape(sh)


@partial(jax.jit, static_argnames=("thresh", "max_dim"))
def _bond_evolve_jit(L, R, sig, scale, kfac, thresh, max_dim):
    sh = sig.shape

    def kmv(v):
        return (
            K.keff_apply(L, R, v.reshape(sh)) * kfac.astype(sig.dtype)
        ).ravel()

    return krylov_expm(
        kmv, sig.ravel(), -scale, thresh, max_dim=max_dim,
        conserve_norm=False,
    ).reshape(sh)


def _pinv(sig: jax.Array, eps: float) -> jax.Array:
    """Tikhonov-regularised pseudo-inverse with the regularisation scaled
    to the leading singular value (reference ``multiply_sigvec_pinv``).

    Singular triplets below the regularisation scale are zeroed outright
    rather than merely damped: on the TPU backend the null-space columns of
    near-rank-deficient complex64 SVDs contain garbage (1e9-magnitude
    entries — see the backend notes in ``mps/kernels.py``), and the Tikhonov
    weight s/(s²+e²) scales but does not bound those junk vectors.  Channels
    with s < e carry less amplitude than the σ⁺ regularisation error anyway,
    so dropping them is the documented-safe regime (singular values + kept
    columns above the cut remain usable)."""
    u, s, vh = jnp.linalg.svd(sig, full_matrices=False)
    e = eps * jnp.maximum(s[0], 1e-300)
    s_inv = jnp.where(s > e, s / (s * s + e * e), 0.0)
    return (vh.conj().T * s_inv.astype(sig.dtype)) @ u.conj().T


class PITDVP:
    """P-segment parallel TDVP propagator (single-state MPS)."""

    def __init__(
        self,
        cores: list[np.ndarray],
        hamiltonian,
        config: Config,
        n_segments: int,
    ):
        nsite = len(cores)
        if n_segments < 2 or n_segments % 2 != 0:
            raise ValueError("n_segments must be even and >= 2")
        if nsite % n_segments != 0:
            raise ValueError("nsite must divide evenly into segments")
        self.P = n_segments
        self.m = nsite // n_segments
        self.nsite = nsite
        self.config = config
        self.dtype = jnp.dtype(config.dtype)
        phys = [int(c.shape[1]) for c in cores]
        fused = hamiltonian.fused_mpo(phys)[0][0]
        self.W = [dio.put(w, self.dtype) for w in fused]
        #: plain bond factor σ_b at boundaries 1..P−1 ('plain' mode) or the
        #: factor whose pinv sits between double centres ('double' mode)
        self.sig: dict[int, jax.Array] = {}
        self.mode: dict[int, str] = {}
        self.cores = [dio.put(c, self.dtype) for c in cores]
        self._distribute()

    # -------------------------------------------------------- distribution
    def _distribute(self) -> None:
        """Reference state (1): seg0 = ψB…B; odd segs A…A(ψ at global
        edge); boundary factors start as identity ('plain')."""
        for b in range(1, self.P):
            D = self.cores[b * self.m].shape[0]
            self.sig[b] = dio.put(np.eye(D), self.dtype)
            self.mode[b] = "plain"
        # odd segments: left-canonicalise locally (centre → right edge)
        for s in range(1, self.P, 2):
            lo, hi = s * self.m, (s + 1) * self.m - 1
            for p in range(lo, hi):
                a, r = K.qr_right(self.cores[p])
                self.cores[p] = a
                self.cores[p + 1] = K.absorb_right(r, self.cores[p + 1])

    # ------------------------------------------------------------ helpers
    def _bond_matrix(self, b: int) -> jax.Array:
        """Effective bond insertion at boundary b for global contractions."""
        if self.mode[b] == "plain":
            return self.sig[b]
        return _pinv(self.sig[b], self.config.epsrho)

    def _transfer_env(self, lo, hi, rightward: bool, B, log):
        """Contract sites lo..hi (inclusive) into env B, inserting boundary
        factors crossed along the way."""
        rng = range(lo, hi + 1) if rightward else range(hi, lo - 1, -1)
        for p in rng:
            if rightward and p % self.m == 0 and lo < p:
                X = self._bond_matrix(p // self.m)
                B = dio.jeinsum("bo,bak,kp->oap", X.conj(), B, X)
            B = (
                K.renorm_block_left(B, self.cores[p], self.W[p], self.cores[p])
                if rightward
                else K.renorm_block_right(
                    B, self.cores[p], self.W[p], self.cores[p]
                )
            )
            B, dl = _normalize_block(B)
            log = log + dl
            if (not rightward) and p % self.m == 0 and p > lo:
                X = self._bond_matrix(p // self.m)
                B = dio.jeinsum("ob,bak,pk->oap", X.conj(), B, X)
        return B, log

    def _env_left_of_segment(self, s: int):
        B = dio.ones((1, 1, 1), self.dtype)
        log = jnp.asarray(0.0, jnp.float32)
        if s == 0:
            return B, log
        B, log = self._transfer_env(0, s * self.m - 1, True, B, log)
        X = self._bond_matrix(s)
        B = dio.jeinsum("bo,bak,kp->oap", X.conj(), B, X)
        B, dl = _normalize_block(B)
        return B, log + dl

    def _env_right_of_segment(self, s: int):
        B = dio.ones((1, 1, 1), self.dtype)
        log = jnp.asarray(0.0, jnp.float32)
        if s == self.P - 1:
            return B, log
        B, log = self._transfer_env(
            (s + 1) * self.m, self.nsite - 1, False, B, log
        )
        X = self._bond_matrix(s + 1)
        B = dio.jeinsum("ob,bak,pk->oap", X.conj(), B, X)
        B, dl = _normalize_block(B)
        return B, log + dl

    # ---------------------------------------------------------- site steps
    def _evolve_site(self, p, L, lL, R, lR, scale):
        hfac = jnp.exp(lL + lR)
        self.cores[p] = _site_evolve_jit(
            L, self.W[p], R, self.cores[p], scale, hfac,
            self.config.thresh_exp, self.config.max_krylov,
        )

    def _evolve_bond(self, sig, L, lL, R, lR, scale):
        kfac = jnp.exp(lL + lR)
        return _bond_evolve_jit(
            L, R, sig, scale, kfac,
            self.config.thresh_exp, self.config.max_krylov,
        )

    def _sweep_segment(self, s, forward, scale, skip_end, envs=None):
        """Directional sweep over segment s with frozen boundary envs
        (computed from the phase-start state, as a parallel execution
        would exchange them before sweeping)."""
        lo, hi = s * self.m, (s + 1) * self.m - 1
        if envs is None:
            Lb, lL = self._env_left_of_segment(s)
            Rb, lR = self._env_right_of_segment(s)
        else:
            Lb, lL, Rb, lR = envs
        # within-segment environment stack opposite to the sweep direction
        env = [(Rb, lR) if forward else (Lb, lL)]
        inner = range(hi, lo, -1) if forward else range(lo, hi)
        for p in inner:
            B0, l0 = env[-1]
            if forward:
                B = K.renorm_block_right(B0, self.cores[p], self.W[p], self.cores[p])
            else:
                B = K.renorm_block_left(B0, self.cores[p], self.W[p], self.cores[p])
            B, dl = _normalize_block(B)
            env.append((B, l0 + dl))
        sysB, sysl = (Lb, lL) if forward else (Rb, lR)
        order = range(lo, hi + 1) if forward else range(hi, lo - 1, -1)
        for p in order:
            envB, envl = env.pop()
            last = p == (hi if forward else lo)
            if last and skip_end:
                break
            L, lLc = (sysB, sysl) if forward else (envB, envl)
            R, lRc = (envB, envl) if forward else (sysB, sysl)
            self._evolve_site(p, L, lLc, R, lRc, scale)
            if last:
                break
            if forward:
                a, sg = K.qr_right(self.cores[p])
                self.cores[p] = a
                sysB, dl = _normalize_block(
                    K.renorm_block_left(sysB, a, self.W[p], a)
                )
                sysl = sysl + dl
                sg = self._evolve_bond(sg, sysB, sysl, envB, envl, scale)
                self.cores[p + 1] = K.absorb_right(sg, self.cores[p + 1])
            else:
                sg, bcore = K.lq_left(self.cores[p])
                self.cores[p] = bcore
                sysB, dl = _normalize_block(
                    K.renorm_block_right(sysB, bcore, self.W[p], bcore)
                )
                sysl = sysl + dl
                sg = self._evolve_bond(sg, envB, envl, sysB, sysl, scale)
                self.cores[p - 1] = K.absorb_left(self.cores[p - 1], sg)

    # ------------------------------------------------------- boundary ops
    def _recenter(self, b: int) -> None:
        """plain σ_b → double-centre ψ|σ_b⁺|ψ (reference (1)→(2)/(4)→(5))."""
        if self.mode[b] == "double":
            return
        pL, pR = b * self.m - 1, b * self.m
        sig = self.sig[b]
        self.cores[pL] = dio.jeinsum(
            "lnk,km->lnm", self.cores[pL], sig
        )
        self.cores[pR] = dio.jeinsum("km,mnr->knr", sig, self.cores[pR])
        self.mode[b] = "double"

    def _joint_update(self, b: int, scale, max_bond: int) -> None:
        """Double-centre boundary: merge, canonicalise, evolve the two
        boundary sites and the bond, split back to A σ' B (plain)
        (reference ``propagate_joint_two_sites``,
        ``_mps_parallel.py:270-470``)."""
        cfg = self.config
        pL, pR = b * self.m - 1, b * self.m
        sp = _pinv(self.sig[b], cfg.epsrho)
        # merge ψ σ⁺ ψ into the left-centre two-site pair: ψ_L' = ψ_L σ⁺,
        # then canonicalise so the left site is the centre
        psiL = dio.jeinsum("lnk,km->lnm", self.cores[pL], sp)
        psiR = self.cores[pR]
        # centre to the left site: ψ_R = QR → σ·B, absorb σ into ψ_L
        sgR, bR = K.lq_left(psiR)
        psiL = dio.jeinsum("lnk,km->lnm", psiL, sgR)
        # environments
        sL = b - 1
        Lb, lL = self._env_left_of_segment(sL)
        Lb2, lL2 = self._transfer_env(sL * self.m, pL - 1, True, Lb, lL)
        Rb, lR = self._env_right_of_segment(b)
        Rb2, lR2 = self._transfer_env(pR + 1, (b + 1) * self.m - 1, False, Rb, lR)
        # evolve ψ_L (site pL) with env through B(pR)
        RbL = K.renorm_block_right(Rb2, bR, self.W[pR], bR)
        RbL, dlr = _normalize_block(RbL)
        self.cores[pL] = psiL
        self.cores[pR] = bR
        self._evolve_site(pL, Lb2, lL2, RbL, lR2 + dlr, scale)
        # bond evolve at boundary
        a, sg = K.qr_right(self.cores[pL])
        self.cores[pL] = a
        LbB, dll = _normalize_block(
            K.renorm_block_left(Lb2, a, self.W[pL], a)
        )
        sg = self._evolve_bond(sg, LbB, lL2 + dll, RbL, lR2 + dlr, scale)
        # evolve ψ_R (site pR)
        self.cores[pR] = K.absorb_right(sg, self.cores[pR])
        self._evolve_site(pR, LbB, lL2 + dll, Rb2, lR2, scale)
        # backward bond evolve, then SVD split to A σ' B
        sg2, bcore = K.lq_left(self.cores[pR])
        self.cores[pR] = bcore
        RbN, dlr2 = _normalize_block(
            K.renorm_block_right(Rb2, bcore, self.W[pR], bcore)
        )
        sg2 = self._evolve_bond(sg2, LbB, lL2 + dll, RbN, lR2 + dlr2, scale)
        u, s, vh = jnp.linalg.svd(sg2, full_matrices=False)
        s_host = np.asarray(dio.fetch(s))
        # truncate noise channels aggressively — their pseudo-inverse
        # amplifies garbage (reference uses p_svd for the parallel joint,
        # ``truncate_sigvec``); channels below ~100·epsrho carry less
        # amplitude than the σ⁺ regularisation error they would inject
        cut = max(cfg.adaptive_p_svd, 100.0 * cfg.epsrho)
        keep = int(np.sum(s_host > cut * max(s_host[0], 1e-300)))
        keep = max(min(keep, max_bond), 1)
        self.cores[pL] = dio.jeinsum(
            "lnk,km->lnm", self.cores[pL], u[:, :keep]
        )
        self.cores[pR] = dio.jeinsum(
            "mk,knr->mnr", vh[:keep], self.cores[pR]
        )
        self.sig[b] = jnp.diag(s[:keep]).astype(self.dtype)
        self.mode[b] = "plain"

    # ------------------------------------------------------------ driver
    def propagate(self, dt: float, max_bond: int | None = None) -> None:
        if max_bond is None:
            max_bond = max(c.shape[0] for c in self.cores)
        scale = dio.put(np.asarray(-0.5j * dt), self.dtype)
        P = self.P
        odd_bounds = list(range(1, P, 2))
        even_bounds = list(range(2, P, 2))
        # re-centre odd boundaries, inward sweeps, odd joints
        for b in odd_bounds:
            self._recenter(b)
        frozen = [
            (*self._env_left_of_segment(s), *self._env_right_of_segment(s))
            for s in range(P)
        ]
        for s in range(P):
            # even segs sweep → into their right boundary; odd segs ←
            fwd = s % 2 == 0
            at_edge = (s == 0 and not fwd) or (s == P - 1 and fwd)
            self._sweep_segment(
                s, fwd, scale, skip_end=not at_edge, envs=frozen[s]
            )
        for b in odd_bounds:
            self._joint_update(b, scale, max_bond)
        # re-centre even boundaries, outward sweeps, even joints
        for b in even_bounds:
            self._recenter(b)
        for b in odd_bounds:
            self._recenter(b)
        frozen = [
            (*self._env_left_of_segment(s), *self._env_right_of_segment(s))
            for s in range(P)
        ]
        for s in range(P):
            fwd = s % 2 == 1
            at_edge = (s == 0 and not fwd) or (s == P - 1 and fwd)
            self._sweep_segment(
                s, fwd, scale, skip_end=not at_edge, envs=frozen[s]
            )
        for b in even_bounds:
            self._joint_update(b, scale, max_bond)

    # -------------------------------------------------------- observables
    def to_serial_cores(self) -> list[np.ndarray]:
        """Collapse boundary factors into a plain core list (the
        reference's gather, ``to_MPSCoefMPO``, ``_mps_parallel.py:1416``)."""
        cores = [dio.fetch(c) for c in self.cores]
        for b in range(1, self.P):
            X = dio.fetch(self._bond_matrix(b))
            pL = b * self.m - 1
            cores[pL] = np.einsum("lnk,ka->lna", cores[pL], X)
        return cores

    def norm(self) -> float:
        cores = self.to_serial_cores()
        S = np.ones((1, 1), dtype=complex)
        for c in cores:
            S = np.einsum("bk,bno,knp->op", S, c.conj(), c, optimize=True)
        return float(np.sqrt(S[0, 0].real))

    def expectation(self) -> float:
        cores = self.to_serial_cores()
        B = np.ones((1, 1, 1), dtype=complex)
        for p in range(self.nsite - 1, -1, -1):
            w = np.asarray(dio.fetch(self.W[p]))
            B = np.einsum(
                "bak,oib,cija,pjk->ocp", B, cores[p].conj(), w, cores[p],
                optimize=True,
            )
        S = np.ones((1, 1), dtype=complex)
        for c in cores:
            S = np.einsum("bk,bno,knp->op", S, c.conj(), c, optimize=True)
        return float(B[0, 0, 0].real / S[0, 0].real)
