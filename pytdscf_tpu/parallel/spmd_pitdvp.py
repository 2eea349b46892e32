"""SPMD chain-parallel TDVP: the PITDVP sweep as ONE shard_map program.

The TPU-native counterpart of the reference's MPI parallel MPS propagation
(``/root/reference/pytdscf/_mps_parallel.py:107-470`` — even/odd ranks
sweeping in opposite directions with boundary σ-vector/operator-block
point-to-point exchange and joint two-site boundary updates).  Design:

* per-state cores are stacked ``(nsite, D, n, D)`` (zero-padded to a
  uniform bond D) and sharded over a 1-D ``"chain"`` mesh axis — device s
  owns the contiguous segment of ``m = nsite/P`` sites, plus the per-state
  boundary factors σ_s at its LEFT edge (sharded ``(P, D, D)``);
* one full time step compiles to a single ``shard_map``-under-``jit``
  program: frozen boundary environments are EXACT, computed by a pipelined
  block prefix/suffix over the device ring — (D, w, D) environment blocks
  ppermute around the ring for P rounds while every device folds the block
  it holds through its own segment (an ``op_block`` handoff generalising
  the reference's ``reset_left/right_op_blocks`` pipeline,
  ``_mps_parallel.py:472-539``, to every prefix at once).  Unlike round-2's
  transfer-OPERATOR scan, nothing of size (D·w·D)² is ever materialised,
  so the scheme runs at χ ≥ 1024;
* segment sweeps run concurrently on every device with the direction
  selected by device parity (``lax.cond``); each sweep also returns its
  accumulated system blocks, which seed the boundary joint two-site
  updates directly (no environment recomputation between sweep and joint);
* MULTI-STATE superblocks and non-Hermitian generators (round-3): per-state
  cores/σ, per-state-pair fused MPOs, all states stacked into one Krylov
  vector per local update, Arnoldi via ``Config.integrator`` — the
  reference's ``MPSCoefParallel`` feature matrix
  (``_mps_parallel.py:59-268``);
* in-mesh observables (norm, populations, ⟨H⟩, autocorrelation, Liouville
  trace and reduced densities) ride the same block pipelines — no gather
  of the full chain to any host (reference
  ``_mps_parallel.py:855-1210``).

Norm conservation off (as the reference forces for parallel runs,
``_const_cls.py:251``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.6
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from pytdscf_tpu.config import Config
from pytdscf_tpu.mps import kernels as K
from pytdscf_tpu.mps.integrator import krylov_expm

PREC = jax.lax.Precision.HIGHEST
_TINY = 1e-300

Pair = tuple[int, int]


# --------------------------------------------------------------- helpers
def _trim_dead_bonds(cores):
    """Drop bond channels that are EXACTLY zero on either side (the padded
    channels of the uniform-D stacked sweep; the gauge kernels keep dead
    channels exactly zero, so this is lossless)."""
    out = [np.asarray(c).copy() for c in cores]
    for b in range(len(out) - 1):
        l, r = out[b], out[b + 1]
        live = (np.abs(l).sum(axis=(0, 1)) > 0) & (
            np.abs(r).sum(axis=(1, 2)) > 0
        )
        if not live.any():
            live[0] = True
        out[b] = l[:, :, live]
        out[b + 1] = r[live]
    liveL = np.abs(out[0]).sum(axis=(1, 2)) > 0
    liveL[0] = True
    out[0] = out[0][liveL]
    liveR = np.abs(out[-1]).sum(axis=(0, 1)) > 0
    liveR[0] = True
    out[-1] = out[-1][:, :, liveR]
    return out


@jax.jit
def _live_bond_ranks(cores):
    """Per-bond live-channel counts of a stacked (nsite, D, n, D) chain.

    A channel is live when BOTH the left core's column and the right
    core's row carry weight (the masked-adaptive zero-mask convention;
    cf. ``_trim_dead_bonds``).  Entry p counts the bond (p, p+1); the
    last entry is meaningless and dropped by the caller."""
    colL = jnp.abs(cores).sum(axis=(1, 2)) > 0
    rowR = jnp.roll(jnp.abs(cores).sum(axis=(2, 3)) > 0, -1, axis=0)
    return jnp.sum(colL & rowR, axis=-1)


def _norm_log(x):
    """(x/‖x‖, log‖x‖) — Frobenius-normalised with the scale as a log."""
    n = jnp.linalg.norm(x).real
    n = jnp.maximum(n, jnp.asarray(1e-30, n.dtype))
    return x / n.astype(x.dtype), jnp.log(n)


def _pinv(sig, eps, anchor=None):
    """Tikhonov σ⁺ with sub-regularisation channels dropped (see
    ``pitdvp._pinv``).  ``anchor`` overrides the own-s[0] scale — used by
    multi-state superblocks to anchor across ALL states (a noise-level
    state must never invert its own noise)."""
    u, s, vh = jnp.linalg.svd(sig, full_matrices=False)
    a = s[0] if anchor is None else anchor
    e = eps * jnp.maximum(a, _TINY)
    s_inv = jnp.where(s > e, s / (s * s + e * e), 0.0)
    return (vh.conj().T * s_inv.astype(sig.dtype)) @ u.conj().T


def _sig_anchor(sigs):
    """σ⁺ anchor for multi-state boundaries: None ⇒ each state's own
    leading singular value (frame-recovering inversion).  Channel
    truncation at the joint is globally anchored instead — see
    ``pitdvp._pinv_multi`` for the rationale."""
    return None


def _sites_evolve(Ls, Ws, Rs, psis, scale, lsums, *, pairs, thresh,
                  max_dim, arnoldi, prec="highest", relaxed=False):
    """All-state stacked H_eff Krylov exponential."""
    shapes = tuple(p.shape for p in psis)
    dtype = psis[0].dtype

    def make(p_):
        def hmv(vec):
            xs = K.split_states(vec, shapes)
            out = [jnp.zeros(sh, dtype) for sh in shapes]
            for q, ((i, j), L, W, R) in enumerate(zip(pairs, Ls, Ws, Rs)):
                out[i] = out[i] + K.heff_apply(L, W, R, xs[j], p_) * jnp.exp(
                    lsums[q]
                ).astype(dtype)
            return K.stack_states(out)

        return hmv

    out = krylov_expm(
        make(prec), K.stack_states(psis), scale, thresh, max_dim=max_dim,
        conserve_norm=False, arnoldi=arnoldi,
        matvec_lo=K.make_hmatvec_lo(
            pairs, Ls, Ws, Rs, shapes, dtype,
            tuple(jnp.exp(ls) for ls in lsums),
        )
        if relaxed
        else None,
    )
    return tuple(K.split_states(out, shapes))


def _bonds_evolve(Ls, Rs, sigs, scale, lsums, *, pairs, thresh, max_dim,
                  arnoldi, prec="highest", relaxed=False):
    shapes = tuple(s.shape for s in sigs)
    dtype = sigs[0].dtype

    def make(p_):
        def kmv(vec):
            xs = K.split_states(vec, shapes)
            out = [jnp.zeros(sh, dtype) for sh in shapes]
            for q, ((i, j), L, R) in enumerate(zip(pairs, Ls, Rs)):
                out[i] = out[i] + K.keff_apply(L, R, xs[j], p_) * jnp.exp(
                    lsums[q]
                ).astype(dtype)
            return K.stack_states(out)

        return kmv

    out = krylov_expm(
        make(prec), K.stack_states(sigs), -scale, thresh, max_dim=max_dim,
        conserve_norm=False, arnoldi=arnoldi,
        matvec_lo=K.make_kmatvec_lo(
            pairs, Ls, Rs, shapes, dtype,
            tuple(jnp.exp(ls) for ls in lsums),
        )
        if relaxed
        else None,
    )
    return tuple(K.split_states(out, shapes))


# ------------------------------------------------------------------ class
class SPMDPITDVP:
    """P-device chain-parallel TDVP over a ``"chain"`` mesh axis.

    ``cores``: per-state list of per-site arrays, or a flat single-state
    list (legacy call shape)."""

    def __init__(
        self,
        cores,
        hamiltonian,
        config: Config,
        mesh: Mesh,
        axis: str = "chain",
    ):
        self.mesh = mesh
        self.axis = axis
        self.P = mesh.shape[axis]
        if self.P < 2 or self.P % 2 != 0:
            raise ValueError("chain axis size must be even and >= 2")
        self._flat_input = not isinstance(cores[0], (list, tuple))
        states = [list(cores)] if self._flat_input else [
            list(st) for st in cores
        ]
        #: the user-level Hamiltonian (pre state-to-site conversion)
        self._orig_ham = hamiltonian
        #: multi-state superblocks are converted to ONE MPS with an
        #: electronic site — per-state boundary gauges are numerically
        #: unstable under chain splitting (see operators/state_to_site.py;
        #: the reference's parallel MPS is likewise single-state only,
        #: ``_mps_parallel.py:98-100``)
        self._conv = None
        if len(states) > 1:
            from pytdscf_tpu.operators.state_to_site import (
                electronic_site_chain,
                electronic_site_mpo,
            )

            ne = len(states)
            phys0 = [int(c.shape[1]) for c in states[0]]
            pad = (-(len(states[0]) + 1)) % self.P
            npad = max(ne, max(phys0))
            fused_ms = hamiltonian.fused_mpo(phys0)
            hamiltonian = electronic_site_mpo(
                fused_ms, ne, pad_sites=pad, phys_pad=npad
            )
            states = [
                electronic_site_chain(states, pad_sites=pad, phys_pad=npad)
            ]
            self._conv = {
                "nstate": ne,
                "pad_sites": pad,
                "phys_dims": [ne] + phys0,
            }
        self.nstate = len(states)
        nsite = len(states[0])
        if nsite % self.P != 0:
            raise ValueError("nsite must divide evenly into segments")
        self.m = nsite // self.P
        if self.m < 2:
            raise ValueError(
                "chain-parallel segments need >= 2 sites each "
                f"(got {nsite} sites over {self.P} devices)"
            )
        self.nsite = nsite
        self.config = config
        self.dtype = jnp.dtype(config.dtype)
        self.arnoldi = config.integrator == "arnoldi"
        phys = {int(c.shape[1]) for st in states for c in st}
        if len(phys) != 1:
            raise ValueError("SPMD sweep needs a uniform physical dim")
        self.n = phys.pop()
        if config.adaptive:
            # adaptive runs carry the live rank as a zero-mask inside a
            # fixed buffer capped at adaptive_Dmax (the masked-a1TDVP
            # convention, Config.adaptive_masked)
            self._dmax_cap = int(config.adaptive_Dmax)
        self.D = max(
            max(c.shape[0], c.shape[2]) for st in states for c in st
        )
        if config.adaptive:
            self.D = max(self.D, self._dmax_cap)
        fused = hamiltonian.fused_mpo([self.n] * nsite)
        self.pairs: tuple[Pair, ...] = tuple(
            (i, j)
            for i in range(self.nstate)
            for j in range(self.nstate)
            if fused[i][j] is not None
        )
        from pytdscf_tpu.parallel.chain import pad_cores, pad_mpo

        spec = NamedSharding(mesh, P(axis))
        self.W = []
        self.wqs = []
        for (i, j) in self.pairs:
            Ws = fused[i][j]
            w = max(max(wc.shape[0], wc.shape[-1]) for wc in Ws)
            self.wqs.append(w)
            self.W.append(
                jax.device_put(jnp.asarray(pad_mpo(Ws, w), self.dtype), spec)
            )
        self.W = tuple(self.W)
        self.wqs = tuple(self.wqs)

        # distribution state (1): seg 0 = ψB…B right-canonical, boundary
        # factors identity in 'plain' mode.  Odd segments are locally
        # left-canonicalised exactly as the in-process PITDVP does.
        core_arrs = []
        for st in states:
            stacked = np.asarray(pad_cores(st, self.D))
            for s in range(1, self.P, 2):
                lo, hi = s * self.m, (s + 1) * self.m - 1
                for p in range(lo, hi):
                    l, n, r = stacked[p].shape
                    mat = stacked[p].reshape(l * n, r)
                    q, rmat = np.linalg.qr(mat)
                    # dead-channel invariant: zero-pad columns must stay
                    # EXACTLY zero (LAPACK fills them with completions;
                    # see kernels._thin_qr) — trailing, so exact
                    live = (np.abs(mat).sum(axis=0) > 0)[: q.shape[1]]
                    q = q * live[None, :]
                    rmat = rmat * live[:, None]
                    a = np.zeros_like(stacked[p])
                    a[:, :, : q.shape[1]] = q.reshape(l, n, -1)
                    stacked[p] = a
                    stacked[p + 1] = np.einsum(
                        "kr,rns->kns",
                        np.pad(rmat, ((0, r - rmat.shape[0]), (0, 0))),
                        stacked[p + 1],
                    )
            core_arrs.append(
                jax.device_put(jnp.asarray(stacked, self.dtype), spec)
            )
        self.cores = tuple(core_arrs)
        sig0 = np.tile(np.eye(self.D, dtype=complex), (self.P, 1, 1))
        self.sig = tuple(
            jax.device_put(jnp.asarray(sig0, self.dtype), spec)
            for _ in range(self.nstate)
        )
        #: boundary mode convention AFTER k steps: k=0 all plain; k>=1 odd
        #: boundaries double, even plain (matches the serial PITDVP driver).
        self.nstep = 0
        self._step_first = None
        self._step_later = None
        self._obs_cache: dict = {}
        #: id(operator) → (operator, sharded padded MPO stack) for
        #: in-mesh arbitrary-operator expectations
        self._op_w_cache: dict = {}

    # -------------------------------------------------------------- step
    def propagate(
        self, dt: float, one_gate_to_apply=None, kraus_op=None
    ) -> None:
        if one_gate_to_apply is not None or kraus_op is not None:
            raise NotImplementedError(
                "gate/Kraus application is not supported under the "
                "chain-parallel sweep; run serial (no "
                "parallel_split_indices) for open-system channels"
            )
        scale = jnp.asarray(-0.5j * dt, self.dtype)
        first = self.nstep == 0
        fn = self._compiled(first)
        out = fn(self.cores, self.W, self.sig, scale)
        self.cores, self.sig = out
        self.nstep += 1

    def _compiled(self, first: bool):
        cached = self._step_first if first else self._step_later
        if cached is not None:
            return cached
        fn = _build_step(
            mesh=self.mesh,
            axis=self.axis,
            Pn=self.P,
            m=self.m,
            D=self.D,
            n=self.n,
            pairs=self.pairs,
            nstate=self.nstate,
            thresh=self.config.thresh_exp,
            max_dim=self.config.max_krylov,
            arnoldi=self.arnoldi,
            epsrho=self.config.epsrho,
            p_svd=max(self.config.adaptive_p_svd, 100.0 * self.config.epsrho),
            recenter_odd_first=first,
            adaptive=self.config.adaptive,
            dD=self.config.adaptive_dD,
            p_proj=self.config.adaptive_p_proj,
            prec=self.config.matvec_precision,
            relaxed=self.config.krylov_relaxed,
        )
        if first:
            self._step_first = fn
        else:
            self._step_later = fn
        return fn

    # ------------------------------------------------------- observables
    def _modes_double(self) -> bool:
        """True when odd boundaries are in double-centre mode."""
        return self.nstep > 0

    def to_serial_cores(self):
        """Gather + collapse boundary factors into plain core lists
        (the reference's gather-to-rank-0, ``_mps_parallel.py:1416``) —
        kept for checkpointing; observables do NOT use it."""
        sig_all = [
            np.asarray(jax.device_get(self.sig[i]))
            for i in range(self.nstate)
        ]
        # global (across-states) per-boundary regularisation anchors
        anchors = [
            max(np.linalg.norm(sig_all[i][b], 2)
                for i in range(self.nstate))
            for b in range(self.P)
        ]
        out_states = []
        for i in range(self.nstate):
            cores = np.asarray(jax.device_get(self.cores[i]))
            sig = sig_all[i]
            out = [cores[p] for p in range(self.nsite)]
            for b in range(1, self.P):
                X = sig[b]
                if self._modes_double() and b % 2 == 1:
                    u, s, vh = np.linalg.svd(X)
                    e = self.config.epsrho * max(anchors[b], _TINY)
                    s_inv = np.where(s > e, s / (s * s + e * e), 0.0)
                    X = (vh.conj().T * s_inv) @ u.conj().T
                pL = b * self.m - 1
                out[pL] = np.einsum("lnk,ka->lna", out[pL], X)
            out_states.append(out)
        if self._conv is not None:
            from pytdscf_tpu.operators.state_to_site import chain_to_states

            # undo bond padding on the pad-site tail (trailing pad sites
            # are (1, 1, 1) up to the zero-padded uniform shapes)
            chain = out_states[0]
            dims = self._conv["phys_dims"]
            npads = self._conv["pad_sites"]
            body = len(chain) - npads
            trimmed = []
            for p, c in enumerate(chain):
                d = dims[p] if p < body else 1
                trimmed.append(c[:, :d, :])
            states = chain_to_states(
                trimmed,
                self._conv["nstate"],
                pad_sites=npads,
                phys_dims=None,
            )
            return [_trim_dead_bonds(st) for st in states]
        out_states = [_trim_dead_bonds(st) for st in out_states]
        return out_states[0] if self._flat_input else out_states

    def _obs_fn(self, kind: str, **kw):
        key = (kind, self._modes_double(), tuple(sorted(kw.items())))
        fn = self._obs_cache.get(key)
        if fn is None:
            fn = _build_observable(
                kind, mesh=self.mesh, axis=self.axis, Pn=self.P, m=self.m,
                D=self.D, n=self.n, pairs=self.pairs, nstate=self.nstate,
                epsrho=self.config.epsrho, double=self._modes_double(),
                **kw,
            )
            self._obs_cache[key] = fn
        return fn

    def pop_states(self) -> list[float]:
        """Per-state ⟨Ψ_i|Ψ_i⟩ via the in-mesh matrix pipeline.

        State-to-site-converted engines project the electronic SITE
        instead (still in-mesh): pop_e = ⟨Ψ| |e⟩⟨e|₀ |Ψ⟩."""
        if self._conv is not None:
            fn = self._obs_fn("elec_pops", ne=self._conv["nstate"])
            out = fn(self.cores, self.sig)
            return [float(x) for x in np.asarray(jax.device_get(out))]
        fn = self._obs_fn("norm2")
        out = fn(self.cores, self.sig)
        return [float(x) for x in np.asarray(jax.device_get(out))]

    def norm(self) -> float:
        if self.config.space == "liouville":
            return abs(self.trace())
        return float(np.sqrt(sum(self.pop_states())))

    def autocorr(self) -> complex:
        """T/2-trick ⟨Ψ*|Ψ⟩ (unconjugated transfer), in-mesh."""
        fn = self._obs_fn("autocorr")
        re, im = fn(self.cores, self.sig)
        out = np.asarray(jax.device_get(re)) + 1j * np.asarray(
            jax.device_get(im)
        )
        return complex(np.sum(out))

    def trace(self, istate: int = 0) -> complex:
        fn = self._obs_fn("trace")
        re, im = fn(self.cores, self.sig)
        v = np.asarray(jax.device_get(re)) + 1j * np.asarray(
            jax.device_get(im)
        )
        return complex(v[istate])

    def expectation(self, operator=None) -> float:
        """⟨O⟩/‖Ψ‖² with sites sharded over the chain axis, for the
        Hamiltonian or any fused-MPO operator (reference in-place MPI
        expectations, ``_mps_parallel.py:855``).  Operators whose state
        structure cannot ride the converted chain fall back to a gathered
        serial contraction."""
        if operator is not None and operator is not self._orig_ham:
            Wop = self._operator_W(operator)
            if Wop is None:
                import logging

                logging.getLogger(__name__).warning(
                    "expectation(): operator MPO (nstate=%s) cannot map "
                    "onto this %s chain — falling back to a gathered "
                    "serial contraction (host transfer of the full MPS)",
                    getattr(operator, "nstate", 1),
                    "converted" if self._conv is not None else "plain",
                )
                return self._gather_engine().expectation(operator)
        else:
            Wop = self.W
        fn = self._obs_fn("expectation")
        re, im, n2 = fn(self.cores, Wop, self.sig)
        val = float(np.asarray(jax.device_get(re)).sum())
        den = float(np.asarray(jax.device_get(n2)).sum())
        return val / den

    def _operator_W(self, operator):
        """Sharded padded MPO stack for an arbitrary operator, matching
        the (possibly state-to-site-converted, site-padded) chain layout;
        None when the operator cannot be mapped (→ caller falls back)."""
        key = id(operator)
        hit = self._op_w_cache.get(key)
        if hit is not None and hit[0] is operator:
            return hit[1]
        try:
            if self._conv is not None:
                from pytdscf_tpu.operators.state_to_site import (
                    electronic_site_mpo,
                )

                ne = self._conv["nstate"]
                op_ns = getattr(operator, "nstate", 1)
                phys0 = self._conv["phys_dims"][1:]
                if op_ns == ne:
                    fused_ms = operator.fused_mpo(phys0)
                elif op_ns == 1:
                    # lift a single-state operator onto the converted
                    # chain as the |0⟩⟨0| block — exactly the serial
                    # engine's semantics (``tdvp.expectation`` iterates
                    # operator.nstate pairs, so a 1-state O measures
                    # state 0's component).  Users wanting O ⊗ 1_elec
                    # pass an ne-state block-diagonal operator.
                    cores_1 = operator.fused_mpo(phys0)[0][0]
                    if cores_1 is None:
                        return None
                    fused_ms = [
                        [
                            cores_1 if i == j == 0 else None
                            for j in range(ne)
                        ]
                        for i in range(ne)
                    ]
                else:
                    return None
                conv_op = electronic_site_mpo(
                    fused_ms, ne,
                    pad_sites=self._conv["pad_sites"],
                    phys_pad=self.n,
                )
                fused = conv_op.fused_mpo([self.n] * self.nsite)
            else:
                if getattr(operator, "nstate", 1) != 1:
                    return None
                fused = operator.fused_mpo([self.n] * self.nsite)
            Ws = fused[0][0]
            if Ws is None or len(Ws) != self.nsite:
                return None
        except (NotImplementedError, ValueError, KeyError):
            return None
        from pytdscf_tpu.parallel.chain import pad_mpo

        spec = NamedSharding(self.mesh, P(self.axis))
        w = max(max(wc.shape[0], wc.shape[-1]) for wc in Ws)
        Wop = (
            jax.device_put(jnp.asarray(pad_mpo(Ws, w), self.dtype), spec),
        )
        self._op_w_cache[key] = (operator, Wop)
        return Wop

    # ------------------------------------------- batched property fetches
    def fetch_real_dtype(self):
        """Real dtype for packed host fetches (``device_io.fetch_many``)."""
        return jnp.float32 if self.dtype == jnp.complex64 else jnp.float64

    def properties_submit(
        self,
        operator=None,
        *,
        autocorr: bool = True,
        energy: bool = True,
        norm: bool = True,
        populations: bool = True,
    ) -> tuple[list, list]:
        """Dispatch the requested in-mesh observables; NO host sync.

        The SPMD counterpart of ``mps/tdvp.py:properties_submit`` — all
        pipelines run as sharded collective programs and only the final
        per-state scalars are queued for one packed fetch (the driver
        batches several steps via ``Config.fetch_stride``)."""
        liouville = self.config.space == "liouville"
        items: list = []
        plan: list = []
        if energy:
            if operator is None or operator is self._orig_ham:
                Wop = self.W
            else:
                Wop = self._operator_W(operator)
                if Wop is None:
                    raise ValueError(
                        "operator cannot be mapped onto the converted "
                        "chain; use expectation() (gather fallback)"
                    )
            fn = self._obs_fn("expectation")
            re, _, n2 = fn(self.cores, Wop, self.sig)
            items += [re, n2]
            plan.append(("energy", 1))
        if autocorr:
            fn = self._obs_fn("autocorr")
            re, im = fn(self.cores, self.sig)
            items += [re, im]
            plan.append(("autocorr", 1))
        if populations or (norm and not liouville):
            if self._conv is not None:
                fn = self._obs_fn("elec_pops", ne=self._conv["nstate"])
            else:
                fn = self._obs_fn("norm2")
            items.append(fn(self.cores, self.sig))
            plan.append(("pops", 1))
        if norm and liouville:
            fn = self._obs_fn("trace")
            re, im = fn(self.cores, self.sig)
            items += [re, im]
            plan.append(("trace", 1))
        return items, plan

    def properties_resolve(
        self,
        vals: list,
        plan: list,
        *,
        norm: bool = True,
        populations: bool = True,
    ) -> dict:
        """Decode fetched values from :meth:`properties_submit`."""
        import math

        liouville = self.config.space == "liouville"
        out: dict = {}
        k = 0
        pops = None
        for kind, _ in plan:
            if kind == "energy":
                re, n2 = vals[k], vals[k + 1]
                k += 2
                out["energy"] = complex(
                    float(np.real(np.sum(re))) / float(np.real(np.sum(n2)))
                )
            elif kind == "autocorr":
                re, im = vals[k], vals[k + 1]
                k += 2
                out["autocorr"] = complex(
                    float(np.sum(np.real(re)))
                    + 1j * float(np.sum(np.real(im)))
                )
            elif kind == "pops":
                pops = [
                    float(np.real(x)) for x in np.atleast_1d(vals[k])
                ]
                k += 1
            elif kind == "trace":
                re, im = vals[k], vals[k + 1]
                k += 2
                re0 = float(np.atleast_1d(np.real(re))[0])
                im0 = float(np.atleast_1d(np.real(im))[0])
                out["trace"] = complex(re0 + 1j * im0)
        if populations:
            out["populations"] = pops
        if norm:
            out["norm"] = (
                abs(out["trace"]) if liouville
                else float(math.sqrt(sum(pops)))
            )
        return out

    def properties_bundle(
        self,
        operator=None,
        *,
        autocorr: bool = True,
        energy: bool = True,
        norm: bool = True,
        populations: bool = True,
    ) -> dict:
        """Requested per-step observables with ONE device→host sync."""
        from pytdscf_tpu.mps import device_io as dio

        items, plan = self.properties_submit(
            operator,
            autocorr=autocorr,
            energy=energy,
            norm=norm,
            populations=populations,
        )
        vals = dio.fetch_many(items, self.fetch_real_dtype())
        return self.properties_resolve(
            vals, plan, norm=norm, populations=populations
        )

    def to_numpy(self):
        """Checkpoint payload (user-level per-state core lists)."""
        return self.to_serial_cores()

    def _gather_engine(self):
        """Serial engine on the gathered state (observable fallback)."""
        from pytdscf_tpu.mps.tdvp import TDVPEngine

        out = self.to_serial_cores()
        states = [out] if self._flat_input else out
        eng = TDVPEngine(
            [list(st) for st in states], self._orig_ham, self.config
        )
        eng.right_canonicalize()
        return eng

    def bond_dims(self, istate: int = 0) -> list[int]:
        """Bond dims: live ranks under adaptive (in-mesh — the zero-mask
        rank lives in the data, so one jitted count over the sharded core
        stacks suffices; XLA inserts the one-site halo permute for the
        cross-segment row check), else the padded capacity."""
        if self.config.adaptive and self._conv is None:
            live = _live_bond_ranks(self.cores[istate])
            counts = np.asarray(jax.device_get(live))[:-1]
            return [max(int(x), 1) for x in counts]
        if self.config.adaptive:
            # converted chains report USER-level per-state bonds — those
            # only exist on the de-converted chain (gather)
            out = self.to_serial_cores()
            states = [out] if self._flat_input else out
            return [int(c.shape[2]) for c in states[istate][:-1]]
        nsite = (
            len(self._conv["phys_dims"]) if self._conv is not None
            else self.nsite
        )
        return [self.D] * (nsite - 1)

    def reduced_density(self, remain_nleg, istate: int = 0) -> np.ndarray:
        if self.config.space == "liouville":
            return self.reduced_density_liouville(remain_nleg, istate)
        kept = [p for p, n in enumerate(remain_nleg) if n > 0]
        if self._conv is not None and len(kept) in (1, 2):
            # state-resolved RDM on a state-to-site-converted chain:
            # |istate⟩⟨istate| projector at the electronic site (global
            # site 0) + the in-mesh kept-site machinery, sites shifted +1
            dims = self._conv["phys_dims"]
            gkept = [p + 1 for p in kept]
            if len(kept) == 1:
                fn = self._obs_fn(
                    "site_rdm", nkept=1, kept_sites=(gkept[0],),
                    istate=0, wstate=istate,
                )
                re, im = fn(self.cores, self.sig)
                rho = (
                    np.asarray(jax.device_get(re))
                    + 1j * np.asarray(jax.device_get(im))
                )[: dims[gkept[0]], : dims[gkept[0]]]
                if remain_nleg[kept[0]] == 1:
                    return np.real(np.diag(rho)).astype(rho.dtype)
                return rho
            fn = self._obs_fn(
                "site_rdm2", nkept=2, kept_sites=tuple(gkept),
                istate=0, wstate=istate,
            )
            re, im = fn(self.cores, self.sig)
            d1, d2 = dims[gkept[0]], dims[gkept[1]]
            out = (
                np.asarray(jax.device_get(re))
                + 1j * np.asarray(jax.device_get(im))
            )[:d1, :d1, :d2, :d2]
            if remain_nleg[kept[1]] == 1:
                out = np.einsum("abcc->abc", out)
            if remain_nleg[kept[0]] == 1:
                out = np.einsum("aa...->a...", out)
            return out
        if len(kept) == 1 and self._conv is None:
            # in-mesh single-site RDM (captured partial transfers)
            fn = self._obs_fn(
                "site_rdm", nkept=1, kept_sites=(kept[0],), istate=istate
            )
            re, im = fn(self.cores, self.sig)
            rho = (
                np.asarray(jax.device_get(re))
                + 1j * np.asarray(jax.device_get(im))
            )
            if remain_nleg[kept[0]] == 1:
                return np.real(np.diag(rho)).astype(rho.dtype)
            return rho
        if len(kept) == 2 and self._conv is None:
            # in-mesh two-site RDM (captured transfers + ride-along middle)
            fn = self._obs_fn(
                "site_rdm2", nkept=2, kept_sites=tuple(kept), istate=istate
            )
            re, im = fn(self.cores, self.sig)
            rho4 = (
                np.asarray(jax.device_get(re))
                + 1j * np.asarray(jax.device_get(im))
            )  # [ket_p, bra_p, ket_q, bra_q]
            out = rho4
            if remain_nleg[kept[1]] == 1:
                out = np.einsum("abcc->abc", out)
            if remain_nleg[kept[0]] == 1:
                out = np.einsum("aa...->a...", out)
            return out
        # in-mesh N-site RDM (ride-along batch opens legs at every
        # intermediate kept site) — plain and converted chains alike
        if self._conv is not None:
            dims = self._conv["phys_dims"]
            gkept = [p + 1 for p in kept]
            fn = self._obs_fn(
                "site_rdmn", nkept=len(kept), kept_sites=tuple(gkept),
                istate=0, wstate=istate,
            )
        else:
            dims = None
            gkept = list(kept)
            fn = self._obs_fn(
                "site_rdmn", nkept=len(kept), kept_sites=tuple(gkept),
                istate=istate,
            )
        re, im = fn(self.cores, self.sig)
        out = (
            np.asarray(jax.device_get(re))
            + 1j * np.asarray(jax.device_get(im))
        )
        if dims is not None:
            # converted chains pad every site to the stacked width n —
            # slice each kept leg pair back to its physical dimension
            out = out[tuple(
                slice(0, dims[g]) for g in gkept for _ in range(2)
            )]
        # diagonal extraction for nleg == 1 kept sites (right to left)
        ax = 0
        for p in kept:
            if remain_nleg[p] == 1:
                out = np.diagonal(out, axis1=ax, axis2=ax + 1)
                out = np.moveaxis(out, -1, ax)
                ax += 1
            else:
                ax += 2
        return out

    def reduced_density_liouville(
        self, remain_nleg: tuple[int, ...], istate: int = 0
    ) -> np.ndarray:
        """Tr_rest ρ with kept-site legs, computed from ONE in-mesh
        pipeline of d-traced transfer matrices segmented at the kept
        sites (bridge blocks) — only the few kept-site cores and the
        (nkept+1) bridge matrices cross to the host, never the chain.
        Output matches the serial engine's convention
        (``mps/tdvp.py:reduced_density_liouville``)."""
        import math

        legs = list(remain_nleg) + [0] * (self.nsite - len(remain_nleg))
        kept = [p for p, x in enumerate(legs) if x > 0]
        if not kept:
            raise ValueError("no kept legs")
        fn = self._obs_fn("rdm_bridges", nkept=len(kept),
                          kept_sites=tuple(kept), istate=istate)
        bre, bim, logs = fn(self.cores, self.sig)
        bridges = (
            np.asarray(jax.device_get(bre))
            + 1j * np.asarray(jax.device_get(bim))
        )
        logs = np.asarray(jax.device_get(logs))
        # kept cores: local shard fetches (few sites, never the chain)
        cores_i = np.asarray(
            jax.device_get(self.cores[istate][jnp.asarray(kept)])
        )
        e0 = np.zeros(self.D)
        e0[0] = 1.0
        acc = e0 @ bridges[0] * np.exp(logs[0])
        for t, p in enumerate(kept):
            acc = np.einsum("...l,lnr->...nr", acc, cores_i[t])
            acc = np.einsum(
                "...nl,lk->...nk", acc, bridges[t + 1]
            ) * np.exp(logs[t + 1])
        out = acc[..., 0]
        # reshape each kept d² leg to (d, d); nleg == 1 keeps the diagonal
        ds = [int(math.isqrt(self.n))] * len(kept)
        shape = []
        for d in ds:
            shape.extend([d, d])
        arrs = out.reshape(tuple(shape))
        ax = 0
        for p, d in zip(kept, ds):
            if legs[p] == 1:
                arrs = np.diagonal(arrs, axis1=ax, axis2=ax + 1)
                arrs = np.moveaxis(arrs, -1, ax)
                ax += 1
            else:
                ax += 2
        return arrs


# ------------------------------------------------------------ the program
def _build_step(
    *, mesh, axis, Pn, m, D, n, pairs, nstate, thresh, max_dim, arnoldi,
    epsrho, p_svd, recenter_odd_first, adaptive=False, dD=0, p_proj=0.0,
    prec="highest", relaxed=False,
):
    """Compile one full PITDVP time step as a single shard_map program."""

    evolve_sites = partial(
        _sites_evolve, pairs=pairs, thresh=thresh, max_dim=max_dim,
        arnoldi=arnoldi, prec=prec, relaxed=relaxed,
    )
    evolve_bonds = partial(
        _bonds_evolve, pairs=pairs, thresh=thresh, max_dim=max_dim,
        arnoldi=arnoldi, prec=prec, relaxed=relaxed,
    )

    # -------------------- pipelined EXACT boundary environments (per pair)
    def phase_envs(cores, Wseg, Xs, idx):
        """(Lb_q, lL_q, Rb_q, lR_q) for this device's segment.

        ``Xs``: per-state mode-resolved LEFT-boundary insertion of THIS
        device (identity on device 0).  Both directions pipeline
        (D, w, D) blocks around the ring for P rounds; each device
        captures the true prefix/suffix when it arrives.  Exact — no
        transfer operators, no lag."""
        dtype = cores[0].dtype
        rdt = cores[0].real.dtype
        to_right = [(i_, (i_ + 1) % Pn) for i_ in range(Pn)]
        to_left = [(i_, (i_ - 1) % Pn) for i_ in range(Pn)]
        Lb, lL, Rb, lR = [], [], [], []
        for q, (i, j) in enumerate(pairs):
            w = Wseg[q].shape[1]
            e0 = jnp.zeros((D, w, D), dtype).at[0, 0, 0].set(1.0)
            z = jnp.asarray(0.0, rdt)
            blkL, lgL = e0, z
            blkR, lgR = e0, z
            Lown, lLo = e0, z
            Rown, lRo = e0, z

            def foldL(blk, lg):
                def site(carry, cw):
                    b, l = carry
                    br, W_, kt = cw
                    nb, dl = _norm_log(K.renorm_block_left(b, br, W_, kt))
                    return (nb, l + dl), None

                (b2, l2), _ = jax.lax.scan(
                    site, (blk, lg), (cores[i], Wseg[q], cores[j])
                )
                return b2, l2

            def foldR(blk, lg):
                def site(carry, cw):
                    b, l = carry
                    br, W_, kt = cw
                    nb, dl = _norm_log(K.renorm_block_right(b, br, W_, kt))
                    return (nb, l + dl), None

                (b2, l2), _ = jax.lax.scan(
                    site, (blk, lg),
                    (cores[i][::-1], Wseg[q][::-1], cores[j][::-1]),
                )
                return b2, l2

            for r in range(Pn):
                # ---- L chain: insertion at own boundary, capture, fold
                ins = jnp.einsum(
                    "bo,bak,kp->oap", Xs[i].conj(), blkL, Xs[j],
                    precision=PREC,
                )
                ins, dl = _norm_log(ins)
                li = lgL + dl
                cap = idx == r
                Lown = jnp.where(cap, ins, Lown)
                lLo = jnp.where(cap, li, lLo)
                outL, loL = foldL(ins, li)
                blkL = jax.lax.ppermute(outL, axis, to_right)
                lgL = jax.lax.ppermute(loL, axis, to_right)
                # ---- R chain: capture on arrival (neighbour applied its
                # own-left insertion before sending), fold, insert, send
                capR = idx == (Pn - 1 - r)
                Rown = jnp.where(capR, blkR, Rown)
                lRo = jnp.where(capR, lgR, lRo)
                outR, loR = foldR(blkR, lgR)
                ins = jnp.einsum(
                    "ob,bak,pk->oap", Xs[i].conj(), outR, Xs[j],
                    precision=PREC,
                )
                ins, dl = _norm_log(ins)
                blkR = jax.lax.ppermute(ins, axis, to_left)
                lgR = jax.lax.ppermute(loR + dl, axis, to_left)
            Lb.append(Lown)
            lL.append(lLo)
            Rb.append(Rown)
            lR.append(lRo)
        return tuple(Lb), tuple(lL), tuple(Rb), tuple(lR)

    # ------------------------------------------------- within-segment sweep
    def renorm_all(Bs, logs, bras, Ws, kets, forward):
        newB, newl = [], []
        for q, (i, j) in enumerate(pairs):
            if forward:
                B = K.renorm_block_left(Bs[q], bras[i], Ws[q], kets[j])
            else:
                B = K.renorm_block_right(Bs[q], bras[i], Ws[q], kets[j])
            B, dl = _norm_log(B)
            newB.append(B)
            newl.append(logs[q] + dl)
        return tuple(newB), tuple(newl)

    def sweep_impl(cores, Wseg, Lb, lL, Rb, lR, scale, do_last, forward):
        cores = [
            [cores[i][p] for p in range(m)] for i in range(nstate)
        ]

        def Wp(p):
            return tuple(Wseg[q][p] for q in range(len(pairs)))

        def psis(p):
            return tuple(cores[i][p] for i in range(nstate))

        env = [((Rb, lR) if forward else (Lb, lL))]
        inner = range(m - 1, 0, -1) if forward else range(0, m - 1)
        for p in inner:
            B0, l0 = env[-1]
            env.append(
                renorm_all(B0, l0, psis(p), Wp(p), psis(p), not forward)
            )
        sysB, sysl = (Lb, lL) if forward else (Rb, lR)
        order = range(m) if forward else range(m - 1, -1, -1)
        for p in order:
            envB, envl = env.pop()
            last = p == (m - 1 if forward else 0)
            Ls, lLc = (sysB, sysl) if forward else (envB, envl)
            Rs, lRc = (envB, envl) if forward else (sysB, sysl)
            lsum = tuple(a + b for a, b in zip(lLc, lRc))
            if last:
                new = evolve_sites(Ls, Wp(p), Rs, psis(p), scale, lsum)
                for i in range(nstate):
                    cores[i][p] = jnp.where(do_last, new[i], cores[i][p])
                break
            if adaptive:
                # masked a1TDVP inside the segment: fixed-shape rank
                # enrichment + masked truncation (the serial engine's
                # Config.adaptive_masked flavor — mps/tdvp.py:346 — is
                # SPMD-ready by construction: no host syncs, no retraces)
                from pytdscf_tpu.mps.tdvp import _adaptive_masked_site

                nxt = p + 1 if forward else p - 1
                a_sites, psi_next, sysB, sysl, _kry = _adaptive_masked_site(
                    psis(p), psis(nxt), sysB, sysl, envB, envl, Wp(p),
                    scale, jnp.asarray(thresh), jnp.asarray(p_proj),
                    jnp.asarray(p_svd), pairs=pairs, nstate=nstate,
                    mode="prop", conserve_norm=False, arnoldi=arnoldi,
                    max_dim=max_dim, forward=forward, dD=dD,
                )
                for i in range(nstate):
                    cores[i][p] = a_sites[i]
                    cores[i][nxt] = psi_next[i]
                continue
            new = evolve_sites(Ls, Wp(p), Rs, psis(p), scale, lsum)
            sigs = []
            for i in range(nstate):
                if forward:
                    a, sg = K.qr_right_deadsafe(new[i])
                    cores[i][p] = a
                else:
                    sg, bc = K.lq_left_deadsafe(new[i])
                    cores[i][p] = bc
                sigs.append(sg)
            sysB, sysl = renorm_all(
                sysB, sysl, psis(p), Wp(p), psis(p), forward
            )
            if forward:
                ks = tuple(a + b for a, b in zip(sysl, envl))
                sigs = evolve_bonds(sysB, envB, tuple(sigs), scale, ks)
                for i in range(nstate):
                    cores[i][p + 1] = K.absorb_right(sigs[i], cores[i][p + 1])
            else:
                ks = tuple(a + b for a, b in zip(envl, sysl))
                sigs = evolve_bonds(envB, sysB, tuple(sigs), scale, ks)
                for i in range(nstate):
                    cores[i][p - 1] = K.absorb_left(cores[i][p - 1], sigs[i])
        out = tuple(jnp.stack(cores[i]) for i in range(nstate))
        return out, sysB, sysl

    def segment_sweep(cseg, Wseg, Lb, lL, Rb, lR, scale, is_fwd, do_last):
        args = (cseg, Wseg, Lb, lL, Rb, lR, scale, do_last)
        return jax.lax.cond(
            is_fwd,
            lambda a: sweep_impl(*a, forward=True),
            lambda a: sweep_impl(*a, forward=False),
            args,
        )

    # ------------------------------------------------- boundary joint update
    def joint(cL, WL, Lb2, lL2, cR, WR, Rb2, lR2, sig, scale):
        """Double-centre boundary: merge ψ σ⁺ ψ per state, evolve the pair
        + bond with all states stacked, SVD-split back to A σ' B with
        masked fixed-shape truncation (reference
        ``propagate_joint_two_sites``, ``_mps_parallel.py:270-470``).

        ``cL``/``cR``/``sig``: per-state tuples; ``Lb2``/``Rb2``: per-pair
        env tuples through everything left of pL / right of pR."""
        psiL, bRs = [], []
        # First-order-exact W expansion (pitdvp._merge_W): the raw
        # ψ_L σ⁺ ψ_R contraction PROJECTS onto σ's live channels, killing
        # the first-order amplitude that grew into σ-kernel channels
        # during the previous phase — measured as an exactly-halved
        # through-boundary transfer rate.  The expansion keeps dZ + dY
        # linearly; the pinv only touches the second-order cross term.
        from pytdscf_tpu.parallel.pitdvp import (
            _align_left,
            _align_right,
            _merge_W,
        )

        glob = jnp.asarray(0.0, jnp.float32)
        for i in range(nstate):
            glob = jnp.maximum(
                glob, jnp.max(jnp.diagonal(sig[i]).real).astype(jnp.float32)
            )
        for i in range(nstate):
            # σ's live channels define the boundary's physical content:
            # dead channels of the fixed-shape padded cores can carry
            # LAPACK-QR completion junk (the CPU backend does not keep
            # dead channels exactly zero the way the MGS/CholeskyQR TPU
            # kernels do), and the collapse/env insertions annihilate
            # them anyway — mask them out of the merge.
            lv = (jnp.abs(jnp.diagonal(sig[i])) > 0).astype(cL[i].dtype)
            A, Z = K.qr_right_deadsafe(cL[i] * lv[None, None, :])
            Y, B = K.lq_left_deadsafe(cR[i] * lv[:, None, None])
            A = A * lv[None, None, :]
            Z = Z * lv[:, None] * lv[None, :]
            Y = Y * lv[:, None] * lv[None, :]
            B = B * lv[:, None, None]
            A, Z = _align_left(A, Z)
            Y, B = _align_right(Y, B)
            Wm = _merge_W(Z, Y, sig[i], glob, epsrho)
            psiL.append(
                jnp.einsum("lnk,km->lnm", A, Wm, precision=PREC)
            )
            bRs.append(B)
        RbL, dlr = renorm_all(Rb2, lR2, tuple(bRs), WR, tuple(bRs), False)
        ls = tuple(a + b for a, b in zip(lL2, dlr))
        psiL = evolve_sites(Lb2, WL, RbL, tuple(psiL), scale, ls)

        def heff_once(Ls_, Ws_, Rs_, psis_, lsums_):
            # one H_eff application (enrichment residual source)
            out = [jnp.zeros_like(p) for p in psis_]
            for q, ((i_, j_), L_, W_, R_) in enumerate(
                zip(pairs, Ls_, Ws_, Rs_)
            ):
                out[i_] = out[i_] + K.heff_apply(
                    L_, W_, R_, psis_[j_], "highest"
                ) * jnp.exp(lsums_[q]).astype(psis_[j_].dtype)
            return tuple(out)

        # Boundary-bond rank enrichment (adaptive runs): the lv masking
        # above deliberately annihilates σ-kernel channels (junk-leak
        # fix), which ALSO forbids the boundary bond from ever growing —
        # measured as a threshold-INSENSITIVE Δρ ~9e-4 floor with the
        # boundary rank stuck at its initial value
        # (scripts/adaptive_spmd_accuracy.py, round 5).  The reference's
        # joint grows this bond through the same a1TDVP expansion it uses
        # serially (`get_superblock_full(delta_rank=dD)`,
        # `_mps_parallel.py:318`); mirror it here: install projection-
        # residual directions into free slots of BOTH split frames, and
        # let the two bond evolutions populate them.
        enrich = adaptive and dD > 0
        hL = (
            heff_once(Lb2, WL, RbL, tuple(psiL), ls) if enrich else None
        )
        aLs, sigs = [], []
        for i in range(nstate):
            a, sg = K.qr_right_deadsafe(psiL[i])
            if enrich:
                l_, n_, r_ = psiL[i].shape
                qm = K.enrich_qr(
                    a.reshape(l_ * n_, -1),
                    hL[i].reshape(l_ * n_, r_),
                    dD, p_proj,
                )
                a = qm.reshape(l_, n_, -1)
            aLs.append(a)
            sigs.append(sg)
        LbB, dll = renorm_all(Lb2, lL2, tuple(aLs), WL, tuple(aLs), True)
        ks = tuple(a + b for a, b in zip(dll, dlr))
        sigs = evolve_bonds(LbB, RbL, tuple(sigs), scale, ks)
        psiR = tuple(
            K.absorb_right(sigs[i], bRs[i]) for i in range(nstate)
        )
        ls2 = tuple(a + b for a, b in zip(dll, lR2))
        psiR = evolve_sites(LbB, WR, Rb2, psiR, scale, ls2)
        hR = (
            heff_once(LbB, WR, Rb2, tuple(psiR), ls2) if enrich else None
        )
        sg2s, bcs = [], []
        for i in range(nstate):
            sg2, bc = K.lq_left_deadsafe(psiR[i])
            if enrich:
                l_, n_, r_ = psiR[i].shape
                qm = K.enrich_qr(
                    jnp.transpose(bc, (2, 1, 0)).reshape(r_ * n_, -1),
                    jnp.transpose(hR[i], (2, 1, 0)).reshape(r_ * n_, l_),
                    dD, p_proj,
                )
                bc = jnp.transpose(
                    qm.reshape(r_, n_, -1), (2, 1, 0)
                )
            sg2s.append(sg2)
            bcs.append(bc)
        RbN, dlr2 = renorm_all(Rb2, lR2, tuple(bcs), WR, tuple(bcs), False)
        ks2 = tuple(a + b for a, b in zip(dll, dlr2))
        sg2s = evolve_bonds(LbB, RbN, tuple(sg2s), scale, ks2)
        newL, newR, news = [], [], []
        svds = [jnp.linalg.svd(sg2s[i], full_matrices=False)
                for i in range(nstate)]
        # global (across-states) truncation anchor — see _sig_anchor
        s_glob = svds[0][1][0]
        for sv in svds[1:]:
            s_glob = jnp.maximum(s_glob, sv[1][0])
        for i in range(nstate):
            u, s, vh = svds[i]
            mask = s > p_svd * jnp.maximum(s_glob, _TINY)
            # never drop the leading channel (fixed-shape analog of
            # keep>=1 in pitdvp): a state below the global cut keeps its
            # leading channel AT ITS NOISE VALUE — exact σ⁺σ = P keeps
            # the cross-state boundary envs healthy at any σ scale,
            # whereas a zeroed σ permanently disconnects the state.
            mask = mask.at[0].set(True)
            mc = mask.astype(u.dtype)
            newL.append(jnp.einsum(
                "lnk,km->lnm", aLs[i], u * mc[None, :], precision=PREC
            ))
            newR.append(jnp.einsum(
                "mk,knr->mnr", vh * mc[:, None], bcs[i], precision=PREC
            ))
            news.append(jnp.diag((s * mask).astype(u.dtype)))
        return tuple(newL), tuple(newR), tuple(news)

    def joint_phase(cseg, Wseg, sig_own, sysB, sysl, scale,
                    left_mask, right_mask):
        """Exchange edge data with neighbours, run this device's joint.

        ``sysB``/``sysl``: this device's sweep-end system blocks — for a
        LEFT-role device these are the envs through its first m−1 sites
        (Lb2); for a RIGHT-role device through its last m−1 sites (Rb2)."""
        to_left = [(i_, (i_ - 1) % Pn) for i_ in range(Pn)]
        to_right = [(i_, (i_ + 1) % Pn) for i_ in range(Pn)]
        # right-role payload travels LEFT to the pair's left device; the
        # left-role payload travels RIGHT.
        c0_r = tuple(
            jax.lax.ppermute(cseg[i][0], axis, to_left)
            for i in range(nstate)
        )
        W0_r = tuple(
            jax.lax.ppermute(Wseg[q][0], axis, to_left)
            for q in range(len(pairs))
        )
        Rb2_r = tuple(
            jax.lax.ppermute(sysB[q], axis, to_left)
            for q in range(len(pairs))
        )
        lR2_r = tuple(
            jax.lax.ppermute(sysl[q], axis, to_left)
            for q in range(len(pairs))
        )
        sig_r = tuple(
            jax.lax.ppermute(sig_own[i], axis, to_left)
            for i in range(nstate)
        )
        cm_l = tuple(
            jax.lax.ppermute(cseg[i][m - 1], axis, to_right)
            for i in range(nstate)
        )
        Wm_l = tuple(
            jax.lax.ppermute(Wseg[q][m - 1], axis, to_right)
            for q in range(len(pairs))
        )
        Lb2_l = tuple(
            jax.lax.ppermute(sysB[q], axis, to_right)
            for q in range(len(pairs))
        )
        lL2_l = tuple(
            jax.lax.ppermute(sysl[q], axis, to_right)
            for q in range(len(pairs))
        )

        def as_left(_):
            cL = tuple(cseg[i][m - 1] for i in range(nstate))
            WL = tuple(Wseg[q][m - 1] for q in range(len(pairs)))
            newL, newR, news = joint(
                cL, WL, sysB, sysl, c0_r, W0_r, Rb2_r, lR2_r, sig_r, scale,
            )
            return (
                newL,
                tuple(cseg[i][0] for i in range(nstate)),
                sig_own,
            )

        def as_right(_):
            cR = tuple(cseg[i][0] for i in range(nstate))
            WR = tuple(Wseg[q][0] for q in range(len(pairs)))
            newL, newR, news = joint(
                cm_l, Wm_l, Lb2_l, lL2_l, cR, WR, sysB, sysl, sig_own,
                scale,
            )
            return (
                tuple(cseg[i][m - 1] for i in range(nstate)),
                newR,
                news,
            )

        res = jax.lax.cond(left_mask, as_left, as_right, None)
        active = left_mask | right_mask
        out_cores, out_sig = [], []
        for i in range(nstate):
            new_last = jnp.where(
                active & left_mask, res[0][i], cseg[i][m - 1]
            )
            new_first = jnp.where(
                active & right_mask, res[1][i], cseg[i][0]
            )
            out_cores.append(
                cseg[i].at[m - 1].set(new_last).at[0].set(new_first)
            )
            out_sig.append(
                jnp.where(active & right_mask, res[2][i], sig_own[i])
            )
        return tuple(out_cores), tuple(out_sig)

    # --------------------------------------------------------- full step
    def local_step(cseg, Wseg, sig_states, scale):
        idx = jax.lax.axis_index(axis)
        sig_own = tuple(s[0] for s in sig_states)
        is_even = idx % 2 == 0
        eye = jnp.eye(D, dtype=cseg[0].dtype)
        to_left = [(i_, (i_ - 1) % Pn) for i_ in range(Pn)]

        def recenter(cseg, sig_own, which):
            """Multiply σ into the boundary-adjacent cores.

            ``which``: 'odd' — only odd boundaries; 'all' — every interior
            boundary (phase-2 start)."""
            out = []
            for i in range(nstate):
                sig_right = jax.lax.ppermute(sig_own[i], axis, to_left)
                if which == "odd":
                    first_on = (idx % 2 == 1)
                    last_on = (idx % 2 == 0) & (idx < Pn - 1)
                else:
                    first_on = idx > 0
                    last_on = idx < Pn - 1
                c0 = jnp.einsum(
                    "km,mnr->knr", sig_own[i], cseg[i][0], precision=PREC
                )
                cm = jnp.einsum(
                    "lnk,km->lnm", cseg[i][m - 1], sig_right,
                    precision=PREC,
                )
                ci = cseg[i].at[0].set(jnp.where(first_on, c0, cseg[i][0]))
                ci = ci.at[m - 1].set(
                    jnp.where(last_on, cm, cseg[i][m - 1])
                )
                out.append(ci)
            return tuple(out)

        def x_own(all_double):
            """Per-state mode-resolved left-boundary insertion."""
            out = []
            anchor = _sig_anchor(sig_own)
            for i in range(nstate):
                Xd = _pinv(sig_own[i], epsrho, anchor=anchor)
                X = Xd if all_double else jnp.where(
                    idx % 2 == 1, Xd, sig_own[i]
                )
                out.append(jnp.where(idx == 0, eye, X))
            return tuple(out)

        # ---- phase 1: recentre odd, inward sweeps, odd joints
        if recenter_odd_first:
            cseg = recenter(cseg, sig_own, "odd")
        X1 = x_own(all_double=False)
        Lb, lL, Rb, lR = phase_envs(cseg, Wseg, X1, idx)
        cseg, sysB, sysl = segment_sweep(
            cseg, Wseg, Lb, lL, Rb, lR, scale,
            is_fwd=is_even, do_last=jnp.asarray(False),
        )
        cseg, sig_own = joint_phase(
            cseg, Wseg, sig_own, sysB, sysl, scale,
            left_mask=is_even & (idx < Pn - 1),
            right_mask=(~is_even) & (idx > 0),
        )

        # ---- phase 2: recentre all, outward sweeps, even joints
        cseg = recenter(cseg, sig_own, "all")
        X2 = x_own(all_double=True)
        Lb, lL, Rb, lR = phase_envs(cseg, Wseg, X2, idx)
        at_edge = ((idx == 0) & is_even) | ((idx == Pn - 1) & ~is_even)
        cseg, sysB, sysl = segment_sweep(
            cseg, Wseg, Lb, lL, Rb, lR, scale,
            is_fwd=~is_even, do_last=at_edge,
        )
        cseg, sig_own = joint_phase(
            cseg, Wseg, sig_own, sysB, sysl, scale,
            left_mask=(idx % 2 == 1) & (idx < Pn - 1),
            right_mask=(idx % 2 == 0) & (idx > 0),
        )
        return cseg, tuple(s[None] for s in sig_own)

    npair = len(pairs)
    fn = _shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            (P(axis),) * nstate,
            (P(axis),) * npair,
            (P(axis),) * nstate,
            P(),
        ),
        out_specs=((P(axis),) * nstate, (P(axis),) * nstate),
        check_vma=False,
    )
    return jax.jit(fn)


# ------------------------------------------------------- observable builds
def _build_observable(
    kind, *, mesh, axis, Pn, m, D, n, pairs, nstate, epsrho, double,
    nkept=0, kept_sites=(), istate=0, ne=0, wstate=-1,
):
    """In-mesh observables: pipelined exact contractions over the ring.

    All pipelines carry log-scales; boundary σ/σ⁺ insertions are resolved
    from the (host-tracked, deterministic) mode convention ``double``."""

    def x_of(sig_own, idx, i):
        """Mode-resolved own-left insertion for state i."""
        Xd = _pinv(sig_own[i], epsrho, anchor=_sig_anchor(sig_own))
        X = Xd if double else sig_own[i]
        if double:
            X = jnp.where(idx % 2 == 1, Xd, sig_own[i])
        eye = jnp.eye(D, dtype=X.dtype)
        return jnp.where(idx == 0, eye, X)

    to_right = [(i_, (i_ + 1) % Pn) for i_ in range(Pn)]

    def ring(fold, state0, idx):
        """P rounds: apply own insertion+segment via ``fold``, permute.

        ``fold(state) -> state`` must include the own-boundary insertion.
        Returns the full-chain fold as it arrives back at device 0."""
        st = state0
        for r in range(Pn):
            st = fold(st)
            st = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, to_right), st
            )
        # after P rounds the complete fold sits on device 0
        out = jax.tree_util.tree_map(
            lambda x: jnp.where(idx == 0, x, jnp.zeros_like(x)), st
        )
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis), out
        )

    if kind == "norm2":

        def local(cores, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            outs = []
            for i in range(nstate):
                X = x_of(sig_own, idx, i)

                def fold(st):
                    S, lg = st
                    S = jnp.einsum(
                        "bk,bo,kp->op", S, X.conj(), X, precision=PREC
                    )
                    S, dl = _norm_log(S)

                    def site(carry, c):
                        S_, l_ = carry
                        nS = K.ovlp_left_conj(S_, c, c)
                        nS, d_ = _norm_log(nS)
                        return (nS, l_ + d_), None

                    (S, lg2), _ = jax.lax.scan(
                        site, (S, lg + dl), cores[i]
                    )
                    return S, lg2

                e = jnp.zeros((D, D), cores[i].dtype).at[0, 0].set(1.0)
                S, lg = ring(fold, (e, jnp.asarray(0.0, jnp.float32)), idx)
                outs.append(S[0, 0].real * jnp.exp(lg))
            return jnp.stack(outs)

        spec_in = ((P(axis),) * nstate, (P(axis),) * nstate)
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in, out_specs=P(),
            check_vma=False,
        ))

    if kind == "elec_pops":
        # ⟨Ψ| |e⟩⟨e| at global site 0 |Ψ⟩ for e < ne — the electronic-site
        # populations of a state-to-site-converted chain, in-mesh.

        def local(cores, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            X = x_of(sig_own, idx, 0)
            gsites = idx * m + jnp.arange(m)
            outs = []
            for e in range(ne):
                onehot = (jnp.arange(n) == e).astype(jnp.float32)
                wv_sites = jnp.where(
                    (gsites == 0)[:, None],
                    onehot[None, :],
                    jnp.ones((1, n), jnp.float32),
                )

                def fold(st):
                    S, lg = st
                    S = jnp.einsum(
                        "bk,bo,kp->op", S, X.conj(), X, precision=PREC
                    )
                    S, dl = _norm_log(S)

                    def site(carry, cw):
                        S_, l_ = carry
                        c, wv = cw
                        nS = jnp.einsum(
                            "bk,bno,n,knp->op", S_, c.conj(),
                            wv.astype(c.dtype), c, precision=PREC,
                        )
                        nS, d_ = _norm_log(nS)
                        return (nS, l_ + d_), None

                    (S, lg2), _ = jax.lax.scan(
                        site, (S, lg + dl), (cores[0], wv_sites)
                    )
                    return S, lg2

                e0 = jnp.zeros((D, D), cores[0].dtype).at[0, 0].set(1.0)
                S, lg = ring(fold, (e0, jnp.asarray(0.0, jnp.float32)), idx)
                outs.append(S[0, 0].real * jnp.exp(lg))
            return jnp.stack(outs)

        spec_in = ((P(axis),) * nstate, (P(axis),) * nstate)
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in, out_specs=P(),
            check_vma=False,
        ))

    if kind == "autocorr":

        def local(cores, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            res, ims = [], []
            for i in range(nstate):
                X = x_of(sig_own, idx, i)

                def fold(st):
                    S, lg = st
                    S = jnp.einsum(
                        "bk,bo,kp->op", S, X, X, precision=PREC
                    )
                    S, dl = _norm_log(S)

                    def site(carry, c):
                        S_, l_ = carry
                        nS = K.ovlp_left_noconj(S_, c, c)
                        nS, d_ = _norm_log(nS)
                        return (nS, l_ + d_), None

                    (S, lg2), _ = jax.lax.scan(
                        site, (S, lg + dl), cores[i]
                    )
                    return S, lg2

                e = jnp.zeros((D, D), cores[i].dtype).at[0, 0].set(1.0)
                S, lg = ring(fold, (e, jnp.asarray(0.0, jnp.float32)), idx)
                v = S[0, 0] * jnp.exp(lg).astype(S.dtype)
                res.append(v.real)
                ims.append(v.imag)
            return jnp.stack(res), jnp.stack(ims)

        spec_in = ((P(axis),) * nstate, (P(axis),) * nstate)
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in, out_specs=(P(), P()),
            check_vma=False,
        ))

    if kind == "trace":
        import math

        d = int(math.isqrt(n))

        def local(cores, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            res, ims = [], []
            wvec = jnp.eye(d).reshape(-1).astype(cores[0].dtype)
            for i in range(nstate):
                X = x_of(sig_own, idx, i)

                def fold(st):
                    S, lg = st
                    S = S @ X
                    S, dl = _norm_log(S)

                    def site(carry, c):
                        S_, l_ = carry
                        nS = jnp.einsum(
                            "l,lnr,n->r", S_, c, wvec, precision=PREC
                        )
                        nS, d_ = _norm_log(nS)
                        return (nS, l_ + d_), None

                    (S, lg2), _ = jax.lax.scan(
                        site, (S, lg + dl), cores[i]
                    )
                    return S, lg2

                e = jnp.zeros((D,), cores[i].dtype).at[0].set(1.0)
                S, lg = ring(fold, (e, jnp.asarray(0.0, jnp.float32)), idx)
                v = S[0] * jnp.exp(lg).astype(S.dtype)
                res.append(v.real)
                ims.append(v.imag)
            return jnp.stack(res), jnp.stack(ims)

        spec_in = ((P(axis),) * nstate, (P(axis),) * nstate)
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in, out_specs=(P(), P()),
            check_vma=False,
        ))

    if kind == "expectation":

        def local(cores, Ws, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            val_re = jnp.asarray(0.0, jnp.float64 if cores[0].dtype ==
                                 jnp.complex128 else jnp.float32)
            val_im = val_re
            for q, (i, j) in enumerate(pairs):
                Xi = x_of(sig_own, idx, i)
                Xj = x_of(sig_own, idx, j)
                w = Ws[q].shape[1]

                def fold(st):
                    B, lg = st
                    B = jnp.einsum(
                        "bo,bak,kp->oap", Xi.conj(), B, Xj, precision=PREC
                    )
                    B, dl = _norm_log(B)

                    def site(carry, cw):
                        B_, l_ = carry
                        br, W_, kt = cw
                        nB = K.renorm_block_left(B_, br, W_, kt)
                        nB, d_ = _norm_log(nB)
                        return (nB, l_ + d_), None

                    (B, lg2), _ = jax.lax.scan(
                        site, (B, lg + dl), (cores[i], Ws[q], cores[j])
                    )
                    return B, lg2

                e = jnp.zeros((D, w, D), cores[i].dtype)
                e = e.at[0, 0, 0].set(1.0)
                B, lg = ring(fold, (e, jnp.asarray(0.0, jnp.float32)), idx)
                v = B[0, 0, 0] * jnp.exp(lg).astype(B.dtype)
                val_re = val_re + v.real
                val_im = val_im + v.imag
            # norm² over states rides the same program
            n2 = jnp.asarray(0.0, val_re.dtype)
            for i in range(nstate):
                X = x_of(sig_own, idx, i)

                def fold(st):
                    S, lg = st
                    S = jnp.einsum(
                        "bk,bo,kp->op", S, X.conj(), X, precision=PREC
                    )
                    S, dl = _norm_log(S)

                    def site(carry, c):
                        S_, l_ = carry
                        nS = K.ovlp_left_conj(S_, c, c)
                        nS, d_ = _norm_log(nS)
                        return (nS, l_ + d_), None

                    (S, lg2), _ = jax.lax.scan(
                        site, (S, lg + dl), cores[i]
                    )
                    return S, lg2

                e = jnp.zeros((D, D), cores[i].dtype).at[0, 0].set(1.0)
                S, lg = ring(fold, (e, jnp.asarray(0.0, jnp.float32)), idx)
                n2 = n2 + S[0, 0].real * jnp.exp(lg)
            return val_re, val_im, n2

        npair = len(pairs)
        spec_in = (
            (P(axis),) * nstate, (P(axis),) * npair, (P(axis),) * nstate
        )
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in, out_specs=(P(), P(), P()),
            check_vma=False,
        ))

    if kind == "site_rdm":
        # Hilbert-space one-site RDM ρ[n,n'] at global site ``kept_sites[0]``,
        # in-mesh: captured LEFT/RIGHT partial double-layer transfers at the
        # owning device (phase_envs capture convention) + one local einsum +
        # psum.  No gather of the chain.
        kept = kept_sites[0]
        kd, kt = divmod(kept, m)

        def local(cores, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            X = x_of(sig_own, idx, istate)
            dtype = cores[istate].dtype
            to_right = [(i_, (i_ + 1) % Pn) for i_ in range(Pn)]
            to_left = [(i_, (i_ - 1) % Pn) for i_ in range(Pn)]
            e = jnp.zeros((D, D), dtype).at[0, 0].set(1.0)
            z = jnp.asarray(0.0, cores[istate].real.dtype)
            ts = jnp.arange(m)
            # wstate ≥ 0: |wstate⟩⟨wstate| projector at GLOBAL site 0 —
            # the state-resolved RDM of a state-to-site-converted chain
            # (the electronic site routes direct-sum state blocks)
            wvs = jnp.where(
                ((idx * m + ts) == 0)[:, None] & (wstate >= 0),
                (jnp.arange(n) == wstate).astype(jnp.float32)[None, :],
                jnp.ones((1, n), jnp.float32),
            )

            # ---- left chain with capture at (kd, kt)
            S, lg = e, z
            capL, clgL = e, z
            for r in range(Pn):
                S2 = jnp.einsum(
                    "bk,bo,kp->op", S, X.conj(), X, precision=PREC
                )
                S2, dl = _norm_log(S2)
                lg2 = lg + dl
                cap_round = (idx == r) & (idx == kd)

                def siteL(carry, cw):
                    S_, l_, cS, cl = carry
                    c, t, wv = cw
                    hit = cap_round & (t == kt)
                    cS = jnp.where(hit, S_, cS)
                    cl = jnp.where(hit, l_, cl)
                    nS = jnp.einsum(
                        "bk,bno,n,knp->op", S_, c.conj(),
                        wv.astype(c.dtype), c, precision=PREC,
                    )
                    nS, d_ = _norm_log(nS)
                    return (nS, l_ + d_, cS, cl), None

                (S3, lg3, capL, clgL), _ = jax.lax.scan(
                    siteL, (S2, lg2, capL, clgL), (cores[istate], ts, wvs)
                )
                S = jax.lax.ppermute(S3, axis, to_right)
                lg = jax.lax.ppermute(lg3, axis, to_right)

            # ---- right chain with capture at (kd, kt)
            S, lg = e, z
            capR, clgR = e, z
            for r in range(Pn):
                cap_round = (idx == (Pn - 1 - r)) & (idx == kd)

                def siteR(carry, cw):
                    S_, l_, cS, cl = carry
                    c, t = cw
                    hit = cap_round & (t == kt)
                    cS = jnp.where(hit, S_, cS)
                    cl = jnp.where(hit, l_, cl)
                    nS = jnp.einsum(
                        "bno,knp,op->bk", c.conj(), c, S_,
                        precision=PREC,
                    )
                    nS, d_ = _norm_log(nS)
                    return (nS, l_ + d_, cS, cl), None

                (S2, lg2, capR, clgR), _ = jax.lax.scan(
                    siteR, (S, lg, capR, clgR),
                    (cores[istate][::-1], ts[::-1]),
                )
                ins = jnp.einsum(
                    "bo,bk,pk->op", X.conj(), S2, X, precision=PREC
                )
                ins, dl = _norm_log(ins)
                S = jax.lax.ppermute(ins, axis, to_left)
                lg = jax.lax.ppermute(lg2 + dl, axis, to_left)

            ck = cores[istate][kt]
            # rho[ket, bra] — the serial engine's leg order
            rho = jnp.einsum(
                "bk,bno,kmp,op->mn", capL, ck.conj(), ck, capR,
                precision=PREC,
            ) * jnp.exp(clgL + clgR).astype(dtype)
            rho = jnp.where(idx == kd, rho, jnp.zeros_like(rho))
            rho = jax.lax.psum(rho, axis)
            return rho.real, rho.imag

        spec_in = ((P(axis),) * nstate, (P(axis),) * nstate)
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in, out_specs=(P(), P()),
            check_vma=False,
        ))

    if kind == "site_rdm2":
        # Hilbert-space TWO-site RDM ρ[ket_p, bra_p, ket_q, bra_q] at
        # global sites p < q, fully in-mesh: captured left transfer at p,
        # captured right transfer at q (both as in ``site_rdm``), and a
        # ride-along middle pass — the open (ket_p, bra_p) legs travel as
        # a batch axis of the double-layer transfer from p to q, crossing
        # device boundaries by ppermute and picking up each crossed
        # device's boundary insertion.  Matches the serial engine's leg
        # order (``mps/tdvp.py:reduced_density``); zero host-side gather.
        p_glob, q_glob = kept_sites
        pd, pt = divmod(p_glob, m)
        qd, qt = divmod(q_glob, m)
        rq = qd - pd  # static: devices the middle pass crosses

        def local(cores, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            X = x_of(sig_own, idx, istate)
            dtype = cores[istate].dtype
            to_right = [(i_, (i_ + 1) % Pn) for i_ in range(Pn)]
            to_left = [(i_, (i_ - 1) % Pn) for i_ in range(Pn)]
            e = jnp.zeros((D, D), dtype).at[0, 0].set(1.0)
            z = jnp.asarray(0.0, cores[istate].real.dtype)
            ts = jnp.arange(m)
            # optional |wstate⟩⟨wstate| projector at global site 0 (the
            # electronic site of a state-to-site-converted chain)
            wvs = jnp.where(
                ((idx * m + ts) == 0)[:, None] & (wstate >= 0),
                (jnp.arange(n) == wstate).astype(jnp.float32)[None, :],
                jnp.ones((1, n), jnp.float32),
            )

            # ---- left chain, capture before site (pd, pt)
            S, lg = e, z
            capL, clgL = e, z
            for r in range(Pn):
                S2 = jnp.einsum(
                    "bk,bo,kp->op", S, X.conj(), X, precision=PREC
                )
                S2, dl = _norm_log(S2)
                lg2 = lg + dl
                cap_round = (idx == r) & (idx == pd)

                def siteL(carry, cw):
                    S_, l_, cS, cl = carry
                    c, t, wv = cw
                    hit = cap_round & (t == pt)
                    cS = jnp.where(hit, S_, cS)
                    cl = jnp.where(hit, l_, cl)
                    nS = jnp.einsum(
                        "bk,bno,n,knp->op", S_, c.conj(),
                        wv.astype(c.dtype), c, precision=PREC,
                    )
                    nS, d_ = _norm_log(nS)
                    return (nS, l_ + d_, cS, cl), None

                (S3, lg3, capL, clgL), _ = jax.lax.scan(
                    siteL, (S2, lg2, capL, clgL), (cores[istate], ts, wvs)
                )
                S = jax.lax.ppermute(S3, axis, to_right)
                lg = jax.lax.ppermute(lg3, axis, to_right)

            # ---- right chain, capture after site (qd, qt)
            S, lg = e, z
            capR, clgR = e, z
            for r in range(Pn):
                cap_round = (idx == (Pn - 1 - r)) & (idx == qd)

                def siteR(carry, cw):
                    S_, l_, cS, cl = carry
                    c, t = cw
                    hit = cap_round & (t == qt)
                    cS = jnp.where(hit, S_, cS)
                    cl = jnp.where(hit, l_, cl)
                    nS = jnp.einsum(
                        "bno,knp,op->bk", c.conj(), c, S_,
                        precision=PREC,
                    )
                    nS, d_ = _norm_log(nS)
                    return (nS, l_ + d_, cS, cl), None

                (S2, lg2, capR, clgR), _ = jax.lax.scan(
                    siteR, (S, lg, capR, clgR),
                    (cores[istate][::-1], ts[::-1]),
                )
                ins = jnp.einsum(
                    "bo,bk,pk->op", X.conj(), S2, X, precision=PREC
                )
                ins, dl = _norm_log(ins)
                S = jax.lax.ppermute(ins, axis, to_left)
                lg = jax.lax.ppermute(lg2 + dl, axis, to_left)

            # ---- middle ride-along: M[(ket_p, bra_p), bra_bond, ket_bond]
            cp = cores[istate][pt]
            M0 = jnp.einsum(
                "bk,bno,kmp->mnop", capL, cp.conj(), cp, precision=PREC
            ).reshape(n * n, D, D)
            M = jnp.where(idx == pd, M0, jnp.zeros_like(M0))
            M, dl0 = _norm_log(M)
            lgM = jnp.where(idx == pd, clgL + dl0, z)
            rho4 = jnp.zeros((n, n, n, n), dtype)
            for s in range(rq + 1):
                active = idx == pd + s
                if s > 0:
                    # crossed a device boundary: its own-left insertion
                    Mx = jnp.einsum(
                        "xop,oa,pb->xab", M, X.conj(), X, precision=PREC
                    )
                    Mx, dlx = _norm_log(Mx)
                    M = jnp.where(active, Mx, M)
                    lgM = lgM + jnp.where(active, dlx, z)

                def siteM(carry, cw):
                    M_, l_ = carry
                    c, t = cw
                    g = idx * m + t
                    apply = active & (g > p_glob) & (g < q_glob)
                    nM = jnp.einsum(
                        "xop,ojc,pjq->xcq", M_, c.conj(), c,
                        precision=PREC,
                    )
                    nM = jnp.where(apply, nM, M_)
                    nM, d_ = _norm_log(nM)
                    return (nM, l_ + d_), None

                (M, lgM), _ = jax.lax.scan(
                    siteM, (M, lgM), (cores[istate], ts)
                )
                if s == rq:
                    cq = cores[istate][qt]
                    close = jnp.einsum(
                        "xop,onc,pmq,cq->xmn", M, cq.conj(), cq, capR,
                        precision=PREC,
                    ).reshape(n, n, n, n)
                    scl = jnp.exp(lgM + clgR).astype(dtype)
                    close = close * scl
                    rho4 = jnp.where(idx == qd, close, rho4)
                else:
                    M = jax.lax.ppermute(M, axis, to_right)
                    lgM = jax.lax.ppermute(lgM, axis, to_right)
            # rho4[ket_p, bra_p, ket_q, bra_q] (serial leg order)
            rho4 = jax.lax.psum(rho4, axis)
            return rho4.real, rho4.imag

        spec_in = ((P(axis),) * nstate, (P(axis),) * nstate)
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in, out_specs=(P(), P()),
            check_vma=False,
        ))

    if kind == "site_rdmn":
        # Hilbert-space N-site RDM ρ[ket_1, bra_1, …, ket_N, bra_N] at
        # global sites kept_sites[0] < … < kept_sites[-1], fully in-mesh.
        # Generalises ``site_rdm2``: the middle ride-along batch axis
        # OPENS another (ket, bra) leg pair at every intermediate kept
        # site.  Because ``kept_sites`` is static, the batch size follows
        # a static schedule (n² after the first kept site, ×n² per
        # intermediate one) — each device segment is python-split at its
        # kept slots so every ``lax.scan`` runs at one static batch
        # width.  Matches the serial engine's leg order
        # (``mps/tdvp.py:reduced_density``); zero host-side gather.
        # Reference computes these by multi-round tagged MPI ptp
        # (``/root/reference/pytdscf/_mps_parallel.py:1035-1209``).
        kept = tuple(kept_sites)
        p_glob, q_glob = kept[0], kept[-1]
        mids = kept[1:-1]
        pd, pt = divmod(p_glob, m)
        qd, qt = divmod(q_glob, m)
        rq = qd - pd  # static: devices the middle pass crosses

        def local(cores, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            X = x_of(sig_own, idx, istate)
            dtype = cores[istate].dtype
            to_right = [(i_, (i_ + 1) % Pn) for i_ in range(Pn)]
            to_left = [(i_, (i_ - 1) % Pn) for i_ in range(Pn)]
            e = jnp.zeros((D, D), dtype).at[0, 0].set(1.0)
            z = jnp.asarray(0.0, cores[istate].real.dtype)
            ts = jnp.arange(m)
            # optional |wstate⟩⟨wstate| projector at global site 0 (the
            # electronic site of a state-to-site-converted chain)
            wvs = jnp.where(
                ((idx * m + ts) == 0)[:, None] & (wstate >= 0),
                (jnp.arange(n) == wstate).astype(jnp.float32)[None, :],
                jnp.ones((1, n), jnp.float32),
            )

            # ---- left chain, capture before site (pd, pt)
            S, lg = e, z
            capL, clgL = e, z
            for r in range(Pn):
                S2 = jnp.einsum(
                    "bk,bo,kp->op", S, X.conj(), X, precision=PREC
                )
                S2, dl = _norm_log(S2)
                lg2 = lg + dl
                cap_round = (idx == r) & (idx == pd)

                def siteL(carry, cw):
                    S_, l_, cS, cl = carry
                    c, t, wv = cw
                    hit = cap_round & (t == pt)
                    cS = jnp.where(hit, S_, cS)
                    cl = jnp.where(hit, l_, cl)
                    nS = jnp.einsum(
                        "bk,bno,n,knp->op", S_, c.conj(),
                        wv.astype(c.dtype), c, precision=PREC,
                    )
                    nS, d_ = _norm_log(nS)
                    return (nS, l_ + d_, cS, cl), None

                (S3, lg3, capL, clgL), _ = jax.lax.scan(
                    siteL, (S2, lg2, capL, clgL), (cores[istate], ts, wvs)
                )
                S = jax.lax.ppermute(S3, axis, to_right)
                lg = jax.lax.ppermute(lg3, axis, to_right)

            # ---- right chain, capture after site (qd, qt)
            S, lg = e, z
            capR, clgR = e, z
            for r in range(Pn):
                cap_round = (idx == (Pn - 1 - r)) & (idx == qd)

                def siteR(carry, cw):
                    S_, l_, cS, cl = carry
                    c, t = cw
                    hit = cap_round & (t == qt)
                    cS = jnp.where(hit, S_, cS)
                    cl = jnp.where(hit, l_, cl)
                    nS = jnp.einsum(
                        "bno,knp,op->bk", c.conj(), c, S_,
                        precision=PREC,
                    )
                    nS, d_ = _norm_log(nS)
                    return (nS, l_ + d_, cS, cl), None

                (S2, lg2, capR, clgR), _ = jax.lax.scan(
                    siteR, (S, lg, capR, clgR),
                    (cores[istate][::-1], ts[::-1]),
                )
                ins = jnp.einsum(
                    "bo,bk,pk->op", X.conj(), S2, X, precision=PREC
                )
                ins, dl = _norm_log(ins)
                S = jax.lax.ppermute(ins, axis, to_left)
                lg = jax.lax.ppermute(lg2 + dl, axis, to_left)

            # ---- middle ride-along with leg openings at ``mids``
            cp = cores[istate][pt]
            M0 = jnp.einsum(
                "bk,bno,kmp->mnop", capL, cp.conj(), cp, precision=PREC
            ).reshape(n * n, D, D)
            M = jnp.where(idx == pd, M0, jnp.zeros_like(M0))
            M, dl0 = _norm_log(M)
            lgM = jnp.where(idx == pd, clgL + dl0, z)
            shape_out = (n,) * (2 * len(kept))
            rho = jnp.zeros(shape_out, dtype)

            def transfer_seg(M, lgM, active, t0, t1):
                """Traced double-layer transfer over local slots
                [t0, t1); only slots strictly inside (p, q) on the
                active device apply (inactive devices carry garbage of
                the right shape until they receive via ppermute)."""
                if t1 <= t0:
                    return M, lgM

                def siteM(carry, cw):
                    M_, l_ = carry
                    c, t = cw
                    g = idx * m + t
                    apply = active & (g > p_glob) & (g < q_glob)
                    nM = jnp.einsum(
                        "xop,ojc,pjq->xcq", M_, c.conj(), c,
                        precision=PREC,
                    )
                    nM = jnp.where(apply, nM, M_)
                    nM, d_ = _norm_log(nM)
                    return (nM, l_ + d_), None

                (M, lgM), _ = jax.lax.scan(
                    siteM, (M, lgM), (cores[istate][t0:t1], ts[t0:t1])
                )
                return M, lgM

            for s in range(rq + 1):
                dev = pd + s
                active = idx == dev
                if s > 0:
                    # crossed a device boundary: its own-left insertion
                    Mx = jnp.einsum(
                        "xop,oa,pb->xab", M, X.conj(), X, precision=PREC
                    )
                    Mx, dlx = _norm_log(Mx)
                    M = jnp.where(active, Mx, M)
                    lgM = lgM + jnp.where(active, dlx, z)
                # static split of this device's slots at ITS kept mids
                local_mids = sorted(
                    kk - dev * m for kk in mids
                    if dev * m <= kk < (dev + 1) * m
                )
                t0 = 0
                for tm in local_mids:
                    M, lgM = transfer_seg(M, lgM, active, t0, tm)
                    # open (ket, bra) legs at slot tm — batch ×n²;
                    # shape growth is program-uniform (static schedule)
                    cm = cores[istate][tm]
                    Mo = jnp.einsum(
                        "xop,onc,pmq->xmncq", M, cm.conj(), cm,
                        precision=PREC,
                    ).reshape(M.shape[0] * n * n, D, D)
                    Mo, dlo = _norm_log(Mo)
                    M = Mo
                    lgM = lgM + jnp.where(active, dlo, z)
                    t0 = tm + 1
                M, lgM = transfer_seg(M, lgM, active, t0, m)
                if s == rq:
                    cq = cores[istate][qt]
                    close = jnp.einsum(
                        "xop,onc,pmq,cq->xmn", M, cq.conj(), cq, capR,
                        precision=PREC,
                    )
                    scl = jnp.exp(lgM + clgR).astype(dtype)
                    close = (close * scl).reshape(shape_out)
                    rho = jnp.where(idx == qd, close, rho)
                else:
                    M = jax.lax.ppermute(M, axis, to_right)
                    lgM = jax.lax.ppermute(lgM, axis, to_right)
            # ρ[ket_1, bra_1, …] (serial leg order)
            rho = jax.lax.psum(rho, axis)
            return rho.real, rho.imag

        spec_in = ((P(axis),) * nstate, (P(axis),) * nstate)
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in, out_specs=(P(), P()),
            check_vma=False,
        ))

    if kind == "rdm_bridges":
        import math

        d = int(math.isqrt(n))
        kept = tuple(kept_sites)

        def local(cores, sigs):
            idx = jax.lax.axis_index(axis)
            sig_own = tuple(s[0] for s in sigs)
            X = x_of(sig_own, idx, istate)
            dtype = cores[istate].dtype
            wvec = jnp.eye(d).reshape(-1).astype(dtype)
            # global site index of each local site (this device)
            gsites = idx * m + jnp.arange(m)
            kept_arr = jnp.asarray(kept)
            # per-device flags: is local site p kept?
            is_kept = jnp.any(
                gsites[:, None] == kept_arr[None, :], axis=1
            )

            def fold(st):
                buf, S, cnt, logs = st
                # own-left boundary insertion belongs to the CURRENT
                # bridge piece (the boundary sits between sites)
                S2 = S @ X
                S2, dl = _norm_log(S2)
                S = S2
                logs = logs.at[cnt].add(dl.astype(logs.dtype))

                def site(carry, cw):
                    buf_, S_, cnt_, logs_ = carry
                    c, k_ = cw
                    # if kept: close the current bridge piece, reset
                    z0 = jnp.zeros((), cnt_.dtype)
                    buf_k = jax.lax.dynamic_update_slice(
                        buf_, S_[None], (cnt_, z0, z0)
                    )
                    eyeD = jnp.eye(D, dtype=dtype)
                    tr = jnp.einsum(
                        "lnr,n->lr", c, wvec, precision=PREC
                    )
                    nS_t = S_ @ tr
                    nS_t, d_t = _norm_log(nS_t)
                    buf_ = jnp.where(k_, buf_k, buf_)
                    nS = jnp.where(k_, eyeD, nS_t)
                    dlog = jnp.where(k_, 0.0, d_t).astype(logs_.dtype)
                    ncnt = cnt_ + k_.astype(cnt_.dtype)
                    logs_ = logs_.at[ncnt].add(dlog)
                    return (buf_, nS, ncnt, logs_), None

                (buf, S, cnt, logs), _ = jax.lax.scan(
                    site, (buf, S, cnt, logs), (cores[istate], is_kept)
                )
                return buf, S, cnt, logs

            buf0 = jnp.zeros((nkept + 1, D, D), dtype)
            S0 = jnp.eye(D, dtype=dtype)
            st = ring(
                fold,
                (buf0, S0, jnp.asarray(0, jnp.int32),
                 jnp.zeros((nkept + 1,), jnp.float32)),
                idx,
            )
            buf, S, cnt, logs = st
            zf = jnp.zeros((), cnt.dtype)
            buf = jax.lax.dynamic_update_slice(buf, S[None], (cnt, zf, zf))
            return buf.real, buf.imag, logs

        spec_in = ((P(axis),) * nstate, (P(axis),) * nstate)
        return jax.jit(_shard_map(
            local, mesh=mesh, in_specs=spec_in,
            out_specs=(P(), P(), P()), check_vma=False,
        ))

    raise ValueError(f"unknown observable kind {kind}")


# ---------------------------------------------------------------- dryrun
def spmd_dryrun(mesh: Mesh, n_devices: int) -> float:
    """One SPMD PITDVP step vs the serial TDVP engine on a tiny chain.

    Returns the max |Δ grid population| against the serial engine — must be
    within the PITDVP boundary-splitting error (checked at 1e-2 here; the
    thorough parity test lives in ``tests/test_spmd_pitdvp.py``).
    """
    from pytdscf_tpu.basis import Boson
    from pytdscf_tpu.mps.lattice import (
        alloc_hartree_product,
        right_canonicalize,
    )
    from pytdscf_tpu.mps.tdvp import TDVPEngine
    from pytdscf_tpu.operators.hamiltonian import TensorHamiltonian
    from pytdscf_tpu.operators.tensor_op import TensorOperator

    nsite = 2 * n_devices
    nlev, D = 3, 4
    nmat = Boson(nlev).get_number_matrix()
    qmat = Boson(nlev).get_q_matrix()
    pot = {
        (s, s): TensorOperator(
            mpo=[(0.05 * (1 + 0.1 * s) * nmat)[None, :, :, None]],
            legs=(s, s),
        )
        for s in range(nsite)
    }
    for s in range(nsite - 1):
        key = (s, s, s + 1, s + 1)
        pot[key] = TensorOperator(
            mpo=[(0.02 * qmat)[None, :, :, None], qmat[None, :, :, None]],
            legs=key,
        )
    ham = TensorHamiltonian(nsite, [[pot]], kinetic=None)
    vecs = []
    for s in range(nsite):
        v = np.zeros(nlev, complex)
        v[1 if s in (1, nsite - 2) else 0] = 1.0
        vecs.append(v)
    cores = alloc_hartree_product([nlev] * nsite, D, vecs)

    config = Config(jobname="spmd_dry", thresh_exp=1e-10, conserve_norm=False)
    dt = 0.05
    par = SPMDPITDVP(list(cores), ham, config, mesh)
    for _ in range(2):
        par.propagate(dt)

    serial = TDVPEngine([list(cores)], ham, config)
    for _ in range(2):
        serial.propagate(dt)

    chk = TDVPEngine(
        [right_canonicalize(par.to_serial_cores())], ham, config
    )
    dev = 0.0
    for p in (0, 1, nsite - 2, nsite - 1):
        dev = max(
            dev,
            float(np.max(np.abs(chk.grid_pop(p) - serial.grid_pop(p)))),
        )
    assert dev < 1e-02, f"SPMD PITDVP deviates from serial engine: {dev}"
    e_par = par.expectation()
    e_ser = serial.expectation().real
    assert abs(e_par - e_ser) < 1e-03, (e_par, e_ser)
    return dev
