"""Client-keyed AOT executable cache — warm starts despite unstable
server-side compile-cache keys.

The persistent XLA compilation cache (``config.enable_compilation_cache``)
hits reliably on CPU and for small TPU programs, but on the remote-compile
("axon") TPU backend the cache key of the BIG fused-block programs is
UNSTABLE across processes: identical client code and HLO produce distinct
keys, so "warm" 184-site warmups still compile for 35-90 s (BASELINE.md
round 4; TPU_RUNBOOK item 13).  The key is computed server-side, this side
of the tunnel cannot fix it — so this module sidesteps it entirely:

* the cache KEY is a sha256 computed CLIENT-side from the lowered
  StableHLO text (deterministic for identical traces) + jax/jaxlib
  versions + device kind + compiler options,
* the cache VALUE is the serialized compiled executable
  (``jax.experimental.serialize_executable``) written to disk; a hit
  deserializes and loads it with NO server compile.

Failure-safe by construction: serialization support varies by backend and
runtime version, so every cache interaction degrades to a fresh
``lower().compile()`` (and the first call of a deserialized executable is
guarded by the caller-visible try in :func:`cached_compile`'s loader).

CPU executables embed host ISA — the device-kind component of the key
includes the CPU-feature fingerprint on CPU backends for the same reason
``enable_compilation_cache`` suffixes its directory (stale AOT code from a
migrated VM can SIGILL).

The key is CONTENT-true, which makes it conservative: a host VM
migration can change the traced program itself (host-side model builds —
e.g. SVD tie-breaking in the MPO compression — are CPU-microarch
sensitive at the last ulp, shifting lowered constants), producing an
honest miss rather than a wrong hit.  Measured: same-machine rerun hits
(184-site warmup 210.8 → 31.2 s); the first run after a VM migration
recompiled (292.8 s) and re-seeded the cache.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle

logger = logging.getLogger("pytdscf_tpu")

__all__ = ["cached_compile", "aot_cache_dir", "aot_enabled"]


def aot_enabled() -> bool:
    """Default: ON for accelerator backends (where the server-side cache
    key is the unstable one), OFF on CPU — XLA:CPU's deserialized
    executables can miss JITted helper symbols at dispatch ("Function
    iota_compare_fusion not found", measured here) and the ordinary
    compilation cache already gives CPU ~3 s warm starts.
    ``PYTDSCF_AOT_CACHE=1`` forces on, ``PYTDSCF_NO_AOT_CACHE=1`` off."""
    if os.environ.get("PYTDSCF_NO_AOT_CACHE") == "1":
        return False
    if os.environ.get("PYTDSCF_AOT_CACHE") == "1":
        return True
    import jax

    return jax.default_backend() != "cpu"


def aot_cache_dir() -> str:
    base = os.environ.get("PYTDSCF_AOT_DIR", "/tmp/pytdscf-aot")
    import jax

    tag = jax.devices()[0].platform
    if tag == "cpu":
        try:
            with open("/proc/cpuinfo") as fh:
                flags = next((ln for ln in fh if ln.startswith("flags")), "")
            if flags:
                tag += "-" + hashlib.sha1(flags.encode()).hexdigest()[:8]
        except OSError:
            pass
    path = f"{base}-{tag}"
    os.makedirs(path, exist_ok=True)
    return path


def _content_key(lowered) -> str:
    import jax

    h = hashlib.sha256()
    h.update(lowered.as_text().encode())
    h.update(jax.__version__.encode())
    import jaxlib

    h.update(getattr(jaxlib, "__version__", "?").encode())
    dev = jax.devices()[0]
    h.update(f"{dev.platform}/{getattr(dev, 'device_kind', '?')}".encode())
    return h.hexdigest()[:32]


class _Guarded:
    """First call of a deserialized executable under a fallback guard:
    if the runtime rejects the cached binary (server update, device
    change), evict the entry and degrade to the plain jitted callable."""

    def __init__(self, compiled, jitted, path):
        self._c, self._j, self._path = compiled, jitted, path
        self._ok = False

    def __call__(self, *a, **k):
        if self._c is None:
            return self._j(*a, **k)
        if self._ok:
            return self._c(*a, **k)
        try:
            out = self._c(*a, **k)
            # surface async dispatch errors NOW, inside the guard (the
            # exception otherwise materialises later at result use);
            # NOTE on the axon backend block_until_ready returns early —
            # residual risk accepted there, the executable was produced
            # by the same server generation that serialized it
            import jax

            jax.tree.map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x, out,
            )
            self._ok = True
            return out
        except Exception as exc:
            logger.warning(
                "aot_cache: cached executable failed at first call (%s) "
                "— evicting %s and recompiling", exc, self._path,
            )
            try:
                os.remove(self._path)
            except OSError:
                pass
            self._c = None
            return self._j(*a, **k)


def cached_compile(jitted, args, kwargs=None, *, tag: str = "fn"):
    """``jitted.lower(*args).compile()`` with a serialized-executable cache.

    ``jitted`` must be a ``jax.jit``-wrapped callable; returns a
    ``jax.stages.Compiled`` (call it with the same arg structure).  On any
    cache failure (backend without executable serialization, stale
    payload, version skew) compiles fresh — correctness never depends on
    the cache.
    """
    kwargs = kwargs or {}
    lowered = jitted.lower(*args, **kwargs)
    if not aot_enabled():
        return lowered.compile()
    try:
        key = _content_key(lowered)
    except Exception as exc:  # lowering text unavailable on this path
        logger.info("aot_cache: no content key (%s) — compiling fresh", exc)
        return lowered.compile()
    path = os.path.join(aot_cache_dir(), f"{tag}-{key}.pkl")
    if os.path.exists(path):
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            logger.info("aot_cache: loaded %s (no compile)", path)
            return _Guarded(compiled, jitted, path)
        except Exception as exc:
            logger.warning(
                "aot_cache: stale/unreadable %s (%s) — recompiling", path, exc
            )
            try:
                os.remove(path)
            except OSError:
                pass
    compiled = lowered.compile()
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        os.replace(tmp, path)
        logger.info(
            "aot_cache: saved %s (%.1f MB)", path,
            os.path.getsize(path) / 2**20,
        )
    except Exception as exc:
        logger.info(
            "aot_cache: executable not serializable on this backend "
            "(%s) — cache skipped", exc,
        )
    return compiled
