"""Client-keyed AOT executable cache (util/aot_cache.py).

The TPU-facing behavior (bypassing the axon backend's unstable
server-side cache keys; 184-site warm start 210.8 → 31.2 s) is measured
in BASELINE.md; these tests pin the host-side contract: content keys,
file round-trip, stale-payload eviction, and the off-by-default CPU
gating (XLA:CPU deserialized executables can fail at dispatch)."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytdscf_tpu.util import aot_cache


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    """The actual cache dir (aot_cache_dir() appends a platform/CPU
    fingerprint suffix to the base)."""
    monkeypatch.setenv("PYTDSCF_AOT_DIR", str(tmp_path / "aot"))
    import pathlib

    return pathlib.Path(aot_cache.aot_cache_dir())


def test_disabled_on_cpu_by_default(monkeypatch):
    monkeypatch.delenv("PYTDSCF_AOT_CACHE", raising=False)
    monkeypatch.delenv("PYTDSCF_NO_AOT_CACHE", raising=False)
    assert jax.default_backend() == "cpu"
    assert not aot_cache.aot_enabled()
    monkeypatch.setenv("PYTDSCF_AOT_CACHE", "1")
    assert aot_cache.aot_enabled()
    monkeypatch.setenv("PYTDSCF_NO_AOT_CACHE", "1")
    assert not aot_cache.aot_enabled()


def test_roundtrip_and_stale_eviction(cache_dir, monkeypatch):
    monkeypatch.setenv("PYTDSCF_AOT_CACHE", "1")

    def f(x):
        return (x * 2.0 + 1.0).sum()

    x = jnp.arange(8.0)
    jf = jax.jit(f)
    c1 = aot_cache.cached_compile(jf, (x,), tag="t")
    v1 = float(np.asarray(c1(x)))
    files = list(cache_dir.glob("t-*.pkl")) if cache_dir.exists() else []
    if not files:
        pytest.skip("executable serialization unsupported on this backend")
    # identical code in a fresh jit -> same content key, loads the
    # serialized executable (returns the guarded wrapper) and computes
    # the same value.  On XLA:CPU the deserialized executable may be
    # REJECTED at dispatch (the known missing-helper-symbol failure) —
    # the guard must then evict the file and fall back to plain jit,
    # still returning the right answer.
    c2 = aot_cache.cached_compile(jax.jit(f), (x,), tag="t")
    assert isinstance(c2, aot_cache._Guarded)
    assert float(np.asarray(c2(x))) == v1
    loaded_ok = len(list(cache_dir.glob("t-*.pkl"))) == 1
    assert loaded_ok or c2._c is None  # either loaded clean or evicted

    # corrupt the payload: the loader must evict (or skip) and recompile
    path = files[0]
    with open(path, "wb") as fh:
        pickle.dump(("garbage",), fh)
    c3 = aot_cache.cached_compile(jax.jit(f), (x,), tag="t")
    assert float(np.asarray(c3(x))) == v1


def test_guard_falls_back_on_broken_executable(cache_dir, monkeypatch):
    monkeypatch.setenv("PYTDSCF_AOT_CACHE", "1")

    class Boom:
        def __call__(self, *a, **k):
            raise RuntimeError("rejected by runtime")

    jf = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((4,))
    marker = cache_dir / "dead.pkl"
    os.makedirs(cache_dir, exist_ok=True)
    marker.write_bytes(b"x")
    g = aot_cache._Guarded(Boom(), jf, str(marker))
    out = g(x)
    np.testing.assert_allclose(np.asarray(out), 2.0)
    assert not marker.exists()  # evicted
    # subsequent calls go straight to the jit fallback
    np.testing.assert_allclose(np.asarray(g(x)), 2.0)
