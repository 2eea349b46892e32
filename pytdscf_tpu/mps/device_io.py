"""Safe host<->device transport for complex tensors.

The TPU backend used here (axon tunnel, and TPUs generally) has no native
complex type: complex arithmetic *inside* a jitted XLA program is decomposed
into real ops and works, but eagerly-dispatched complex programs and
device->host transfers of complex buffers can fail (UNIMPLEMENTED).  The
rule enforced by this module:

* complex values live on device ONLY inside jit-compiled programs;
* every host boundary crossing is a pair of real arrays (re, im).

All engine-level observable fetches and constant creations go through these
helpers, keeping the hot path (jitted site updates) untouched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("shape", "dtype"))
def _ones(shape, dtype):
    return jnp.ones(shape, dtype)


def ones(shape, dtype) -> jax.Array:
    """Complex-safe ``jnp.ones`` (compiled, never eager)."""
    return _ones(tuple(shape), jnp.dtype(dtype))


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


def put(array: np.ndarray, dtype) -> jax.Array:
    """Host numpy -> device array of complex ``dtype`` via a real pair."""
    dtype = jnp.dtype(dtype)
    if dtype.kind != "c":
        return jnp.asarray(array, dtype)
    real = jnp.dtype(np.float32 if dtype == jnp.complex64 else np.float64)
    arr = np.asarray(array)
    return _combine(
        jnp.asarray(arr.real, real), jnp.asarray(arr.imag, real)
    )


@jax.jit
def _split(x):
    return jnp.real(x), jnp.imag(x)


def fetch(x: jax.Array) -> np.ndarray:
    """Device array -> host numpy (complex-safe)."""
    if jnp.dtype(x.dtype).kind != "c":
        return np.asarray(x)
    re, im = _split(x)
    return np.asarray(re) + 1j * np.asarray(im)


def fetch_scalar(x: jax.Array) -> complex:
    return complex(fetch(x).reshape(())[()])


@partial(jax.jit, static_argnames=("sub",))
def _einsum(sub, *ops):
    return jnp.einsum(
        sub, *ops, optimize=True, precision=jax.lax.Precision.HIGHEST
    )


def jeinsum(sub: str, *ops) -> jax.Array:
    """Jitted einsum (safe for eager-complex-hostile backends)."""
    return _einsum(sub, *ops)


@jax.jit
def norm2(x) -> jax.Array:
    """‖x‖² as a real scalar (jitted)."""
    return jnp.vdot(x, x).real


@jax.jit
def _vdot_reim(a, b):
    v = jnp.vdot(a, b)
    return jnp.real(v), jnp.imag(v)


def vdot(a, b) -> complex:
    re, im = _vdot_reim(a, b)
    return float(np.asarray(re)) + 1j * float(np.asarray(im))


@jax.jit
def jvdot(a, b) -> jax.Array:
    """⟨a|b⟩ as a DEVICE complex scalar (no host sync)."""
    return jnp.vdot(a, b)


@partial(jax.jit, static_argnames=("rd",))
def _pack_tuple(xs, rd):
    parts = []
    for x in xs:
        x1 = jnp.atleast_1d(x).reshape(-1)
        if jnp.issubdtype(x1.dtype, jnp.complexfloating):
            parts.append(jnp.real(x1).astype(rd))
            parts.append(jnp.imag(x1).astype(rd))
        else:
            parts.append(x1.astype(rd))
            parts.append(jnp.zeros_like(x1, rd))
    return jnp.concatenate(parts)


def fetch_many(xs, real_dtype) -> list:
    """Fetch MANY device scalars/vectors with ONE host sync.

    Every ``fetch`` costs a full device→host round trip (~30 ms through
    the axon TPU tunnel); per-step property exports fetch several
    scalars, so batching them into one packed real vector is the
    difference between a dispatch-bound and a sync-bound driver loop.
    Returns host complex values with each input's original shape
    (scalars come back as ``complex``)."""
    xs = list(xs)
    if not xs:
        return []
    packed = _pack_tuple(tuple(xs), jnp.dtype(real_dtype))
    host = np.asarray(packed)
    out = []
    k = 0
    for x in xs:
        shape = tuple(np.shape(x))
        n = 1
        for d in shape:
            n *= d
        re, im = host[k : k + n], host[k + n : k + 2 * n]
        k += 2 * n
        val = re + 1j * im
        out.append(complex(val[0]) if shape == () else val.reshape(shape))
    return out
