"""Device->host transfer that survives the axon TPU relay.

The axon relay used in this environment cannot transfer COMPLEX
buffers device->host: `np.asarray(complex_device_array)` raises
`UNIMPLEMENTED: TPU backend error` AND poisons the backend context for
the rest of the process (every later dispatch fails too), so the
failure cannot even be caught and retried.  On-device complex compute
and f32 transfers work fine — only the complex buffer copy is missing
(real TPU runtimes transfer complex directly; this shim is inert off
the relay).

`to_host` reads a complex device array back as two real planes (one
tiny jitted real/imag split) and recombines on the host.  Real arrays
and plain numpy inputs pass straight through np.asarray.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def _on_axon_relay() -> bool:
    return (jax.default_backend() != "cpu"
            and "axon" in os.environ.get("JAX_PLATFORMS", ""))


@jax.jit
def _planes(x):
    return jnp.real(x), jnp.imag(x)


def to_host(x) -> np.ndarray:
    """np.asarray(x) with the complex-plane workaround on the relay."""
    if (isinstance(x, jax.Array)
            and jnp.issubdtype(x.dtype, jnp.complexfloating)
            and _on_axon_relay()):
        re, im = _planes(x)
        out = np.asarray(re).astype(np.float64) \
            + 1j * np.asarray(im).astype(np.float64)
        return out.astype(np.complex64 if x.dtype == jnp.complex64
                          else np.complex128)
    return np.asarray(x)


@jax.jit
def _zeros_like_jit(x):
    return jnp.zeros_like(x)


def zeros(shape, dtype):
    """jnp.zeros that survives the relay for complex dtypes: EAGER
    complex array creation transfers the complex fill scalar as a
    buffer (unimplemented there); a jitted creator embeds the constant
    in the executable instead."""
    dt = jnp.dtype(dtype)
    if jnp.issubdtype(dt, jnp.complexfloating) and _on_axon_relay():
        shape = tuple(shape) if hasattr(shape, "__len__") else (shape,)
        rdt = jnp.float32 if dt == jnp.complex64 else jnp.float64
        return jax.lax.complex(jnp.zeros(shape, rdt),
                               jnp.zeros(shape, rdt))
    return jnp.zeros(shape, dtype)


def zeros_like(x):
    if (isinstance(x, jax.Array)
            and jnp.issubdtype(x.dtype, jnp.complexfloating)
            and _on_axon_relay()):
        return _zeros_like_jit(x)
    return jnp.zeros_like(x)


def to_device(h, dtype=None):
    """jnp.asarray(h) with the complex-plane workaround on the relay
    (host->device direction)."""
    h = np.asarray(h) if not isinstance(h, jax.Array) else h
    dt = jnp.dtype(dtype) if dtype is not None else jnp.dtype(h.dtype)
    if (not isinstance(h, jax.Array)
            and jnp.issubdtype(dt, jnp.complexfloating)
            and _on_axon_relay()):
        # real inputs heading for a complex device dtype also take this
        # branch: jnp.asarray(real_np, c64) converts on host first and
        # would transfer a complex buffer
        rdt = np.float32 if dt == jnp.complex64 else np.float64
        hr = np.ascontiguousarray(np.real(h)).astype(rdt)
        hi = np.ascontiguousarray(np.imag(h)).astype(rdt)
        return jax.lax.complex(jnp.asarray(hr), jnp.asarray(hi))
    return jnp.asarray(h, dtype) if dtype is not None else jnp.asarray(h)
