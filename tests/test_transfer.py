"""utils/transfer.py: complex plane-split transfer shim (inert on CPU,
active on the axon relay where complex buffer copies are
UNIMPLEMENTED)."""

import numpy as np
import jax
import jax.numpy as jnp

from lanczosplusplus_tpu.utils import transfer


def test_roundtrip_complex():
    h = (np.arange(6) + 1j * np.linspace(0, 1, 6)).astype(np.complex128)
    d = transfer.to_device(h)
    assert jnp.issubdtype(d.dtype, jnp.complexfloating)
    back = transfer.to_host(d)
    np.testing.assert_allclose(back, h)


def test_real_passthrough():
    h = np.arange(5.0)
    d = transfer.to_device(h, np.float32)
    assert d.dtype == jnp.float32
    np.testing.assert_allclose(transfer.to_host(d), h)


def test_real_to_complex_dtype():
    h = np.arange(4.0)
    d = transfer.to_device(h, np.complex128)
    assert jnp.issubdtype(d.dtype, jnp.complexfloating)
    np.testing.assert_allclose(transfer.to_host(d), h)


def test_zeros_and_zeros_like():
    z = transfer.zeros((3, 2), np.complex128)
    assert z.shape == (3, 2)
    assert jnp.issubdtype(z.dtype, jnp.complexfloating)
    assert float(jnp.abs(z).sum()) == 0.0
    zl = transfer.zeros_like(z)
    assert zl.shape == z.shape and zl.dtype == z.dtype


def test_forced_split_path_matches_direct(monkeypatch):
    """The plane-split path (forced on) reproduces direct transfers."""
    monkeypatch.setattr(transfer, "_on_axon_relay", lambda: True)
    h = (np.random.default_rng(0).standard_normal((4, 3))
         + 1j * np.random.default_rng(1).standard_normal((4, 3)))
    d = transfer.to_device(h, np.complex128)
    np.testing.assert_allclose(transfer.to_host(d), h)
    z = transfer.zeros((5,), np.complex64)
    assert float(jnp.abs(z).sum()) == 0.0
