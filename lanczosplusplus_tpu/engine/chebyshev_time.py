"""Real-time evolution by Chebyshev expansion of the propagator.

Capability beyond the reference (which has no real-time propagation —
its dynamics are frequency-domain continued fractions,
Engine.h:460-490 + scripts/dynamicsFt.pl):

    e^{-iHt} = e^{-ibt} [ J_0(at) + 2 sum_{k>=1} (-i)^k J_k(at)
                          T_k((H - b)/a) ]

(Tal-Ezer & Kosloff, J. Chem. Phys. 81, 3967 (1984)).  The Bessel
coefficients J_k(at) decay super-exponentially once k > at, so the
series truncates sharply; the device-side work is the SAME two-vector
Chebyshev recurrence as the KPM module — one matvec per term, no
reorthogonalization, static shapes — with the (K, nt) coefficient
table folded in through a `lax.scan`.  For real H and real psi0 the
recurrence stays real and only the accumulators are complex.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import scipy.special
import jax
import jax.numpy as jnp

from lanczosplusplus_tpu.engine.kpm import spectral_bounds


@partial(jax.jit, static_argnums=())
def _evolve_scan(ham, psi0, a, b, coeffs):
    """acc[t] = sum_k coeffs[k, t] T_k(Ht) psi0  via one scan."""
    from lanczosplusplus_tpu.core.sparse import apply_block_t

    ainv = jnp.asarray(1.0, psi0.dtype) / a.astype(psi0.dtype)
    bshift = b.astype(psi0.dtype)

    def ht(x):
        return (apply_block_t(ham, x[None])[0] - bshift * x) * ainv

    t0 = psi0
    t1 = ht(psi0)
    acc = (coeffs[0][:, None] * t0[None, :] +
           coeffs[1][:, None] * t1[None, :])

    def body(carry, ck):
        tkm1, tk, acc = carry
        tk1 = 2.0 * ht(tk) - tkm1
        acc = acc + ck[:, None] * tk1[None, :]
        return (tk, tk1, acc), None

    (_, _, acc), _ = jax.lax.scan(body, (t0, t1, acc), coeffs[2:])
    return acc


def evolve(ham, psi0, times, bounds=None, extra_terms: int = 40):
    """psi(t) = e^{-iHt} psi0 for each t in `times`.

    Returns a (len(times), dim) complex array.  The expansion order is
    ceil(1.1 * a * max|t|) + extra_terms (Bessel tail cutoff)."""
    times = np.asarray(times, dtype=np.float64)
    if bounds is None:
        bounds = spectral_bounds(ham)
    emin, emax = bounds
    a = 0.5 * (emax - emin)
    b = 0.5 * (emax + emin)
    at = a * np.abs(times).max()
    # the scan needs T_0 and T_1 unconditionally
    K = max(int(np.ceil(1.1 * at)) + int(extra_terms), 2)
    k = np.arange(K)
    bessel = scipy.special.jv(k[:, None], a * times[None, :])  # (K, nt)
    phase = np.exp(-1j * b * times)[None, :]
    pref = np.where(k == 0, 1.0, 2.0)[:, None] * (-1j) ** k[:, None]
    coeffs = (pref * bessel * phase).astype(np.complex128)
    psi0 = jnp.asarray(psi0)
    cdt = np.complex64 if psi0.dtype in (jnp.float32, jnp.complex64) \
        else np.complex128
    acc = _evolve_scan(ham, psi0,
                       jnp.asarray(a, jnp.float64).astype(jnp.float64),
                       jnp.asarray(b, jnp.float64).astype(jnp.float64),
                       jnp.asarray(coeffs.astype(cdt)))
    return np.asarray(acc)


def autocorrelation(ham, psi0, times, bounds=None, extra_terms=40):
    """C(t) = <psi0 | e^{-iHt} | psi0> — the survival amplitude, whose
    Fourier transform is the spectral function of |psi0>."""
    psi_t = evolve(ham, psi0, times, bounds=bounds,
                   extra_terms=extra_terms)
    return psi_t @ np.conj(np.asarray(psi0))
