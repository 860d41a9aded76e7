"""Double-float (df64) arithmetic on TPU: f32 (hi, lo) pairs.

The TPU has no native float64; the reference is double everywhere
(reference: src/Engine/LanczosDriver.h:29-33).  This module emulates
~2x-f32 precision (unit roundoff ~2^-48) with error-free
transformations (Dekker/Knuth two_sum/two_prod; the split-based
two_prod needs no FMA, so XLA's elementwise lowering preserves
exactness — XLA does not contract or reassociate elementwise float
ops).

The production use is `refined_energy`: the Lanczos solve runs in f32
(full MXU speed), then ONE df64 Hamiltonian application + df64 dot
evaluates the Rayleigh quotient rho(v) = <v|H|v>/<v|v> exactly enough
(~1e-13) that the energy error is dominated by the QUADRATIC term
O(||dv||^2) of the eigenvector error — f32 Lanczos residuals of ~1e-6
yield energies at ~1e-12 relative, matching the reference's f64 bar at
a tiny fraction of an f64-emulated solve.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth; no ordering assumption)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Veltkamp split of f32 into 12-bit-significand halves."""
    c = a * jnp.float32(4097.0)    # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e (Dekker, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(xh, xl, yh, yl):
    """(xh, xl) + (yh, yl) -> normalized df64."""
    sh, se = two_sum(xh, yh)
    te = xl + yl + se
    return fast_two_sum(sh, te)


def df_add_f32(xh, xl, y):
    sh, se = two_sum(xh, y)
    return fast_two_sum(sh, xl + se)


def df_prod_f32(a, b):
    """f32 * f32 -> df64 (exact)."""
    return two_prod(a, b)


def df_sum_pairwise(xh, xl):
    """df64 sum of a (n,) df64 array by pairwise folding (log2(n)
    df_adds over halves; error ~ log2(n) * 2^-48)."""
    n = xh.shape[0]
    m = 1 << int(np.ceil(np.log2(max(n, 1))))
    xh = jnp.pad(xh, (0, m - n))
    xl = jnp.pad(xl, (0, m - n))
    while m > 1:
        m //= 2
        xh, xl = df_add(xh[:m], xl[:m], xh[m:], xl[m:])
    return xh[0], xl[0]


def _df64_apply(ham, v):
    """(yh, yl) = H v in df64: diag + generic ELL + Kronecker gather
    factors (the dense-GEMM forms are bypassed — gathers keep every
    product error-free on the VPU)."""
    yh, yl = two_prod(ham.diag.astype(jnp.float32), v)
    if ham.factorized is not None:
        f = ham.factorized
        szd, szu = ham.spin_shape
        x2d = v.reshape(szd, szu)
        y2h = yh.reshape(szd, szu)
        y2l = yl.reshape(szd, szu)
        if f.up_cols is not None:
            for k in range(f.up_cols.shape[1]):
                ph, pl = two_prod(
                    jnp.broadcast_to(f.up_vals[None, :, k], (szd, szu)),
                    x2d[:, f.up_cols[:, k]])
                y2h, y2l = df_add(y2h, y2l, ph, pl)
        if f.dn_cols is not None:
            for k in range(f.dn_cols.shape[1]):
                ph, pl = two_prod(
                    jnp.broadcast_to(f.dn_vals[:, k, None], (szd, szu)),
                    x2d[f.dn_cols[:, k], :])
                y2h, y2l = df_add(y2h, y2l, ph, pl)
        yh = y2h.reshape(-1)
        yl = y2l.reshape(-1)
    if ham.ell is not None:
        for k in range(ham.ell.cols.shape[1]):
            ph, pl = two_prod(ham.ell.vals[:, k], v[ham.ell.cols[:, k]])
            yh, yl = df_add(yh, yl, ph, pl)
    return yh, yl


@jax.jit
def _rayleigh_df64(ham, v):
    v = v.astype(jnp.float32)
    yh, yl = _df64_apply(ham, v)
    # numerator sum_i v_i y_i in df64
    nh, nl = two_prod(v, yh)
    nh, nl = df_add(nh, nl, v * yl, jnp.zeros_like(v))
    num_h, num_l = df_sum_pairwise(nh, nl)
    dh, dl = two_prod(v, v)
    den_h, den_l = df_sum_pairwise(dh, dl)
    return num_h, num_l, den_h, den_l


def refined_energy(ham, v) -> float:
    """<v|H|v> / <v|v> evaluated in on-chip df64 for a REAL f32
    Hamiltonian/state.  For a Ritz vector from the f32 Lanczos solve
    this recovers the energy to ~1e-12 relative (quadratic eigenvector
    error), matching the f64 reference bar without an f64 solve.
    Returns a Python float (f64 recombination on host)."""
    if jnp.issubdtype(jnp.asarray(v).dtype, jnp.complexfloating):
        raise NotImplementedError("df64 refinement: real states only")
    num_h, num_l, den_h, den_l = _rayleigh_df64(ham, jnp.asarray(v))
    num = float(np.float64(np.asarray(num_h))
                + np.float64(np.asarray(num_l)))
    den = float(np.float64(np.asarray(den_h))
                + np.float64(np.asarray(den_l)))
    return num / den
