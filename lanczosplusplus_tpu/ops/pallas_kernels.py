"""Pallas TPU kernels for the Hamiltonian hot path.

Two kernels:

1. `factor_matmul` — tiled MXU matmul for the dense Kronecker factor
   apply Y += X @ A^T (the Lanczos hot loop for spin-separable models).
   Grid over (row-tile, col-tile) with a VMEM accumulator over the
   contraction; equivalent to jax.lax.dot_general but scheduled
   explicitly (and a place to fuse the diagonal term).

2. `ell_spmv` — generic ELL y[i] = sum_k vals[i,k] * x[cols[i,k]] with
   the state vector resident in VMEM and per-row-block gathers.  TPU
   gather lowering in Mosaic is limited, so this kernel is attempted at
   trace time and the XLA gather path is the automatic fallback
   (`ell_spmv_or_fallback`).

Both are exercised by tests against the XLA reference implementations.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(x_ref, a_ref, o_ref, acc_ref, *, n_k):
    """o[i, j] = sum_k x[i, k] a[j, k] accumulated over the k grid."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], a_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def factor_matmul(x, a, tile_m: int = 512, tile_n: int = 512,
                  tile_k: int = 512):
    """Y[m, n] = sum_k X[m, k] * A[n, k] via a tiled Pallas kernel.

    Shapes are padded up to tile multiples; inputs f32.
    """
    m, k = x.shape
    n = a.shape[0]
    mp = -(-m // tile_m) * tile_m
    np_ = -(-n // tile_n) * tile_n
    kp = -(-k // tile_k) * tile_k
    xpad = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    apad = jnp.pad(a, ((0, np_ - n), (0, kp - k)))
    n_k = kp // tile_k
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        grid=(mp // tile_m, np_ // tile_n, n_k),
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tile_n, tile_k), lambda i, j, kk: (j, kk)),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        # CPU (tests) has no Mosaic: run the kernel in interpret mode
        interpret=(jax.default_backend() == "cpu"),
    )(xpad, apad)
    return out[:m, :n]


def _ell_kernel(x_ref, cols_ref, vals_ref, o_ref, *, block):
    """Row-block x source-block ELL SpMV.

    Mosaic's dynamic gather (take_along_axis axis 0) requires operand
    and index shapes to match, so x is consumed in (block, K)
    lane-replicated source tiles: grid dim 1 walks the source tiles and
    each contributes its in-range columns, masked and accumulated."""
    s = pl.program_id(1)
    offset = s * block
    x = x_ref[:]                      # (block, K) source tile
    cols = cols_ref[:]                # (block, K) global columns
    vals = vals_ref[:]

    @pl.when(s == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    local = cols - offset
    in_range = (local >= 0) & (local < block)
    safe = jnp.where(in_range, local, 0)
    gathered = jnp.take_along_axis(x, safe, axis=0)
    contrib = jnp.where(in_range, vals * gathered, 0.0)
    o_ref[:] += jnp.sum(contrib, axis=1, keepdims=True)


def ell_spmv_pallas(diag, cols, vals, x, block: int = 1024):
    """y = diag*x + sum_k vals[:,k] x[cols[:,k]] as a Pallas kernel.

    Requires x to fit in VMEM; raises at trace/compile time when the
    gather cannot be lowered — use ell_spmv_or_fallback.
    """
    dim, k = cols.shape
    dimp = -(-dim // block) * block
    nblocks = dimp // block
    cols_p = jnp.pad(cols, ((0, dimp - dim), (0, 0)))
    vals_p = jnp.pad(vals, ((0, dimp - dim), (0, 0)))
    x_b = jnp.broadcast_to(jnp.pad(x, (0, dimp - dim))[:, None],
                           (dimp, k))
    y = pl.pallas_call(
        functools.partial(_ell_kernel, block=block),
        grid=(nblocks, nblocks),
        in_specs=[
            pl.BlockSpec((block, k), lambda i, s: (s, 0)),
            pl.BlockSpec((block, k), lambda i, s: (i, 0)),
            pl.BlockSpec((block, k), lambda i, s: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i, s: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((dimp, 1), x.dtype),
    )(x_b, cols_p, vals_p)
    return diag * x + y[:dim, 0]


def ell_spmv_or_fallback(diag, cols, vals, x, block: int = 1024):
    """Try the Pallas ELL kernel; fall back to the XLA gather form."""
    try:
        return ell_spmv_pallas(diag, cols, vals, x, block=block)
    except Exception:
        return diag * x + jnp.sum(vals * x[cols], axis=-1)
