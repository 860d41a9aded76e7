"""Microbenchmark of PermCrossTerm application strategies on one
representative (src, dst) block pair at the Rashba-13 center-pair
shape, to find which gather primitives this TPU runs fast.

Each variant is timed twice in interleaved order (the chip shows
run-order noise).  Variants:
  v0_legacy      per-bond: row gather + col gather + Y RMW (round 2)
  v1_grouped     bonds grouped by unique row map: one row gather per
                 group, K-slot column ELL per group
  v2_batchedrow  ONE batched 2-D-index row gather, then per-bond col
                 gathers from the stacked intermediate
  v5_transpose   per-bond: row gather, transpose, col-as-row gather,
                 transpose back (contiguous-slice gathers only)
  v6_packed      per-bond: gather only the ~50% valid rows, scatter-add
                 the packed result into Y
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

R = 1716   # rows_dst == rows_src (center pair)
C = 1716   # cols_dst == cols_src
NB = 26

rng = np.random.default_rng(0)
row_src = rng.integers(0, R, (NB, R)).astype(np.int32)
col_src = rng.integers(0, C, (NB, C)).astype(np.int32)
row_valid = rng.random((NB, R)) < 0.5
row_amp = (rng.standard_normal((NB, R)) * row_valid).astype(np.float32)
col_amp = (rng.standard_normal((NB, C)) *
           (rng.random((NB, C)) < 0.5)).astype(np.float32)

# grouped variant: pretend bonds share row maps in pairs (Rashba: each
# up-site map appears in 2 bonds) -> NG=13 groups, K=2 column slots
NG, K = NB // 2, 2
g_row_src = row_src[:NG]
g_row_amp = row_amp[:NG]
g_col_src = col_src.reshape(NG, K, C)
g_col_amp = col_amp.reshape(NG, K, C)

# packed variant: per-bond list of valid dst rows, padded to max count
RP = int(row_valid.sum(axis=1).max())
p_rows = np.zeros((NB, RP), np.int32)       # dst row of packed slot
p_src = np.zeros((NB, RP), np.int32)        # src row of packed slot
p_amp = np.zeros((NB, RP), np.float32)
for n in range(NB):
    idx = np.nonzero(row_valid[n])[0]
    p_rows[n, :idx.size] = idx
    p_src[n, :idx.size] = row_src[n, idx]
    p_amp[n, :idx.size] = row_amp[n, idx]

x = rng.standard_normal((R, C)).astype(np.float32)


def v0_legacy(args, x):
    rs, ra, cs, ca = args
    y = jnp.zeros_like(x)
    for n in range(NB):
        rows = x[rs[n]]
        y = y + ra[n][:, None] * rows[:, cs[n]] * ca[n][None, :]
    return y


def v1_grouped(args, x):
    rs, ra, cs, ca = args
    y = jnp.zeros_like(x)
    for g in range(NG):
        rows = ra[g][:, None] * x[rs[g]]
        for k in range(K):
            y = y + rows[:, cs[g, k]] * ca[g, k][None, :]
    return y


def v2_batchedrow(args, x):
    rs, ra, cs, ca = args
    rows = ra[:, :, None] * x[rs]          # (NB, R, C) batched gather
    y = jnp.zeros_like(x)
    for n in range(NB):
        y = y + rows[n][:, cs[n]] * ca[n][None, :]
    return y


def v5_transpose(args, x):
    rs, ra, cs, ca = args
    y = jnp.zeros_like(x)
    for n in range(NB):
        rows = ra[n][:, None] * x[rs[n]]
        shufT = rows.T[cs[n]]              # (Cdst, R) row-slice gather
        y = y + ca[n][:, None].T * shufT.T
    return y


def v6_packed(args, x):
    pr, ps, pa, cs, ca = args
    y = jnp.zeros_like(x)
    for n in range(NB):
        rows = pa[n][:, None] * x[ps[n]]   # (RP, C) half-size gather
        t = rows[:, cs[n]] * ca[n][None, :]
        y = y.at[pr[n]].add(t, unique_indices=True)
    return y


def time_fn(name, fn, args, x, rep):
    f = jax.jit(fn)
    xj = jnp.asarray(x)
    y = f(args, xj)
    y.block_until_ready()
    ref = float(jnp.abs(y).sum())
    t0 = time.perf_counter()
    for _ in range(10):
        y = f(args, xj)
    y.block_until_ready()
    _ = float(y[0, 0])
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:14s} rep{rep}: {dt * 1e3:9.3f} ms   "
          f"checksum={ref:.6g}", flush=True)
    return dt


def main():
    print(f"platform: {jax.devices()[0].platform}  "
          f"shape=({R},{C}) nb={NB} packed_rows={RP}", flush=True)
    flat = (jnp.asarray(row_src), jnp.asarray(row_amp),
            jnp.asarray(col_src), jnp.asarray(col_amp))
    grouped = (jnp.asarray(g_row_src), jnp.asarray(g_row_amp),
               jnp.asarray(g_col_src), jnp.asarray(g_col_amp))
    packed = (jnp.asarray(p_rows), jnp.asarray(p_src),
              jnp.asarray(p_amp), jnp.asarray(col_src),
              jnp.asarray(col_amp))
    for rep in (1, 2):
        time_fn("v0_legacy", v0_legacy, flat, x, rep)
        time_fn("v1_grouped", v1_grouped, grouped, x, rep)
        time_fn("v2_batchedrow", v2_batchedrow, flat, x, rep)
        time_fn("v5_transpose", v5_transpose, flat, x, rep)
        time_fn("v6_packed", v6_packed, packed, x, rep)


if __name__ == "__main__":
    main()
