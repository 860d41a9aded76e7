"""A/B the PermCrossTerm apply variants on the chip (Rashba 13-site).

Variants:
  v0: production apply (shared-row-map groups, per-term loops)
  v1: stacked — ONE row gather for all groups of a term (concatenated
      row index lists), per-group concatenated column gather, einsum
      channel reduction (fewer, larger kernels; same bytes)
  v2: v1 with bf16 amplitude tables + one bf16 cast per source block

Usage: python benchmarks/permcross_stacked.py [nsite]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _stacked_term(t, xsrc):
    """Variant v1/v2 apply of one PermCrossTerm."""
    from lanczosplusplus_tpu.core.blockkron import (_cross_groups,
                                                    _cross_state)
    dtype = xsrc.dtype
    xg = _cross_state(t, xsrc)
    groups = _cross_groups(t)
    rd = t.row_src.shape[1]
    ridx = jnp.concatenate([t.row_src[g[0]] for g in groups])
    rows_all = xg[ridx]                       # (G*rd, c_src) one gather
    acc = None
    for gi, group in enumerate(groups):
        rows = jax.lax.dynamic_slice_in_dim(rows_all, gi * rd, rd)
        k = len(group)
        cols = jnp.concatenate([t.col_src[n] for n in group])
        g3 = rows[:, cols].reshape(rd, k, -1)          # (rd, k, cd)
        ra = jnp.stack([t.row_amp[n] for n in group])  # (k, rd)
        ca = jnp.stack([t.col_amp[n] for n in group])  # (k, cd)
        term = jnp.einsum("kr,rkc,kc->rc", ra, g3, ca).astype(dtype)
        acc = term if acc is None else acc + term
    return acc


def _matvec_variant(bk, x, variant):
    import dataclasses
    from lanczosplusplus_tpu.core.blockkron import _perm_cross_apply

    stripped = dataclasses.replace(bk, perm_cross=())
    y = stripped.matvec(x)
    xs = bk._split(x)
    ys = [jnp.zeros_like(b) for b in xs]
    apply_fn = _perm_cross_apply if variant == "v0" else _stacked_term
    for t in bk.perm_cross:
        ys[t.dst] = ys[t.dst] + apply_fn(t, xs[t.src])
    return y + jnp.concatenate([b.reshape(-1) for b in ys])


def timeit(fn, x, iters=20):
    # DEPENDENT chain (x <- fn(x)), matching the Lanczos access
    # pattern.  An earlier version dispatched two INDEPENDENT applies
    # per iteration — they overlap on the chip and under-reported the
    # latency by ~25%, which briefly looked like a structural win for
    # the de-interleaved matvec (it wasn't).
    y = fn(x)
    jax.block_until_ready(y)
    _ = float(np.asarray(y[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    _ = float(np.asarray(x[0]))
    return (time.perf_counter() - t0) / iters


def main():
    nsite = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    bench = importlib.util.module_from_spec(spec)
    sys.argv = ["bench.py", "--inner"]
    spec.loader.exec_module(bench)

    out = {}
    bk32 = bench.build_rashba_halfcut(nsite, nsite)
    bk16 = bench.build_rashba_halfcut(nsite, nsite,
                                      cross_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(bk32.dim), jnp.float32)
    x = x / jnp.linalg.norm(x)

    # production timed FIRST and LAST to expose chip-state drift
    mv0 = jax.jit(lambda h, xx: h.matvec(xx))
    y = mv0(bk32, x)
    jax.block_until_ready(y)
    _ = float(np.asarray(y[0]))
    t0 = time.perf_counter()
    xx = x
    for _ in range(20):
        xx = mv0(bk32, xx)
    jax.block_until_ready(xx)
    _ = float(np.asarray(xx[0]))
    out["production_first_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 3)

    for name, bk, var in (("v0_f32", bk32, "v0"),
                          ("v1_stacked_f32", bk32, "v1"),
                          ("v0_bf16", bk16, "v0"),
                          ("v1_stacked_bf16", bk16, "v1")):
        f = jax.jit(lambda xx, b=bk, v=var: _matvec_variant(b, xx, v))
        # correctness vs production matvec first
        ref = bk32.matvec(x)
        got = f(x)
        dev = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
        out[name + "_ms"] = round(timeit(f, x) * 1e3, 3)
        out[name + "_maxdev"] = float(f"{dev:.2g}")
    mv = jax.jit(lambda h, xx: h.matvec(xx))
    y = mv(bk32, x)
    jax.block_until_ready(y)
    _ = float(np.asarray(y[0]))
    t0 = time.perf_counter()
    xx = x
    for _ in range(20):
        xx = mv(bk32, xx)
    jax.block_until_ready(xx)
    _ = float(np.asarray(xx[0]))
    out["production_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
