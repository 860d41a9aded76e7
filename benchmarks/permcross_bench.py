"""PermCrossTerm matvec microbenchmark: vectorized fused path vs the
round-2 per-bond gather loop, at the bench.py Rashba/t-J shapes.

Run on the TPU chip (default platform) or CPU:
    python benchmarks/permcross_bench.py [--nsite-rashba 13] [--nsite-tj 18]

Prints per-model: ms/matvec for (a) the shipped vectorized perm-cross
path, (b) the legacy per-bond loop, and (c) the Hamiltonian with
perm_cross stripped (diag + block GEMMs only) — so the cross-term
share of the matvec is measured directly (VERDICT r2 item 8).
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def legacy_matvec(ham, x):
    """Round-2 per-bond perm-cross loop (one gather pair + one Y
    read-modify-write per bond), for comparison."""
    xs = ham._split(x)
    stripped = dataclasses.replace(ham, perm_cross=())
    y = stripped.matvec(x)
    ys = stripped._split(y)
    ys = [jnp.asarray(b) for b in ys]
    for t in ham.perm_cross:
        xb = xs[t.src]
        for n in range(t.row_src.shape[0]):
            rows = xb[t.row_src[n]]
            ys[t.dst] = ys[t.dst] + (
                t.row_amp[n][:, None] * rows[:, t.col_src[n]]
                * t.col_amp[n][None, :])
    return jnp.concatenate([b.reshape(-1) for b in ys])


def time_fn(fn, ham, dim, iters=20):
    f = jax.jit(fn)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (dim,), jnp.float32)
    x = x / jnp.linalg.norm(x)
    y = f(ham, x)
    y.block_until_ready()
    _ = float(y[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(ham, x)
    x.block_until_ready()
    _ = float(x[0])
    return (time.perf_counter() - t0) / iters


def report(name, ham):
    dim, nnz = ham.dim, ham.nnz
    dt_new = time_fn(lambda h, x: h.matvec(x), ham, dim)
    stripped = dataclasses.replace(ham, perm_cross=())
    dt_nocross = time_fn(lambda h, x: h.matvec(x), stripped, dim)
    dt_old = time_fn(legacy_matvec, ham, dim)
    print(f"{name}: dim={dim} nnz={nnz}")
    print(f"  vectorized matvec : {dt_new * 1e3:8.3f} ms "
          f"({nnz / dt_new / 1e9:.1f} Gnnz/s)")
    print(f"  legacy per-bond   : {dt_old * 1e3:8.3f} ms "
          f"({nnz / dt_old / 1e9:.1f} Gnnz/s)")
    print(f"  no perm_cross     : {dt_nocross * 1e3:8.3f} ms "
          f"(cross share {100 * (1 - dt_nocross / dt_new):.0f}% of "
          f"vectorized)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsite-rashba", type=int, default=None)
    ap.add_argument("--nsite-tj", type=int, default=None)
    args = ap.parse_args()
    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    nra = args.nsite_rashba or (13 if platform != "cpu" else 8)
    ntj = args.nsite_tj or (18 if platform != "cpu" else 8)

    import bench
    report(f"tj {ntj}-site", bench.build_tj_factored(
        ntj, ntj // 2 - 1, ntj // 2 - 1))
    report(f"rashba {nra}-site", bench.build_rashba_blockkron(nra, nra))


if __name__ == "__main__":
    main()
