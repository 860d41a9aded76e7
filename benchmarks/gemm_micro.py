"""Microbenchmark: where does the headline matvec's time go?

The 14-site Hubbard dense-factor matvec is y = diag*x + X @ Au^T +
Ad @ X with X (3432, 3432) f32.  This script times each piece in
isolation on the chip — the f32 GEMM (3-pass bf16 decomposition), the
native-bf16 GEMM, explicit precision settings, and the elementwise
diag pass — to separate MXU-bound from HBM/overhead time.

Usage: python benchmarks/gemm_micro.py   (runs on the attached chip)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    y = fn(*args)
    jax.block_until_ready(y)
    _ = float(np.asarray(y).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.block_until_ready(y)
    _ = float(np.asarray(y).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    n = 3432
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    a16 = a.astype(jnp.bfloat16)
    d = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    flops = 2.0 * n ** 3

    out = {}

    f_def = jax.jit(lambda x, a: x @ a.T)
    out["f32_default_ms"] = timeit(f_def, x, a) * 1e3

    f_hi = jax.jit(lambda x, a: jax.lax.dot_general(
        x, a, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST))
    out["f32_highest_ms"] = timeit(f_hi, x, a) * 1e3

    f_lo = jax.jit(lambda x, a: jax.lax.dot_general(
        x, a, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT))
    out["f32_defaultprec_ms"] = timeit(f_lo, x, a) * 1e3

    f_bf = jax.jit(lambda x, a: jax.lax.dot_general(
        x.astype(jnp.bfloat16), a, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
    out["bf16_native_ms"] = timeit(f_bf, x, a16) * 1e3

    # the full matvec shape: diag + both GEMMs fused under one jit
    f_full = jax.jit(lambda x, au, ad, dd: dd * x + jax.lax.dot_general(
        x, au, (((1,), (1,)), ((), ()))) + jax.lax.dot_general(
        ad, x, (((1,), (0,)), ((), ()))))
    out["full_matvec_ms"] = timeit(f_full, x, a, a, d) * 1e3

    f_diag = jax.jit(lambda x, dd: dd * x)
    out["diag_only_ms"] = timeit(f_diag, x, d) * 1e3

    for k, v in list(out.items()):
        if "ms" in k and "diag" not in k and "full" not in k:
            out[k.replace("_ms", "_tflops")] = round(
                flops / (v * 1e-3) / 1e12, 1)
    out = {k: round(v, 3) for k, v in out.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
