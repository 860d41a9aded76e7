"""20-site t-J chain ground state on one chip (dim 9 237 800).

The flat t-J path cannot even hold this sector's ELL comfortably, and
the reference's CRS build would need ~50+ GB; the half-cut factored
form (models/tj_factored.py) runs every hot op as block GEMMs /
partial-permutation gathers.  Reports E0, the solver's convergence
record, and the matvec rate.

Usage: PYTHONPATH=. python benchmarks/tj_large.py [nsite]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.models.tj_factored import \
        build_factored_tj_blocks
    from lanczosplusplus_tpu.solver import lanczos as lz

    nsite = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    nup = ndn = nsite // 2 - 1
    term = """DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {v}
"""
    text = (f"TotalNumberOfSites={nsite}\nNumberOfTerms=4\n"
            + term.format(v=-1.0) + term.format(v=0.3)
            + term.format(v=0.3) + term.format(v=0.0)
            + f"Model=TjMultiOrb\nOrbitals=1\nSolverOptions=none\n"
              f"TargetElectronsUp={nup}\nTargetElectronsDown={ndn}\n"
              "IsPeriodicX=1\n")
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    t0 = time.perf_counter()
    bk, *_ = build_factored_tj_blocks(model, nup, ndn,
                                      dtype=np.float32)
    t_build = time.perf_counter() - t0
    print(f"build: {t_build:.1f}s dim={bk.dim} blocks={len(bk.shapes)}",
          flush=True)

    matvec = jax.jit(lambda h, x: h.matvec(x))
    x = jax.random.normal(jax.random.PRNGKey(0), (bk.dim,), jnp.float32)
    x = x / jnp.linalg.norm(x)
    y = matvec(bk, x)
    y.block_until_ready()
    _ = float(y[0])
    t0 = time.perf_counter()
    for _ in range(10):
        x = matvec(bk, x)
    x.block_until_ready()
    _ = float(x[0])
    dt = (time.perf_counter() - t0) / 10

    t0 = time.perf_counter()
    evals, vecs, info = lz.lowest_states(bk, max_steps=150,
                                         return_info=True)
    t_solve = time.perf_counter() - t0
    print(json.dumps({
        "nsite": nsite, "dim": bk.dim, "nnz": int(bk.nnz),
        "ms_per_matvec": round(dt * 1e3, 3),
        "e0": float(evals[0]),
        "converged": bool(info.converged),
        "residual": float(f"{info.residual:.3g}"),
        "solve_s": round(t_solve, 1),
        "build_s": round(t_build, 1),
    }))


if __name__ == "__main__":
    main()
