"""Worker for the true multi-process distributed Lanczos test.

Two OS processes x 2 virtual CPU devices = a 4-device global mesh with
gloo collectives — the actual multi-host code path (SURVEY.md section 4:
"multi-host tests runnable on CPU via jax.distributed"), not just
single-process virtual devices.
"""

import os
import sys

os.environ.pop("PYTHONPATH", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np
import jax

pid = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def put_global(arr, mesh, spec):
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: np.ascontiguousarray(arr[idx]))


def main():
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.core.sparse import EllPart, Hamiltonian
    from lanczosplusplus_tpu.solver import lanczos as lz
    from lanczosplusplus_tpu.solver.lanczos import _lanczos_chunk

    nsite = 8
    text = f"""
TotalNumberOfSites={nsite}
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU {nsite} {" ".join(["4"] * nsite)}
potentialV {2 * nsite} {" ".join(["0"] * 2 * nsite)}
SolverOptions=none
TargetElectronsUp=4
TargetElectronsDown=4
IsPeriodicX=1
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((4, 4))
    ham = model.hamiltonian(basis).padded(jax.device_count())

    mesh = Mesh(np.array(jax.devices()), ("rows",))
    sham = Hamiltonian(
        diag=put_global(np.asarray(ham.diag), mesh, P("rows")),
        ell=EllPart(
            cols=put_global(np.asarray(ham.ell.cols), mesh,
                            P("rows", None)),
            vals=put_global(np.asarray(ham.ell.vals), mesh,
                            P("rows", None))),
        factorized=None, spin_shape=None)
    dim = sham.dim
    steps = 120
    v0 = np.asarray(lz.random_start_vector(basis.size, 7239443,
                                           np.float64))
    v0 = np.concatenate([v0, np.zeros(dim - basis.size)])
    v = put_global(v0, mesh, P("rows"))
    V = put_global(np.zeros((steps, dim)), mesh, P(None, "rows"))
    V, v, alphas, betas = _lanczos_chunk(sham, V, v, jnp.arange(steps))
    alphas = np.asarray(alphas)
    betas = np.asarray(betas)
    evals, _ = lz.tridiag_eigh(alphas, betas)
    if pid == 0:
        dense = model.hamiltonian(basis).to_dense()
        expect = np.linalg.eigvalsh(dense)[0]
        err = abs(evals[0] - expect)
        print(f"MULTIPROC E0={evals[0]:.12f} expect={expect:.12f} "
              f"err={err:.2e}", flush=True)
        assert err < 1e-9, "multi-process E0 mismatch"
        print("MULTIPROC PASS", flush=True)


main()
