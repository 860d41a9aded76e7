"""Distributed Kronecker-form (spin-factorized) solve on the virtual
8-device CPU mesh: the up-factor GEMM is shard-local; GSPMD inserts the
collectives for the down factor and the spin-coupled ELL remainder."""

import numpy as np
import pytest
import jax

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.parallel import mesh as pmesh
from lanczosplusplus_tpu.parallel import kron
from lanczosplusplus_tpu.solver import lanczos as lz


def hubbard_ham(nsite=8):
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
TargetElectronsUp={nsite // 2}
TargetElectronsDown={nsite // 2}
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    return model.hamiltonian(model.create_basis((nsite // 2, nsite // 2)))


def feas_ham(nsite=4):
    text = f"""
TotalNumberOfSites={nsite}
Model=FeAsBasedSc
FeAsMode=INT_PAPER33
NumberOfTerms=1
DegreesOfFreedom=2
Orbitals=2
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 2 2
-1.0 0.0
0.0 -1.0
hubbardU 4 4.0 3.0 -0.8 -0.4
potentialV {4 * nsite} {" ".join(["0"] * 4 * nsite)}
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    return model.hamiltonian(model.create_basis((2, 2)))


@pytest.mark.parametrize("build,ndev", [(hubbard_ham, 2),
                                        (hubbard_ham, 8),
                                        (feas_ham, 8)])
def test_kron_matvec_matches(build, ndev):
    ham = build()
    mesh = pmesh.make_mesh(jax.devices()[:ndev])
    kham, dim_pad = kron.shard_kron_hamiltonian(ham, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(ham.dim)
    xp = np.concatenate([x, np.zeros(kham.dim - ham.dim)])
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(jnp.asarray(xp),
                        NamedSharding(mesh, P(pmesh.ROWS)))
    y_single = np.asarray(ham.matvec(x))
    y_dist = np.asarray(jax.jit(lambda h, v: h.matvec(v))(kham, xs))
    np.testing.assert_allclose(y_dist[:ham.dim], y_single, atol=1e-10)
    assert np.abs(y_dist[ham.dim:]).max(initial=0.0) == 0.0


def test_kron_lowest_states_matches():
    ham = hubbard_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    e_ref, _ = lz.lowest_states(ham, max_steps=120)
    e_dist, vecs = kron.kron_lowest_states(ham, mesh, max_steps=120)
    assert e_dist[0] == pytest.approx(e_ref[0], abs=1e-9)
    # ground vector parity with the single-device solve
    _, v_ref = lz.lowest_states(ham, max_steps=120)
    ov = abs(np.vdot(vecs[0], np.asarray(v_ref[0])))
    assert ov == pytest.approx(1.0, abs=1e-7)


def test_kron_lowest_states_feas():
    ham = feas_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    dense = np.linalg.eigvalsh(ham.to_dense())
    e_dist, _ = kron.kron_lowest_states(ham, mesh, max_steps=150)
    assert e_dist[0] == pytest.approx(dense[0], abs=1e-9)


def test_feas_blockkron_distributed_matvec():
    """The round-5 FeAs single-block BlockKron distributes through
    shard_blockkron (column-sharded when divisible, replicated
    degenerately otherwise) with exact agreement."""
    import jax.numpy as jnp
    from lanczosplusplus_tpu.parallel.blockkron_dist import \
        shard_blockkron

    inp_text = (
        "TotalNumberOfSites=4\nModel=FeAsBasedSc\nFeAsMode=INT_PAPER33\n"
        "NumberOfTerms=1\nDegreesOfFreedom=2\nOrbitals=2\n"
        "GeometryKind=chain\nGeometryOptions=ConstantValues\n"
        "SolverOptions=none\n"
        "hubbardU 4 4.0 3.0 -0.8 -0.4\nConnectors 2 2\n-1.0 0.2\n"
        "0.2 -1.0\n"
        "potentialV 16 " + " ".join(["0.3"] * 16) + "\n"
        "TargetElectronsUp=2\nTargetElectronsDown=2\nIsPeriodicX=1\n")
    inp = parse_input(inp_text)
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((2, 2))
    bk = model.block_kron_hamiltonian(basis, dtype=np.float64)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    sbk = shard_blockkron(bk, mesh)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(bk.dim)
    xp = pmesh.sharded_vector(jnp.asarray(
        np.concatenate([x, np.zeros(sbk.dim - bk.dim)])), mesh)
    y = np.asarray(jax.jit(lambda h, v: h.matvec(v))(sbk, xp))
    y_ref = np.asarray(bk.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y[:bk.dim], y_ref, atol=1e-10)
