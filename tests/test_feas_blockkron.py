"""FeAs single-block BlockKron form (round 5): dense one-spin hop
GEMMs + exact (dn ⊗ up) interaction channels vs the flat ELL path."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import (build_model,
                                        factored_hamiltonian_or_none)

P33 = ("TotalNumberOfSites=4\nModel=FeAsBasedSc\nFeAsMode=INT_PAPER33\n"
       "NumberOfTerms=1\nDegreesOfFreedom=2\nOrbitals=2\n"
       "GeometryKind=chain\nGeometryOptions=ConstantValues\n"
       "SolverOptions=none\n"
       "hubbardU 4 4.0 3.0 -0.8 -0.4\nConnectors 2 2\n-1.0 0.2\n"
       "0.2 -1.0\n"
       "potentialV 16 " + " ".join(["0.3"] * 16) + "\n"
       "TargetElectronsUp=2\nTargetElectronsDown=2\nIsPeriodicX=1\n")

EXT = ("TotalNumberOfSites=4\nModel=FeAsBasedScExtended\n"
       "FeAsMode=INT_PAPER33\nNumberOfTerms=2\nDegreesOfFreedom=2\n"
       "Orbitals=2\nGeometryKind=chain\nGeometryOptions=ConstantValues\n"
       "Connectors 2 2\n-1.0 0.2\n0.2 -1.0\n"
       "DegreesOfFreedom=1\nGeometryKind=chain\n"
       "GeometryOptions=ConstantValues\nConnectors 1 0.7\n"
       "SolverOptions=none\nhubbardU 4 4.0 3.0 -0.8 -0.4\n"
       "potentialV 16 " + " ".join(["0.3"] * 16) + "\n"
       "TargetElectronsUp=2\nTargetElectronsDown=2\nIsPeriodicX=1\n")


def _setup(text, parts):
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    return inp, model, model.create_basis(parts)


@pytest.mark.parametrize("text,parts", [
    (P33, (2, 2)),
    (P33.replace("TargetElectronsUp=2", "TargetElectronsUp=3"), (3, 2)),
    (P33.replace("INT_PAPER33", "INT_IMPURITY")
     .replace("hubbardU 4 4.0 3.0 -0.8 -0.4",
              "hubbardU 4 4.0 3.0 0.0 -0.4"), (2, 2)),
    (P33.replace("INT_PAPER33", "INT_KSPACE")
     .replace("hubbardU 4 4.0 3.0 -0.8 -0.4", "hubbardU 1 2.0"),
     (2, 2)),
    (EXT, (2, 2)),
])
def test_blockkron_matches_flat_dense(text, parts):
    inp, model, basis = _setup(text, parts)
    flat = np.asarray(model.hamiltonian(basis,
                                        dtype=np.float64).to_dense())
    bk = model.block_kron_hamiltonian(basis, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(bk.to_dense()), flat,
                               atol=1e-12)


def test_blockkron_complex_matches():
    inp, model, basis = _setup(P33, (2, 2))
    flat = np.asarray(model.hamiltonian(
        basis, dtype=np.complex128).to_dense())
    bk = model.block_kron_hamiltonian(basis, dtype=np.complex128)
    np.testing.assert_allclose(np.asarray(bk.to_dense()), flat,
                               atol=1e-12)


def test_factored_spectral_matches_flat():
    """The whole spectral pipeline (N-1 sector rebuilt factored, CF
    Lanczos on the BlockKron form) agrees with the flat path."""
    from lanczosplusplus_tpu.engine import Engine

    omegas = np.linspace(-4, 8, 25)
    res = {}
    base = P33.replace("TargetElectronsDown=3\n", "") + "TSPSites 2 0 1\n"
    for so in ("none", "factored"):
        text = P33.replace("SolverOptions=none",
                           f"SolverOptions={so}") + "TSPSites 2 0 1\n"
        inp = parse_input(text)
        eng = Engine(build_model(inp, Geometry(inp)), inp)
        coll, _ = eng.spectral_function("c", 0, 1, spin=0)
        res[so] = coll.evaluate(omegas, 0.2)
        assert eng.factored_fallback_reason is None
    np.testing.assert_allclose(res["factored"], res["none"],
                               atol=2e-6)


def test_factored_dispatch_and_engine_solve():
    from lanczosplusplus_tpu.engine import Engine
    from lanczosplusplus_tpu.solver import lanczos as lz

    inp, model, basis = _setup(P33, (2, 2))
    fact = factored_hamiltonian_or_none(model, basis, (2, 2),
                                        np.float64)
    assert fact is not None and hasattr(fact, "shapes")
    e_f, _ = lz.lowest_states(fact, max_steps=200)
    e_flat, _ = lz.lowest_states(model.hamiltonian(basis,
                                                   dtype=np.float64),
                                 max_steps=200)
    assert float(e_f[0]) == pytest.approx(float(e_flat[0]), abs=1e-9)

    text = P33.replace("SolverOptions=none", "SolverOptions=factored")
    inp2 = parse_input(text)
    eng = Engine(build_model(inp2, Geometry(inp2)), inp2)
    assert eng.ground_energy == pytest.approx(float(e_flat[0]),
                                              abs=1e-9)
    assert eng.factored_fallback_reason is None
