"""Rashba SOC model tests: hermiticity, analytic dispersion oracle
(scripts/dispersion.pl6), dense cross-checks, input10.inp."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine

INPUT10 = """
TotalNumberOfSites=4
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 7.0
Model=HubbardOneBandRashbaSOC
hubbardU 4
0 0 0 0
potentialV 8
0 0 0 0
0 0 0 0
SolverOptions=MatrixVectorStored,dumpmatrix,printmatrix
Version=version
OutputFile=data10
TargetElectronsTotal=1
IsPeriodicX=0
"""


def dispersion_oracle(L, t, r, periodic=False):
    """scripts/dispersion.pl6: eigenvalues (t +- r) * (-2 cos k)."""
    out = []
    for mm in range(L):
        m = mm if periodic else mm + 1
        k = 2 * np.pi * m / L if periodic else np.pi * m / (L + 1)
        sk = -2.0 * np.cos(k)
        out += [(t + r) * sk, (t - r) * sk]
    return np.sort(np.array(out))


def test_input10_single_particle_spectrum():
    inp = parse_input(INPUT10)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(("ne", 1))
    assert basis.size == 8
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T.conj(), atol=1e-12)
    evals = np.linalg.eigvalsh(dense)
    expect = dispersion_oracle(4, -1.0, 7.0)
    np.testing.assert_allclose(evals, expect, atol=1e-10)


def test_two_particle_hermitian_and_engine():
    text = INPUT10.replace("TargetElectronsTotal=1",
                           "TargetElectronsTotal=2") \
        .replace("Connectors 1 7.0", "Connectors 1 0.9") \
        .replace("hubbardU 4\n0 0 0 0", "hubbardU 4\n3 3 3 3")
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(("ne", 2))
    assert basis.size == 28  # C(8, 2)
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T.conj(), atol=1e-12)
    eng = Engine(model, inp)
    expect = np.linalg.eigvalsh(dense)[0]
    assert eng.ground_energy == pytest.approx(expect, abs=1e-10)


def test_rashba_zero_reduces_to_hubbard():
    """r=0: spectrum must be the union of fixed-(nup,ndown) Hubbard
    sectors with nup+ndown=N."""
    text = INPUT10.replace("Connectors 1 7.0", "Connectors 1 0.0") \
        .replace("TargetElectronsTotal=1", "TargetElectronsTotal=3") \
        .replace("hubbardU 4\n0 0 0 0", "hubbardU 4\n2 2 2 2")
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(("ne", 3))
    dense = model.hamiltonian(basis).to_dense()
    evals = np.sort(np.linalg.eigvalsh(dense))

    # union of Hubbard sectors
    htext = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1
Model=HubbardOneBand
hubbardU 4
2 2 2 2
potentialV 8
0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=1
IsPeriodicX=0
"""
    hinp = parse_input(htext)
    hgeom = Geometry(hinp)
    hmodel = build_model(hinp, hgeom)
    all_evals = []
    for nup in range(4):
        ndown = 3 - nup
        hb = hmodel.create_basis((nup, ndown))
        all_evals.append(np.linalg.eigvalsh(hmodel.hamiltonian(hb).to_dense()))
    expect = np.sort(np.concatenate(all_evals))
    np.testing.assert_allclose(evals, expect, atol=1e-10)


def test_n_operator_map():
    inp = parse_input(INPUT10.replace("TargetElectronsTotal=1",
                                      "TargetElectronsTotal=2"))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    res = eng.two_point("n", spin=(0, 0))
    # total up-occupation: sum_i <n_i_up> must be <N_up> in [0, 2]
    tot = np.trace(res).real
    assert 0 <= tot <= 2 + 1e-9
