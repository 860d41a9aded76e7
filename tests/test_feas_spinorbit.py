"""FeAs spin-orbit variant: hermiticity, zero-SO reduction to sector
union, kron oracle for the SO operator."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine


def so_text(nsite, nup, ndown, so_vals, u=(1.0, 0.5, -0.2, -0.1)):
    orbitals = 2
    n2 = nsite * orbitals * 2
    so_lines = "\n".join(" ".join(str(x) for x in so_vals[r * 4:(r + 1) * 4])
                         for r in range(4))
    return f"""
TotalNumberOfSites={nsite}
Model=FeAsBasedSc
FeAsMode=INT_PAPER33
NumberOfTerms=1
DegreesOfFreedom=2
Orbitals=2
GeometryKind=chain
GeometryOptions=ConstantValues
SolverOptions=none
hubbardU 4 {" ".join(str(x) for x in u)}
Connectors 2 2
-1.0 0.2
0.2 -0.7
potentialV {n2}
{" ".join(["0"] * n2)}
SpinOrbit 4 4
{so_lines}
TargetElectronsUp={nup}
TargetElectronsDown={ndown}
IsPeriodicX=0
"""


def test_spin_orbit_basis_size():
    # diagonal-only SO (no spin mixing) keeps hermiticity trivially
    so = [0.0] * 16
    inp = parse_input(so_text(2, 1, 1, so))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((1, 1))
    from math import comb
    # union over nup = 0..2 of product blocks
    assert basis.size == sum(comb(4, k) * comb(4, 2 - k) for k in range(3))


def test_zero_so_reduces_to_sector_union():
    so = [0.0] * 16
    inp = parse_input(so_text(2, 1, 1, so))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((1, 1))
    dense = model.hamiltonian(basis).to_dense()
    np.testing.assert_allclose(dense, dense.T.conj(), atol=1e-12)
    evals = np.sort(np.linalg.eigvalsh(dense).real)
    # union of fixed-(nup,ndown) FeAs sectors with nup+ndown=2
    text2 = so_text(2, 1, 1, so)
    text2 = "\n".join(ln for ln in text2.splitlines()
                      if not ln.startswith("SpinOrbit") and
                      ln.strip() not in ("0.0 0.0 0.0 0.0",))
    inp2 = parse_input(text2)
    model2 = build_model(inp2, Geometry(inp2))
    union = []
    for nup in range(3):
        b = model2.create_basis((nup, 2 - nup))
        union.append(np.linalg.eigvalsh(model2.hamiltonian(b).to_dense()))
    expect = np.sort(np.concatenate(union))
    np.testing.assert_allclose(evals, expect, atol=1e-10)


def test_spin_mixing_hermitian_and_engine():
    # hermitian SO matrix: rows indexed spin1+2*spin2, cols orb1+2*orb2.
    # hermiticity of H requires SO[s1+2s2, o1+2o2] = conj(SO[s2+2s1, o2+2o1])
    so = np.zeros((4, 4))
    # diagonal spin blocks: symmetric orbital matrix
    so[0, :] = [0.3, 0.1, 0.1, -0.3]
    so[3, :] = [-0.3, 0.1, 0.1, 0.3]
    # spin-flip blocks: SO[1] = up->down coupling, SO[2] its conjugate
    so[1, :] = [0.2, 0.05, 0.07, -0.2]
    so[2, :] = [0.2, 0.07, 0.05, -0.2]
    inp = parse_input(so_text(2, 1, 1, list(so.reshape(-1))))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((1, 1))
    dense = model.hamiltonian(basis).to_dense()
    np.testing.assert_allclose(dense, dense.T.conj(), atol=1e-11)
    eng = Engine(model, inp)
    expect = np.linalg.eigvalsh(dense)[0].real
    assert eng.ground_energy == pytest.approx(expect, abs=1e-9)
