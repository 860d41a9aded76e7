"""Kitaev model vs independent kron-construction oracle."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine


def kitaev_input(nsite, jx, jy, jz, periodic=0, extra=""):
    def term(v):
        return f"""DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {v}
"""
    return (f"TotalNumberOfSites={nsite}\nNumberOfTerms=3\n"
            + term(jx) + term(jy) + term(jz)
            + f"Model=Kitaev\nSolverOptions=none\nIsPeriodicX={periodic}\n"
            + extra)


def brute_kitaev_dense(nsite, jxm, jym, jzm, bfield=None):
    # basis index = site bit value: 0 -> m=-1/2, 1 -> m=+1/2
    sz = 0.5 * np.array([[-1, 0], [0, 1]])
    sp = np.array([[0.0, 0.0], [1.0, 0.0]])
    sm = sp.T
    sx = 0.5 * (sp + sm)
    sy = (sp - sm) / 2j

    def site_op(op, i):
        out = np.eye(1)
        for k in range(nsite):
            out = np.kron(op if k == i else np.eye(2), out)
        return out

    dim = 2 ** nsite
    H = np.zeros((dim, dim), dtype=complex)
    for i in range(nsite):
        if bfield is not None and i < len(bfield):
            H += bfield[i] * site_op(sz, i)
        for j in range(i + 1, nsite):
            H += jxm[i, j] * site_op(sx, i) @ site_op(sx, j)
            H += jym[i, j] * site_op(sy, i) @ site_op(sy, j)
            H += jzm[i, j] * site_op(sz, i) @ site_op(sz, j)
    assert np.abs(H.imag).max() < 1e-12
    return H.real


@pytest.mark.parametrize("jx,jy,jz", [(1.0, 1.0, 1.0),
                                      (1.0, -0.7, 0.3),
                                      (0.6, 1.3, 0.0)])
def test_kitaev_dense_oracle(jx, jy, jz):
    nsite = 6
    inp = parse_input(kitaev_input(nsite, jx, jy, jz,
                                   extra="MagneticField 6 "
                                         "0.1 0 -0.2 0 0.05 0\n"))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis()
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-13)
    brute = brute_kitaev_dense(
        nsite, geom.coupling_matrix(0), geom.coupling_matrix(1),
        geom.coupling_matrix(2), bfield=[0.1, 0, -0.2, 0, 0.05, 0])
    np.testing.assert_allclose(dense, brute, atol=1e-12)


def test_kitaev_engine_ground_state():
    inp = parse_input(kitaev_input(8, 1.0, 1.0, 1.0, periodic=1))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    # Jx=Jy=Jz chain == isotropic Heisenberg chain in the full space;
    # 8-site PBC S=1/2 Heisenberg E0 = -3.651093408937176 (ED)
    assert eng.ground_energy == pytest.approx(-3.651093408937, abs=1e-8)
