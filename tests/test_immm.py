"""Immm model tests: hermiticity, hole-language diagonal, brute oracle."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine


def immm_input(nsite, nup, ndown):
    return parse_input(f"""
TotalNumberOfSites={nsite}
NumberOfTerms=2
DegreesOfFreedom=2
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 2 2
-1.0 -0.5
-0.5 -0.8
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.6
Model=Immm
hubbardU {nsite} {" ".join(["3"] * nsite)}
potentialV {nsite} {" ".join(["0.2"] * nsite)}
SolverOptions=none
TargetElectronsUp={nup}
TargetElectronsDown={ndown}
IsPeriodicX=0
""")


def test_immm_basis_size():
    inp = immm_input(4, 2, 2)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    # orbitals: [2,1,2,1] -> 6 valid modes per spin
    basis = model.create_basis((2, 2))
    from math import comb
    assert basis.up.size == comb(6, 2)
    assert basis.size == comb(6, 2) ** 2


def test_immm_hermitian_and_diag():
    inp = immm_input(4, 2, 2)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    # hole-language U: state with everything empty has U contribution
    # sum over (site, orb) of U_i = 3 * 6 = 18... check via the vacuum
    vac_basis = model.create_basis((0, 0))
    vac_diag = float(np.asarray(model.hamiltonian(vac_basis).diag)[0])
    # U*(1)(1) per valid (site,orb) + Upd*(2-0)(2-0) per O-orb/Cu pair;
    # O sites 0,2 (2 orbitals each), Cu sites 1,3
    upd = geom.coupling_matrix(1)
    expect = 3.0 * 6
    for i in (0, 2):
        for orb in range(2):
            for j in (1, 3):
                expect_add = upd[i, j] * 4
                expect += expect_add
    assert vac_diag == pytest.approx(expect, abs=1e-10)


def test_immm_engine_vs_arpack():
    inp = immm_input(4, 2, 2)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    dense = eng.hamiltonian.to_dense()
    expect = np.linalg.eigvalsh(dense)[0]
    assert eng.ground_energy == pytest.approx(expect, abs=1e-9)


def test_immm_gf_lehmann():
    """Immm one-particle GF vs Lehmann (orbital 1 on an O site)."""
    inp = immm_input(2, 1, 1)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    coll, labels = eng.spectral_function("c", 0, 0, spin=0, orbs=(1, 1))
    omegas = np.linspace(-6, 8, 41)
    delta = 0.12
    got = coll.evaluate(omegas, delta)
    from lanczosplusplus_tpu.engine.operators import LabeledOperator
    dense0 = eng.hamiltonian.to_dense()
    e0s, v0s = np.linalg.eigh(dense0)
    gs = v0s[:, 0]
    z = omegas + 1j * delta
    expect = np.zeros_like(z)
    for op_name, sigma in (("cdagger", +1), ("c", -1)):
        op = LabeledOperator(op_name)
        parts_new = model.has_new_parts((1, 1), op, 0, 1)
        if parts_new is None:
            continue
        bas = model.create_basis(parts_new)
        tgt, amp, dst = model.operator_map(op, 0, 0, 1, eng.basis, bas)
        phi = np.zeros(dst)
        mask = tgt >= 0
        np.add.at(phi, tgt[mask], amp[mask] * gs[mask])
        h = model.hamiltonian(bas).to_dense()
        es, vs = np.linalg.eigh(h)
        a = vs.T @ phi
        for m in range(len(es)):
            expect += a[m] ** 2 / (z - sigma * (es[m] - e0s[0]))
    np.testing.assert_allclose(got, expect, atol=1e-8)


def ktwoniffour_input(nsite, nup, ndown, periodic=0):
    return parse_input(f"""
TotalNumberOfSites={nsite}
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=ktwoniffour
GeometryOptions=ConstantValues
Connectors 2 -1.0 -0.3
DegreesOfFreedom=1
GeometryKind=ktwoniffour
GeometryOptions=ConstantValues
Connectors 1 0.6
Model=Immm
hubbardU {nsite} {" ".join(["3"] * nsite)}
potentialV {nsite} {" ".join(["0.2"] * nsite)}
SolverOptions=none
TargetElectronsUp={nup}
TargetElectronsDown={ndown}
IsPeriodicX={periodic}
""")


def test_ktwoniffour_pattern_and_bonds():
    """KTwoNiFFour geometry: [O,O,Cu] cells, Cu-O + O-O hopping bonds,
    Upd on Cu-O only (reconstruction, see geometry.ktwoniffour_types)."""
    inp = ktwoniffour_input(6, 2, 2)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    assert model.orbs_per_site == [2, 2, 1, 2, 2, 1]
    hop = geom.coupling_matrix(0)
    # within cell 0: Cu(2)-O(0), Cu(2)-O(1), O(0)-O(1); across: Cu(2)-O(3)
    assert hop[0, 2] == -1.0 and hop[1, 2] == -1.0
    assert hop[0, 1] == -0.3
    assert hop[2, 3] == -1.0
    assert hop[0, 3] == 0.0
    np.testing.assert_allclose(hop, hop.T)
    upd = geom.coupling_matrix(1)
    assert upd[0, 2] == 0.6 and upd[1, 2] == 0.6
    assert upd[0, 1] == 0.0  # no O-O density coupling


def test_ktwoniffour_engine_vs_dense():
    inp = ktwoniffour_input(6, 2, 2)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    dense = eng.hamiltonian.to_dense()
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)
    expect = np.linalg.eigvalsh(dense)[0]
    assert eng.ground_energy == pytest.approx(expect, abs=1e-9)
