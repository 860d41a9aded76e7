"""Geometry tests: ladder conventions, star, longrange, matmat SpMM."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine


def test_ladder_bonds():
    inp = parse_input("""
TotalNumberOfSites=8
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=ladder
GeometryOptions=ConstantValues
LadderLeg=2
Connectors 2 -1.0 -0.5
Model=HubbardOneBand
hubbardU 8 0 0 0 0 0 0 0 0
potentialV 16 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=4
TargetElectronsDown=4
IsPeriodicX=0
""")
    geom = Geometry(inp)
    t = geom.coupling_matrix(0)
    # legs: i <-> i+2 with -1; rungs: (0,1),(2,3),(4,5),(6,7) with -0.5
    assert t[0, 2] == -1.0 and t[2, 4] == -1.0 and t[5, 7] == -1.0
    assert t[0, 1] == -0.5 and t[2, 3] == -0.5 and t[6, 7] == -0.5
    assert t[1, 2] == 0.0  # no diagonal bonds
    np.testing.assert_allclose(t, t.T)
    # 2x4 ladder free fermions: E0 = filled levels
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    eps = np.linalg.eigvalsh(t)
    assert eng.ground_energy == pytest.approx(2 * eps[:4].sum(), abs=1e-9)


def test_star_and_longrange():
    inp = parse_input("""
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=star
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4 0 0 0 0
potentialV 8 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=1
TargetElectronsDown=0
IsPeriodicX=0
""")
    geom = Geometry(inp)
    t = geom.coupling_matrix(0)
    assert t[0, 1] == t[0, 2] == t[0, 3] == -1.0
    assert t[1, 2] == 0


def test_matmat_matches_matvec():
    inp = parse_input("""
TotalNumberOfSites=6
NumberOfTerms=3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.4
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.9
Model=SuperHubbardExtended
hubbardU 6 3 3 3 3 3 3
potentialV 12 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=3
TargetElectronsDown=3
IsPeriodicX=1
""")
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((3, 3))
    for ham in (model.hamiltonian(basis),
                model.hamiltonian(basis).densify_factors()):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((basis.size, 5))
        got = np.asarray(ham.matmat(x))
        expect = np.stack([np.asarray(ham.matvec(x[:, j]))
                           for j in range(5)], axis=1)
        np.testing.assert_allclose(got, expect, atol=1e-10)


def test_ell_spgemm_matches_scipy():
    import scipy.sparse as sp
    import jax.numpy as jnp
    from lanczosplusplus_tpu.core.sparse import ell_spgemm, coo_to_ell
    rng = np.random.default_rng(0)
    n = 200
    for _ in range(3):
        def rand_ell(k):
            cols = rng.integers(0, n, size=(n, k)).astype(np.int32)
            vals = rng.standard_normal((n, k))
            return cols, vals
        ac, av = rand_ell(4)
        bc, bv = rand_ell(3)
        cc, cv = ell_spgemm(jnp.asarray(ac), jnp.asarray(av),
                            jnp.asarray(bc), jnp.asarray(bv))
        def to_sp(c, v):
            r = np.repeat(np.arange(n), c.shape[1])
            return sp.coo_matrix((np.asarray(v).ravel(),
                                  (r, np.asarray(c).ravel())),
                                 shape=(n, n)).tocsr()
        got = to_sp(cc, cv).toarray()
        expect = (to_sp(ac, av) @ to_sp(bc, bv)).toarray()
        np.testing.assert_allclose(got, expect, atol=1e-10)
