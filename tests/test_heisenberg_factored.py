"""Block-factorized Heisenberg solver vs the flat ELL path."""

import numpy as np
import jax.numpy as jnp
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models.heisenberg import HeisenbergModel
from lanczosplusplus_tpu.models.heisenberg_factored import \
    FactoredHeisenbergChain
from lanczosplusplus_tpu.solver.lanczos import lowest_states


def _model(nsite, periodic=True, anisotropy=1.0, twice_s=1, extra=""):
    inp = parse_input(f"""
TotalNumberOfSites={nsite}
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {anisotropy}
Model=Heisenberg
HeisenbergTwiceS={twice_s}
SolverOptions=none
IsPeriodicX={1 if periodic else 0}
{extra}
""")
    return HeisenbergModel(inp, Geometry(inp)), inp


@pytest.mark.parametrize("nsite,periodic", [(8, False), (10, True)])
def test_factored_matches_flat(nsite, periodic):
    model, inp = _model(nsite, periodic=periodic, anisotropy=0.7)
    szpc = nsite // 2
    basis = model.create_basis((1, szpc))
    flat = model.hamiltonian(basis)
    fact = FactoredHeisenbergChain(model, nsite, szpc)
    assert fact.ham.dim == basis.size
    # full spectra agree
    d1 = np.linalg.eigvalsh(flat.to_dense())
    d2 = np.linalg.eigvalsh(fact.ham.to_dense())
    np.testing.assert_allclose(d1, d2, atol=1e-9)


@pytest.mark.parametrize("twice_s,nsite,szpc", [(2, 6, 6), (2, 6, 4),
                                                (3, 5, 7), (4, 4, 8)])
def test_factored_matches_flat_general_spin(twice_s, nsite, szpc):
    """Arbitrary-S half-cut factorization: full spectra match the flat
    ELL Hamiltonian (S = 1, 3/2, 2; off-center sectors included)."""
    model, inp = _model(nsite, periodic=True, anisotropy=0.6,
                        twice_s=twice_s)
    basis = model.create_basis((twice_s, szpc))
    flat = model.hamiltonian(basis)
    fact = FactoredHeisenbergChain(model, nsite, szpc)
    assert fact.ham.dim == basis.size
    d1 = np.linalg.eigvalsh(flat.to_dense())
    d2 = np.linalg.eigvalsh(fact.ham.to_dense())
    np.testing.assert_allclose(d1, d2, atol=1e-9)


def test_factored_field_and_anisotropy():
    """MagneticField + AnisotropyD single-site terms are carried by the
    factored form (they were silently dropped pre-round-2 for the flat
    comparison; reference diagonal: Heisenberg.h:242-276)."""
    nsite, twice_s, szpc = 6, 2, 5
    extra = ("MagneticField 6 0.3 -0.1 0.2 0.05 -0.4 0.15\n"
             "AnisotropyD 6 0.2 0.2 0.1 -0.3 0.25 0.1\n")
    model, inp = _model(nsite, periodic=True, twice_s=twice_s,
                        extra=extra)
    basis = model.create_basis((twice_s, szpc))
    flat = model.hamiltonian(basis)
    fact = FactoredHeisenbergChain(model, nsite, szpc)
    d1 = np.linalg.eigvalsh(flat.to_dense())
    d2 = np.linalg.eigvalsh(fact.ham.to_dense())
    np.testing.assert_allclose(d1, d2, atol=1e-9)
    # and through the flat-order adapter (perm wiring)
    fh = fact.flat_ham(basis)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(basis.size)
    np.testing.assert_allclose(np.asarray(fh.matvec(jnp.asarray(x))),
                               np.asarray(flat.matvec(jnp.asarray(x))),
                               atol=1e-9)


def test_factored_spin1_engine_option():
    """SolverOptions=factored now covers S=1 through Engine."""
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine

    def eng(opts):
        inp = parse_input(f"""
TotalNumberOfSites=6
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
Model=Heisenberg
HeisenbergTwiceS=2
SolverOptions={opts}
TargetSzPlusConst=6
IsPeriodicX=1
""")
        g = Geometry(inp)
        return Engine(build_model(inp, g), inp)

    e1 = eng("none")
    e2 = eng("factored")
    assert abs(e1.ground_energy - e2.ground_energy) < 1e-9
    np.testing.assert_allclose(np.asarray(e1.two_point("sz")),
                               np.asarray(e2.two_point("sz")),
                               atol=1e-8)


def test_factored_lanczos_groundstate():
    nsite = 12
    model, inp = _model(nsite, periodic=True)
    szpc = nsite // 2
    basis = model.create_basis((1, szpc))
    fact = FactoredHeisenbergChain(model, nsite, szpc)
    evals, evecs = lowest_states(fact.ham, num_states=1, max_steps=200,
                                 seed=5, tol=1e-10)
    # literature: 12-site PBC Heisenberg chain E0 (Jpm=Jzz=1 in our
    # H = sum J/2(S+S- + h.c.)/... normalization equals flat model)
    flat = model.hamiltonian(basis)
    ev_f, vec_f = lowest_states(flat, num_states=1, max_steps=200, seed=3,
                                tol=1e-10)
    assert abs(float(evals[0]) - float(ev_f[0])) < 1e-8
    # eigenvector maps to the flat order with unit overlap
    x = fact.to_flat_order(np.asarray(evecs[0]), basis)
    ov = abs(np.vdot(x, np.asarray(vec_f[0])))
    assert ov > 1 - 1e-8


def test_factored_scales_blocks():
    nsite = 14
    model, inp = _model(nsite, periodic=False)
    szpc = 7
    fact = FactoredHeisenbergChain(model, nsite, szpc)
    basis = model.create_basis((1, szpc))
    assert fact.ham.dim == basis.size
    # one matvec against the flat path on a random vector
    rng = np.random.default_rng(0)
    xb = rng.standard_normal(fact.ham.dim)
    yb = np.asarray(fact.ham.matvec(jnp.asarray(xb)))
    flat = model.hamiltonian(basis)
    xf = fact.to_flat_order(xb, basis)
    yf = np.asarray(flat.matvec(jnp.asarray(xf)))
    np.testing.assert_allclose(fact.to_flat_order(yb, basis), yf,
                               atol=1e-9)


def test_engine_factored_option():
    """SolverOptions=factored gives the same physics through Engine."""
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine

    def eng(opts):
        inp = parse_input(f"""
TotalNumberOfSites=10
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
Model=Heisenberg
HeisenbergTwiceS=1
SolverOptions={opts}
TargetSzPlusConst=5
IsPeriodicX=1
""")
        g = Geometry(inp)
        return Engine(build_model(inp, g), inp)

    e1 = eng("none")
    e2 = eng("factored")
    assert abs(e1.ground_energy - e2.ground_energy) < 1e-9
    m1 = np.asarray(e1.two_point("sz"))
    m2 = np.asarray(e2.two_point("sz"))
    np.testing.assert_allclose(m1, m2, atol=1e-8)


def test_engine_factored_spectral():
    """Dynamic runs (sz and sector-changing s+) agree between the
    factored and flat engines."""
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine

    def eng(opts):
        inp = parse_input(f"""
TotalNumberOfSites=8
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
Model=Heisenberg
HeisenbergTwiceS=1
SolverOptions={opts}
TargetSzPlusConst=4
IsPeriodicX=1
""")
        g = Geometry(inp)
        return Engine(build_model(inp, g), inp)

    e1 = eng("none")
    e2 = eng("factored")
    om = np.linspace(-2, 8, 40)
    for op in ("sz", "splus"):
        c1, _ = e1.spectral_function(op, 1, 3, spin=0)
        c2, _ = e2.spectral_function(op, 1, 3, spin=0)
        g1 = sum(cf.evaluate(om, 0.1) for cf in c1.items)
        g2 = sum(cf.evaluate(om, 0.1) for cf in c2.items)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-6)


def test_engine_factored_gate_spin1_taken():
    """The Engine actually takes the factored path for S >= 1 (round-2
    left a stale twice_s==1 gate that silently fell back to flat)."""
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine

    inp = parse_input("""
TotalNumberOfSites=6
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
Model=Heisenberg
HeisenbergTwiceS=2
SolverOptions=factored
TargetSzPlusConst=6
IsPeriodicX=1
""")
    g = Geometry(inp)
    e = Engine(build_model(inp, g), inp)
    assert e._factored is True
    from lanczosplusplus_tpu.core.blockkron import (
        BlockKronHamiltonian, PermutedHamiltonian)
    assert isinstance(e._cached_hamiltonian(e.parts),
                      (BlockKronHamiltonian, PermutedHamiltonian))


def test_engine_factored_fallback_asymmetric():
    """Asymmetric jpm/jzz couplings have no factored form; the
    dispatcher returns None (instead of leaking NotImplementedError,
    ADVICE r2) and the Engine falls back to the flat path."""
    from lanczosplusplus_tpu.engine import Engine
    from lanczosplusplus_tpu.models import factored_hamiltonian_or_none

    model, inp = _model(6, periodic=True, extra="TargetSzPlusConst=3")
    model.jpm = model.jpm.copy()
    model.jpm[0, 1] = 0.5   # != jpm[1, 0] -> asymmetric
    basis = model.create_basis((1, 3))
    assert factored_hamiltonian_or_none(model, basis, (1, 3),
                                        np.float64) is None
    inp_f = parse_input("""
TotalNumberOfSites=6
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.7
Model=Heisenberg
HeisenbergTwiceS=1
SolverOptions=factored
TargetSzPlusConst=3
IsPeriodicX=1
""")
    # Engine must not crash; it silently uses the flat path
    e = Engine(model, inp_f)
    assert e._factored is False
    assert np.isfinite(e.ground_energy)
