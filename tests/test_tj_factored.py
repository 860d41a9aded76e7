"""Half-cut block-factorized t-J solver vs the flat ELL path
(which is itself oracle-tested against brute-force second quantization
in tests/test_tj.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.models.tj_factored import build_factored_tj
from lanczosplusplus_tpu.solver import lanczos as lz


def tj_input(nsite, nup, ndn, t=1.0, jpm=0.7, jzz=0.4, w=0.3,
             periodic=1, potentials=False):
    def term(val):
        return f"""DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {val}
"""
    pv = ""
    if potentials:
        vals = [f"{0.1 * (i + 1):.2f}" for i in range(2 * nsite)]
        pv = f"potentialV {2 * nsite} {' '.join(vals)}\n"
    return f"""
TotalNumberOfSites={nsite}
NumberOfTerms=4
{term(t)}{term(jpm)}{term(jzz)}{term(w)}Model=TjMultiOrb
Orbitals=1
{pv}SolverOptions=none
TargetElectronsUp={nup}
TargetElectronsDown={ndn}
IsPeriodicX={periodic}
"""


@pytest.mark.parametrize("nsite,nup,ndn,periodic", [
    (6, 2, 2, 1),
    (6, 3, 2, 0),
    (7, 3, 3, 1),
    (6, 2, 3, 1),
    (5, 2, 1, 0),
])
def test_factored_matches_flat_dense(nsite, nup, ndn, periodic):
    inp = parse_input(tj_input(nsite, nup, ndn, periodic=periodic,
                               potentials=True))
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((nup, ndn))
    flat = model.hamiltonian(basis).to_dense()
    fact = build_factored_tj(model, basis)
    assert fact.dim == basis.size
    dense = fact.to_dense()
    np.testing.assert_allclose(dense, flat, atol=1e-12)


def test_factored_ground_state_and_batched():
    inp = parse_input(tj_input(8, 3, 3))
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((3, 3))
    flat = model.hamiltonian(basis)
    fact = build_factored_tj(model, basis)
    e_flat, _ = lz.lowest_states(flat, max_steps=150)
    e_fact, v_fact = lz.lowest_states(fact, max_steps=150)
    assert e_fact[0] == pytest.approx(e_flat[0], abs=1e-9)
    # residual in the flat Hamiltonian (orders must agree)
    v0 = np.asarray(v_fact[0])
    resid = np.linalg.norm(np.asarray(flat.matvec(jnp.asarray(v0)))
                           - float(e_fact[0]) * v0)
    assert resid < 1e-7
    # batch-major SpMM equals per-vector matvec
    rng = np.random.default_rng(2)
    xk = rng.standard_normal((3, fact.dim))
    y1 = np.asarray(fact.matmat_t(jnp.asarray(xk)))
    y2 = np.stack([np.asarray(fact.matvec(jnp.asarray(xk[i])))
                   for i in range(3)])
    np.testing.assert_allclose(y1, y2, atol=1e-10)


def test_factored_nnz_counts_cross_terms():
    inp = parse_input(tj_input(6, 2, 2))
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((2, 2))
    fact = build_factored_tj(model, basis)
    assert fact.nnz > fact.dim  # diagonal plus couplings


def tj2_input(nsite, nup, ndn, periodic=0, hund="0"):
    """2-orbital t-J chain with full 2x2 orbital connectors."""
    def term(d0, d1, off):
        return f"""DegreesOfFreedom=2
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 2 2
{d0} {off}
{off} {d1}
"""
    return (f"TotalNumberOfSites={nsite}\nNumberOfTerms=4\n"
            + term(-1.0, -0.8, 0.2) + term(0.4, 0.3, 0.1)
            + term(0.35, 0.3, 0.0) + term(-0.1, 0.1, 0.0)
            + f"""Model=TjMultiOrb
Orbitals=2
JHundInfinity={hund}
potentialV {4 * nsite} {' '.join(
        f'{0.05 * (i + 1):.2f}' for i in range(4 * nsite))}
SolverOptions=none
TargetElectronsUp={nup}
TargetElectronsDown={ndn}
IsPeriodicX={periodic}
""")


@pytest.mark.parametrize("nsite,nup,ndn,periodic", [
    (3, 2, 2, 0),
    (4, 2, 2, 1),
    (4, 3, 2, 0),
])
def test_factored_multiorbital_matches_flat_dense(nsite, nup, ndn,
                                                  periodic):
    """2-orbital half-cut (per-(site,orbital) bits; the spatial cut
    still factorizes): elementwise equal to the flat path, which is
    brute-force oracle-tested in tests/test_tj.py."""
    inp = parse_input(tj2_input(nsite, nup, ndn, periodic=periodic))
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((nup, ndn))
    flat_h = model.hamiltonian(basis)
    fact = build_factored_tj(model, basis)
    assert fact is not None and fact.dim == basis.size
    eye = jnp.eye(basis.size, dtype=jnp.float64)
    flat = np.asarray(flat_h.matmat_t(eye)).T
    dense = np.asarray(fact.matmat_t(eye)).T
    np.testing.assert_allclose(dense, flat, atol=1e-12)


def test_factored_multiorbital_ground_state():
    inp = parse_input(tj2_input(4, 3, 3, periodic=1))
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((3, 3))
    e_flat, _ = lz.lowest_states(model.hamiltonian(basis),
                                 max_steps=150)
    e_fact, _ = lz.lowest_states(build_factored_tj(model, basis),
                                 max_steps=150)
    assert e_fact[0] == pytest.approx(e_flat[0], abs=1e-9)


def test_tier_layouts_match_untired():
    """All tier layouts (fine-grained pairs, aspect classes, uniform)
    apply the identical operator (round-5 kernel-batching work)."""
    import dataclasses
    from lanczosplusplus_tpu.core.blockkron import (
        tierize, tierize_classes, tierize_uniform)

    inp = parse_input(tj_input(8, 3, 3, potentials=True))
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((3, 3))
    fact = build_factored_tj(model, basis)
    bk0 = dataclasses.replace(fact.inner, tiers=None, diag_t=(),
                              row_t=(), col_t=())
    rng = np.random.default_rng(5)
    x = rng.standard_normal(bk0.dim)
    y0 = np.asarray(bk0.matvec(jnp.asarray(x)))
    xk = jnp.asarray(rng.standard_normal((3, bk0.dim)))
    z0 = np.asarray(bk0.matmat_t(xk))
    for tier_fn in (tierize, lambda b: tierize_classes(b, 1e9),
                    lambda b: tierize_uniform(b, max_blowup=1e9)):
        bkt = tier_fn(bk0)
        assert bkt.tiers, tier_fn
        np.testing.assert_allclose(
            np.asarray(bkt.matvec(jnp.asarray(x))), y0, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(bkt.matmat_t(xk)), z0, atol=1e-10)


def test_factored_out_of_scope_returns_none():
    """JHundInfinity's reinterpretAndTruncate rotation stays on the
    flat path."""
    inp = parse_input(tj2_input(2, 1, 1, hund="1"))
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((1, 1))
    assert build_factored_tj(model, basis) is None


def test_factored_engine_spectral_matches_flat():
    """SolverOptions=factored t-J: ground state AND a spectral
    continued fraction equal the flat-path results (the factored
    Hamiltonians feed the same Engine pipelines through matmat_t)."""
    from lanczosplusplus_tpu.engine import Engine

    text = tj_input(6, 2, 2)
    inp = parse_input(text)
    eng_flat = Engine(build_model(inp, Geometry(inp)), inp)
    text_f = text.replace("SolverOptions=none", "SolverOptions=factored")
    inp_f = parse_input(text_f)
    eng_fact = Engine(build_model(inp_f, Geometry(inp_f)), inp_f)
    assert eng_fact.ground_energy == pytest.approx(
        eng_flat.ground_energy, abs=1e-10)
    coll_flat, _ = eng_flat.spectral_function("c", 0, 1)
    coll_fact, _ = eng_fact.spectral_function("c", 0, 1)
    omegas = np.linspace(-6, 6, 40)
    g_flat = coll_flat.evaluate(omegas, 0.2)
    g_fact = coll_fact.evaluate(omegas, 0.2)
    np.testing.assert_allclose(g_fact, g_flat, atol=1e-8)
