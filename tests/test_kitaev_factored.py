"""Block-factorized Kitaev solver vs the flat ELL Hamiltonian."""

import numpy as np
import pytest
import jax.numpy as jnp

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.models.kitaev_factored import (
    build_factored_kitaev)

KITAEV = """
TotalNumberOfSites={n}
NumberOfTerms=3
DegreesOfFreedom=1
GeometryKind={kind}
GeometryOptions=ConstantValues
Connectors 1 {jx}
DegreesOfFreedom=1
GeometryKind={kind}
GeometryOptions=ConstantValues
Connectors 1 {jy}
DegreesOfFreedom=1
GeometryKind={kind}
GeometryOptions=ConstantValues
Connectors 1 {jz}
Model=Kitaev
SolverOptions={solver}
{extra}"""


def setup(n=6, kind="chain", jx=1.1, jy=0.7, jz=0.9, solver="none",
          extra=""):
    inp = parse_input(KITAEV.format(n=n, kind=kind, jx=jx, jy=jy,
                                    jz=jz, solver=solver, extra=extra))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis(None)
    return inp, model, basis


def test_factored_matches_flat_dense():
    inp, model, basis = setup(n=6)
    flat = model.hamiltonian(basis, dtype=np.float64)
    fact = build_factored_kitaev(model, basis, dtype=np.float64)
    assert fact.dim == flat.dim
    np.testing.assert_allclose(fact.to_dense(), np.asarray(flat.to_dense()),
                               atol=1e-12)


def test_factored_with_field_and_odd_cut():
    inp, model, basis = setup(n=7, extra="MagneticField 7 "
                              "0.1 -0.2 0.3 0 0.1 0.2 -0.3\n")
    flat = model.hamiltonian(basis, dtype=np.float64)
    fact = build_factored_kitaev(model, basis, dtype=np.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(flat.dim)
    y_flat = np.asarray(flat.matvec(jnp.asarray(x)))
    y_fact = np.asarray(fact.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y_fact, y_flat, atol=1e-12)


def test_factored_ladder_multiple_cross_bonds():
    inp, model, basis = setup(n=8, kind="ladder")
    flat = model.hamiltonian(basis, dtype=np.float64)
    fact = build_factored_kitaev(model, basis, dtype=np.float64)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((flat.dim, 3))
    y_flat = np.asarray(flat.matmat(jnp.asarray(x)))
    y_fact = np.asarray(fact.matmat(jnp.asarray(x)))
    np.testing.assert_allclose(y_fact, y_flat, atol=1e-12)
    # batch-major path
    y_t = np.asarray(fact.matmat_t(jnp.asarray(x.T))).T
    np.testing.assert_allclose(y_t, y_flat, atol=1e-12)


def test_engine_factored_kitaev_ground_state():
    from lanczosplusplus_tpu.engine import Engine

    inp_d, model_d, _ = setup(n=8)
    e_default = Engine(model_d, inp_d)
    inp_f, model_f, _ = setup(n=8, solver="factored")
    e_fact = Engine(model_f, inp_f)
    assert e_fact.energies(0) == pytest.approx(e_default.energies(0),
                                               abs=1e-8)


def test_bf16_factor_matvec_accuracy():
    import jax.numpy as jnp

    inp, model, basis = setup(n=8)
    f32 = build_factored_kitaev(model, basis, dtype=np.float32)
    b16 = build_factored_kitaev(model, basis, dtype=np.float32,
                                factor_dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(f32.dim).astype(np.float32))
    y32 = np.asarray(f32.matvec(x))
    y16 = np.asarray(b16.matvec(x))
    assert y16.dtype == np.float32        # accumulation stays f32
    assert np.abs(y16 - y32).max() < 2e-2 * np.abs(y32).max()
