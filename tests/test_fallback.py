"""Failure-triggered dense fallback + convergence reporting
(reference: src/Engine/Engine.h:624-639 catches the Lanczos throw and
full-diagonalizes the sector)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lanczosplusplus_tpu.core.sparse import (EllPart, Hamiltonian,
                                             coo_to_ell)
from lanczosplusplus_tpu.solver import lanczos as lz


def _random_sparse_ham(dim=300, seed=5):
    rng = np.random.default_rng(seed)
    nnz = dim * 4
    r = rng.integers(0, dim, nnz)
    c = rng.integers(0, dim, nnz)
    v = rng.normal(size=nnz)
    rows = np.concatenate([r, c])
    cols = np.concatenate([c, r])
    vals = np.concatenate([v, v])  # symmetric
    ell_cols, ell_vals = coo_to_ell(dim, rows, cols, vals)
    diag = rng.normal(size=dim)
    return Hamiltonian(diag=jnp.asarray(diag),
                       ell=EllPart(cols=jnp.asarray(ell_cols),
                                   vals=jnp.asarray(ell_vals)),
                       factorized=None, spin_shape=None), diag


def test_unconverged_lanczos_falls_back_to_dense():
    ham, _ = _random_sparse_ham()
    # max_steps=2 (extends only to 8) cannot converge to 1e-10 on a
    # dim-300 random matrix: the dense fullDiag fallback must engage
    evals, vecs, info = lz.lowest_states(ham, num_states=2, max_steps=2,
                                         tol=1e-10, return_info=True)
    assert info.used_dense_fallback
    assert info.converged
    dense = ham.to_dense()
    exact = np.linalg.eigh(dense)[0]
    np.testing.assert_allclose(np.asarray(evals), exact[:2], atol=1e-10)
    # fallback eigenvectors are exact
    v0 = np.asarray(vecs[0])
    resid = np.linalg.norm(dense @ v0 - evals[0] * v0)
    assert resid < 1e-8


def test_unconverged_without_fallback_reports_flag():
    ham, _ = _random_sparse_ham()
    evals, vecs, info = lz.lowest_states(
        ham, num_states=1, max_steps=2, tol=1e-10, return_info=True,
        dense_fallback_dim=0)
    assert not info.converged
    assert info.residual > 0


def test_unconverged_strict_raises():
    ham, _ = _random_sparse_ham()
    with pytest.raises(RuntimeError, match="residual"):
        lz.lowest_states(ham, num_states=1, max_steps=2, tol=1e-10,
                         dense_fallback_dim=0, strict=True)


def test_converged_solve_reports_converged():
    ham, _ = _random_sparse_ham(dim=200)
    evals, vecs, info = lz.lowest_states(ham, num_states=1,
                                         max_steps=200, return_info=True)
    assert info.converged
    assert not info.used_dense_fallback
    exact = np.linalg.eigh(ham.to_dense())[0]
    np.testing.assert_allclose(float(evals[0]), exact[0], atol=1e-9)


def test_factored_fallback_is_loud():
    """SolverOptions=factored on a model with no factored builder must
    warn (ProgressIndicator + SolveInfo.factored_fallback) and still
    complete the solve on the flat path (VERDICT r3 item 7)."""
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine

    text = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4 0 0 0 0
potentialV 8 0 0 0 0 0 0 0 0
SolverOptions=factored
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""
    inp = parse_input(text)
    eng = Engine(build_model(inp, Geometry(inp)), inp)
    assert eng.factored_fallback_reason is not None
    assert "factored" in eng.factored_fallback_reason
    assert eng.solve_info.factored_fallback == \
        eng.factored_fallback_reason
    # the solve still completed on the flat path: U=0 open 4-site chain
    assert eng.ground_energy == pytest.approx(-4.472135955, abs=1e-6)


def test_factored_used_reports_no_fallback():
    """A model WITH a factored builder must not set the fallback flag."""
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine

    n = 8
    text = f"""
TotalNumberOfSites={n}
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
TargetSzPlusConst={n // 2}
SolverOptions=factored
IsPeriodicX=0
"""
    inp = parse_input(text)
    eng = Engine(build_model(inp, Geometry(inp)), inp)
    assert eng.factored_fallback_reason is None
    assert eng.solve_info.factored_fallback is None


def test_memory_bounded_restarted_lanczos():
    """When the Krylov budget blocks step-doubling, lowest_states
    restarts from the current Ritz vector instead of returning an
    unconverged result (memory-bounded restarted Lanczos)."""
    ham, _ = _random_sparse_ham(dim=400, seed=9)
    budget = 32 * 400 * 8 + 1  # one 32-step f64 basis only
    evals, vecs, info = lz.lowest_states(
        ham, num_states=1, max_steps=32, return_info=True,
        krylov_budget_bytes=budget)
    exact = np.linalg.eigh(ham.to_dense())[0]
    assert info.converged
    np.testing.assert_allclose(float(evals[0]), exact[0], atol=1e-8)


def test_bf16cross_option_solves_exactly():
    """SolverOptions=factored,bf16cross: bf16 cross-amplitude tables,
    exact final energy through the RQI refinement's unquantized
    host-f64 residual."""
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model
    from lanczosplusplus_tpu.engine import Engine

    n, ne = 6, 6
    term = """DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 {v}
"""
    base = (f"TotalNumberOfSites={n}\nNumberOfTerms=2\n"
            + term.format(v=-1.0) + term.format(v=0.5)
            + "Model=HubbardOneBandRashbaSOC\n"
            + f"hubbardU {n} {' '.join(['4'] * n)}\n"
            + f"potentialV {2 * n} {' '.join(['0'] * 2 * n)}\n"
            + f"TargetElectronsTotal={ne}\nIsPeriodicX=1\n")
    e_ref = Engine(
        *(lambda i: (build_model(i, Geometry(i)), i))(
            parse_input(base + "SolverOptions=factored\n"))
    ).ground_energy
    inp16 = parse_input(base + "SolverOptions=factored,bf16cross\n")
    eng16 = Engine(build_model(inp16, Geometry(inp16)), inp16)
    import jax.numpy as jnp
    ham = eng16._ham_cache[eng16.parts]
    assert ham.inner.perm_cross[0].state_cast == "bf16"
    assert ham.quantized
    assert eng16.ground_energy == pytest.approx(e_ref, abs=1e-8)
