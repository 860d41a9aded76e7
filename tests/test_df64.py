"""On-chip double-float emulation: the df64 Rayleigh refinement must
recover f64-grade energies from f32 Lanczos states (reference bar:
double precision everywhere, src/Engine/LanczosDriver.h:29-33)."""

import numpy as np
import pytest
import jax.numpy as jnp

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.ops import df64
from lanczosplusplus_tpu.solver import lanczos as lz


def test_two_sum_two_prod_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    s, e = df64.two_sum(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)
    p, e = df64.two_prod(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_df_sum_pairwise_accuracy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(100003).astype(np.float32)
    h, low = df64.df_sum_pairwise(jnp.asarray(x), jnp.zeros(100003,
                                                            jnp.float32))
    exact = x.astype(np.float64).sum()
    got = float(np.float64(np.asarray(h)) + np.float64(np.asarray(low)))
    assert abs(got - exact) < 1e-9 * max(abs(exact), 1.0)


def _hubbard(nsite, dtype):
    text = f"""
TotalNumberOfSites={nsite}
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU {nsite} {" ".join(["4"] * nsite)}
potentialV {2 * nsite} {" ".join(["0"] * 2 * nsite)}
SolverOptions=none
TargetElectronsUp={nsite // 2}
TargetElectronsDown={nsite // 2}
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((nsite // 2, nsite // 2))
    return model.hamiltonian(basis, dtype=dtype)


def test_refined_energy_recovers_f64():
    """f32 solve + df64 Rayleigh refinement lands within 1e-10 of the
    all-f64 ground energy (f32 alone sits at ~1e-6)."""
    ham32 = _hubbard(8, np.float32)
    ham64 = _hubbard(8, np.float64)
    e64, _ = lz.lowest_states(ham64, max_steps=150)
    e32, v32, info = lz.lowest_states(ham32, max_steps=150,
                                      return_info=True,
                                      refine=False)
    refined = df64.refined_energy(ham32, np.asarray(v32[0]))
    rel = abs(refined - e64[0]) / abs(e64[0])
    assert rel < 1e-10, (refined, e64[0], rel)


def test_lowest_states_auto_refines_f32():
    ham32 = _hubbard(8, np.float32)
    ham64 = _hubbard(8, np.float64)
    e64, _ = lz.lowest_states(ham64, max_steps=150)
    e32, _ = lz.lowest_states(ham32, max_steps=150)
    assert abs(float(e32[0]) - e64[0]) / abs(e64[0]) < 1e-10


def test_refined_energy_ell_model():
    """Generic-ELL (Heisenberg) path of the df64 apply."""
    text = """
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
TargetSzPlusConst=5
SolverOptions=none
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis(model.default_parts(inp))
    ham32 = model.hamiltonian(basis, dtype=np.float32)
    ham64 = model.hamiltonian(basis, dtype=np.float64)
    e64, _ = lz.lowest_states(ham64, max_steps=150)
    e32, v32 = lz.lowest_states(ham32, max_steps=150)
    # the VERDICT bar: <= 1e-8 relative (plain f32 sits at ~1e-6)
    assert abs(float(e32[0]) - e64[0]) / abs(e64[0]) < 1e-8
