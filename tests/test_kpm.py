"""Kernel polynomial method vs dense Chebyshev-moment oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine.kpm import (
    chebyshev_moments, jackson_kernel, kpm_dos, kpm_spectral,
    spectral_bounds)

HUB = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4 4 4 4 4
potentialV 8 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""


def setup():
    inp = parse_input(HUB)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    ham = model.hamiltonian(basis, dtype=np.float64)
    dense = np.asarray(ham.to_dense())
    return ham, dense


def dense_moments(dense, phi, n, emin, emax):
    evals, evecs = np.linalg.eigh(dense)
    a = 0.5 * (emax - emin)
    b = 0.5 * (emax + emin)
    x = (evals - b) / a
    w = np.abs(evecs.T @ phi) ** 2
    theta = np.arccos(np.clip(x, -1, 1))
    return np.asarray([(w * np.cos(k * theta)).sum() for k in range(n)])


def test_moments_match_dense_oracle():
    ham, dense = setup()
    rng = np.random.default_rng(1)
    phi = rng.standard_normal(ham.dim)
    bounds = spectral_bounds(ham)
    n = 64
    res = chebyshev_moments(ham, jnp.asarray(phi), n, bounds=bounds)
    exact = dense_moments(dense, phi, n, *bounds)
    np.testing.assert_allclose(res.moments, exact, rtol=1e-9, atol=1e-9)


def test_bounds_enclose_spectrum():
    ham, dense = setup()
    evals = np.linalg.eigvalsh(dense)
    lo, hi = spectral_bounds(ham)
    assert lo < evals[0] and hi > evals[-1]


def test_dos_trace_with_complete_basis():
    """With the identity start block the stochastic trace is the exact
    trace: moments equal sum_n T_k(x_n)."""
    ham, dense = setup()
    dim = ham.dim
    bounds = spectral_bounds(ham)
    n = 32
    res = chebyshev_moments(ham, jnp.asarray(np.eye(dim)), n,
                            bounds=bounds)
    evals = np.linalg.eigvalsh(dense)
    a, b = res.a, res.b
    x = (evals - b) / a
    theta = np.arccos(np.clip(x, -1, 1))
    exact = np.asarray([np.cos(k * theta).sum() for k in range(n)])
    np.testing.assert_allclose(res.moments, exact, rtol=1e-9, atol=1e-8)
    # density integrates to mu_0 = dim on a fine grid
    es = np.linspace(b - a + 1e-6 * a, b + a - 1e-6 * a, 20001)
    rho = res.density(es)
    assert (rho > -1e-10).all()          # Jackson kernel is positive
    # trapezoid near the +-1 edges (integrand ~ 1/sqrt(1-x^2)) limits
    # the quadrature accuracy, not the KPM moments themselves
    assert np.trapezoid(rho, es) == pytest.approx(dim, rel=5e-3)


def test_kpm_dos_stochastic():
    ham, dense = setup()
    res = kpm_dos(ham, num_moments=64, num_vectors=64, seed=2)
    assert res.moments[0] == pytest.approx(ham.dim, rel=0.1)


def test_kpm_spectral_sum_rules():
    """integral A(w) dw = <phi|phi>; first moment = <phi|H-e0|phi>."""
    ham, dense = setup()
    evals, evecs = np.linalg.eigh(dense)
    e0 = evals[0]
    rng = np.random.default_rng(3)
    phi = rng.standard_normal(ham.dim)
    lo, hi = spectral_bounds(ham)
    omegas = np.linspace(lo - e0 - 0.5, hi - e0 + 0.5, 40001)
    aw = kpm_spectral(ham, jnp.asarray(phi), omegas, e0,
                      num_moments=128, bounds=(lo - 0.6, hi + 0.6))
    norm = phi @ phi
    first = phi @ (dense @ phi) - e0 * norm
    assert np.trapezoid(aw, omegas) == pytest.approx(norm, rel=1e-3)
    assert np.trapezoid(aw * omegas, omegas) == pytest.approx(
        first, rel=2e-2)


def test_engine_kpm_local_dos_matches_cf_poles():
    """Engine.kpm_local_dos must reproduce the moments of the exact
    Lehmann poles that the continued-fraction path produces for the
    same diagonal -g c run (types 0 and 1, mirrored removal)."""
    from lanczosplusplus_tpu.engine import Engine

    inp = parse_input(HUB)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    coll, _ = eng.spectral_function("c", 0, 0, spin=0)
    poles = []
    for cf in coll.items:
        w, ww = cf.poles_and_weights()
        poles.append((w, ww))
    all_w = np.concatenate([p[0] for p in poles])
    all_wt = np.concatenate([p[1] for p in poles])
    lo = all_w.min() - 2.0
    hi = all_w.max() + 2.0
    omegas = np.linspace(lo, hi, 30001)
    dos = eng.kpm_local_dos("c", 0, omegas, num_moments=512)
    assert (dos > -1e-9).all()
    for k in range(3):
        exact = (all_wt * all_w ** k).sum()
        got = np.trapezoid(dos * omegas ** k, omegas)
        assert got == pytest.approx(exact, rel=2e-2, abs=2e-2)


def test_cli_kpm_output(tmp_path, monkeypatch):
    from lanczosplusplus_tpu.cli.lanczos_main import run
    text = HUB + "TSPSites 1 0\nKPMOmegaBegin=-8\nKPMOmegaStep=0.02\n" \
        "KPMOmegaTotal=801\nKPMMoments=256\n"
    inp_file = tmp_path / "kpm.inp"
    inp_file.write_text(text)
    monkeypatch.chdir(tmp_path)
    run(["-f", str(inp_file), "-g", "c", "--kpm"])
    data = np.loadtxt(tmp_path / "kpm.inp0.kpmdos")
    assert np.trapezoid(data[:, 1], data[:, 0]) == pytest.approx(
        1.0, abs=0.02)


HEIS = """
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
TargetSzPlusConst=4
SolverOptions={solver}
IsPeriodicX=1
"""


@pytest.mark.parametrize("solver", ["none", "factored"])
def test_engine_kpm_sz_matches_cf_sign_convention(solver):
    """Non-fermionic (sz) removal branch must carry the SAME sign as
    the continued-fraction path; also regression for the factored-mode
    crash (FlatFactoredHamiltonian has no matmat_t — apply_block_t
    vmaps its matvec)."""
    from lanczosplusplus_tpu.engine import Engine

    inp = parse_input(HEIS.format(solver=solver))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    coll, _ = eng.spectral_function("sz", 0, 0, spin=0)
    all_w, all_wt = [], []
    for cf in coll.items:
        w, ww = cf.poles_and_weights()
        all_w.append(w)
        all_wt.append(ww)
    all_w = np.concatenate(all_w)
    all_wt = np.concatenate(all_wt)
    omegas = np.linspace(all_w.min() - 2, all_w.max() + 2, 20001)
    dos = eng.kpm_local_dos("sz", 0, omegas, num_moments=512)
    for k in range(3):
        exact = (all_wt * all_w ** k).sum()
        got = np.trapezoid(dos * omegas ** k, omegas)
        assert got == pytest.approx(exact, rel=2e-2, abs=2e-2)
