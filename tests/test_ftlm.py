"""Finite-temperature Lanczos method vs exact full-spectrum thermal
averages (the reference's ExactDiag is the oracle; FTLM is the
beyond-reference scalable path)."""

import io
import numpy as np
import pytest
import jax.numpy as jnp

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.core.bits import popcount
from lanczosplusplus_tpu.engine.thermal import full_spectrum
from lanczosplusplus_tpu.engine.ftlm import ftlm, _ftlm_recurrence
from lanczosplusplus_tpu.solver.lanczos import _lanczos_chunk_plain

HUB = """
TotalNumberOfSites={n}
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU {n} {us}
potentialV {n2} {vs}
SolverOptions=none
TargetElectronsUp={nup}
TargetElectronsDown={ndown}
IsPeriodicX=0
TemperatureOrBeta=beta
TemperatureOrBetaStart=0.2
TemperatureOrBetaTotal=4
TemperatureOrBetaStep=0.6
"""


def hub_setup(n=6, nup=3, ndown=3, u=4.0):
    inp = parse_input(HUB.format(
        n=n, n2=2 * n, us=" ".join([str(u)] * n),
        vs=" ".join(["0"] * 2 * n), nup=nup, ndown=ndown))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((nup, ndown))
    return inp, model, basis


def exact_thermal(spec, beta_grid, diag_obs=None):
    e = spec.evals
    out_e, out_o = [], []
    for b in beta_grid:
        w = np.exp(-b * (e - e.min()))
        z = w.sum()
        out_e.append(float((e * w).sum() / z))
        if diag_obs is not None:
            per_state = (np.abs(spec.evecs) ** 2 * diag_obs[:, None]).sum(0)
            out_o.append(float((per_state * w).sum() / z))
    return np.asarray(out_e), (np.asarray(out_o) if diag_obs is not None
                               else None)


def test_ftlm_energy_matches_exact():
    inp, model, basis = hub_setup()
    spec = full_spectrum(model, basis)
    betas = np.asarray([0.1, 0.5, 1.0, 2.0, 5.0])
    exact_e, _ = exact_thermal(spec, betas)
    ham = model.hamiltonian(basis, dtype=np.float64)
    res = ftlm(ham, betas, num_vectors=48, steps=80, seed=11)
    band = spec.evals.max() - spec.evals.min()
    np.testing.assert_allclose(res.energy, exact_e, atol=0.02 * band)
    # beta -> large limit is the ground-state energy (Lanczos-exact)
    res_cold = ftlm(ham, [30.0], num_vectors=8, steps=80, seed=5)
    assert res_cold.energy[0] == pytest.approx(spec.evals[0], abs=1e-4)
    assert res_cold.e0_estimate == pytest.approx(spec.evals[0], abs=1e-5)
    # specific heat stays physical (non-negative)
    assert (res.specific_heat > -1e-8).all()


def test_ftlm_diagonal_observable_stochastic():
    inp, model, basis = hub_setup()
    spec = full_spectrum(model, basis)
    idx = np.arange(basis.size)
    up = basis.words_up(idx)
    dn = basis.words_down(idx)
    docc = popcount(up & dn).astype(np.float64)  # sum_i n_iu n_id
    betas = np.asarray([0.2, 1.0])
    exact_e, exact_d = exact_thermal(spec, betas, diag_obs=docc)
    ham = model.hamiltonian(basis, dtype=np.float64)
    res = ftlm(ham, betas, num_vectors=64, steps=80,
               operators={"docc": docc}, seed=3)
    np.testing.assert_allclose(res.observables["docc"], exact_d,
                               atol=0.05 * max(abs(exact_d).max(), 1.0))


def test_ftlm_complete_basis_is_exact():
    """With a complete orthonormal start block and full Krylov depth
    the FTLM trace estimator is exact (not just unbiased)."""
    inp, model, basis = hub_setup(n=4, nup=2, ndown=2)
    spec = full_spectrum(model, basis)
    dim = basis.size
    idx = np.arange(dim)
    docc = popcount(basis.words_up(idx) &
                    basis.words_down(idx)).astype(np.float64)
    betas = np.asarray([0.3, 1.0, 4.0])
    exact_e, exact_d = exact_thermal(spec, betas, diag_obs=docc)
    ham = model.hamiltonian(basis, dtype=np.float64)
    res = ftlm(ham, betas, steps=dim, operators={"docc": docc},
               start_vectors=np.eye(dim))
    np.testing.assert_allclose(res.energy, exact_e, atol=2e-7)
    np.testing.assert_allclose(res.observables["docc"], exact_d,
                               atol=2e-7)
    exact_lnz = np.asarray(
        [np.log(np.exp(-b * spec.evals).sum()) for b in betas])
    np.testing.assert_allclose(res.log_z, exact_lnz, atol=1e-7)


def test_ftlm_log_partition():
    inp, model, basis = hub_setup(n=4, nup=2, ndown=2)
    spec = full_spectrum(model, basis)
    betas = np.asarray([0.3, 1.0])
    ham = model.hamiltonian(basis, dtype=np.float64)
    res = ftlm(ham, betas, num_vectors=200, steps=36, seed=17)
    exact_lnz = np.asarray(
        [np.log(np.exp(-b * spec.evals).sum()) for b in betas])
    np.testing.assert_allclose(res.log_z, exact_lnz, atol=0.05)


def test_batched_recurrence_matches_single():
    inp, model, basis = hub_setup(n=4, nup=2, ndown=2)
    ham = model.hamiltonian(basis, dtype=np.float64)
    rng = np.random.default_rng(0)
    V0 = rng.standard_normal((basis.size, 3))
    V0 /= np.linalg.norm(V0, axis=0, keepdims=True)
    V0 = jnp.asarray(V0)
    steps = 12
    a_b, b_b, _ = _ftlm_recurrence(
        ham, V0.T, jnp.zeros((0, 3, basis.size)), steps)
    for r in range(3):
        _, _, _, a1, b1 = _lanczos_chunk_plain(
            ham, V0[:, r], jnp.zeros_like(V0[:, r]),
            jnp.asarray(0.0, jnp.float64), jnp.arange(steps))
        np.testing.assert_allclose(np.asarray(a_b)[:, r], np.asarray(a1),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(b_b)[:, r], np.asarray(b1),
                                   rtol=1e-10, atol=1e-10)


def test_ed_cli_ftlm(tmp_path, capsys):
    from lanczosplusplus_tpu.cli.ed_main import run
    inp_file = tmp_path / "ftlm.inp"
    inp_file.write_text(HUB.format(
        n=4, n2=8, us=" ".join(["4"] * 4), vs=" ".join(["0"] * 8),
        nup=2, ndown=2))
    res = run(["-f", str(inp_file), "--ftlm"])
    out = capsys.readouterr().out
    assert "method=FTLM" in out
    # compare against the exact schedule from ExactDiag
    from lanczosplusplus_tpu.engine.thermal import ExactDiag
    inp = parse_input(inp_file.read_text())
    geom = Geometry(inp)
    model = build_model(inp, geom)
    exact = dict(ExactDiag(model, inp).schedule())
    got = dict((float(l.split()[0]), float(l.split()[1]))
               for l in out.splitlines() if not l.startswith("#"))
    for tb, e in exact.items():
        assert got[tb] == pytest.approx(e, abs=0.15)


def test_ed_cli_ltlm(tmp_path, capsys):
    """`ed --ltlm` runs the symmetric-estimator schedule; the largest-
    beta point is ground-state-exact (the LTLM property plain FTLM
    lacks) and the rest tracks the dense ExactDiag oracle."""
    from lanczosplusplus_tpu.cli.ed_main import run
    inp_file = tmp_path / "ltlm.inp"
    inp_file.write_text(HUB.format(
        n=4, n2=8, us=" ".join(["4"] * 4), vs=" ".join(["0"] * 8),
        nup=2, ndown=2) + "FTLMVectors=32\nFTLMSteps=40\n")
    run(["-f", str(inp_file), "--ltlm"])
    out = capsys.readouterr().out
    assert "method=LTLM" in out
    from lanczosplusplus_tpu.engine.thermal import ExactDiag
    inp = parse_input(inp_file.read_text())
    model = build_model(inp, Geometry(inp))
    exact = dict(ExactDiag(model, inp).schedule())
    got = dict((float(l.split()[0]), float(l.split()[1]))
               for l in out.splitlines() if not l.startswith("#"))
    assert got.keys() == exact.keys()
    for tb, e in exact.items():
        assert got[tb] == pytest.approx(e, abs=0.15)


def test_ltlm_low_temperature_observable():
    """The symmetric LTLM estimator stays accurate at low T where the
    plain FTLM observable estimator is noisy, and converges to
    <gs|A|gs> as beta -> inf."""
    from lanczosplusplus_tpu.engine.ftlm import ltlm

    inp, model, basis = hub_setup()
    spec = full_spectrum(model, basis)
    idx = np.arange(basis.size)
    docc = popcount(basis.words_up(idx) &
                    basis.words_down(idx)).astype(np.float64)
    betas = np.asarray([0.2, 1.0, 3.0, 30.0])
    _, exact_d = exact_thermal(spec, betas, diag_obs=docc)
    ham = model.hamiltonian(basis, dtype=np.float64)
    res = ltlm(ham, betas, {"docc": docc}, num_vectors=24, steps=80,
               seed=7)
    # moderate + low T within a few percent; beta=30 is gs-exact
    np.testing.assert_allclose(res["docc"][:3], exact_d[:3],
                               atol=0.04 * max(abs(exact_d).max(), 1.0))
    gs_docc = (np.abs(spec.evecs[:, 0]) ** 2 * docc).sum()
    assert res["docc"][3] == pytest.approx(gs_docc, abs=1e-5)


def test_ltlm_complete_basis_exact():
    from lanczosplusplus_tpu.engine.ftlm import ltlm

    inp, model, basis = hub_setup(n=4, nup=2, ndown=2)
    spec = full_spectrum(model, basis)
    dim = basis.size
    idx = np.arange(dim)
    docc = popcount(basis.words_up(idx) &
                    basis.words_down(idx)).astype(np.float64)
    betas = np.asarray([0.3, 2.0])
    _, exact_d = exact_thermal(spec, betas, diag_obs=docc)
    ham = model.hamiltonian(basis, dtype=np.float64)
    res = ltlm(ham, betas, {"docc": docc}, steps=dim,
               start_vectors=np.eye(dim))
    np.testing.assert_allclose(res["docc"], exact_d, atol=1e-7)
    exact_lnz = np.asarray(
        [np.log(np.exp(-b * spec.evals).sum()) for b in betas])
    np.testing.assert_allclose(res["_log_z"], exact_lnz, atol=1e-7)


def test_ftlm_free_energy_entropy():
    inp, model, basis = hub_setup(n=4, nup=2, ndown=2)
    spec = full_spectrum(model, basis)
    betas = np.asarray([0.3, 1.0])
    ham = model.hamiltonian(basis, dtype=np.float64)
    res = ftlm(ham, betas, steps=basis.size,
               start_vectors=np.eye(basis.size))
    z = np.asarray([np.exp(-b * spec.evals).sum() for b in betas])
    f_exact = -np.log(z) / betas
    e_exact, _ = exact_thermal(spec, betas)
    s_exact = betas * (e_exact - f_exact)
    np.testing.assert_allclose(res.free_energy, f_exact, atol=1e-7)
    np.testing.assert_allclose(res.entropy, s_exact, atol=1e-7)


def test_ed_cli_ftlm_factored_kitaev(tmp_path, capsys):
    """SolverOptions=factored routes the FTLM schedule through the
    block-factorized Kitaev Hamiltonian; values track the exact dense
    schedule."""
    from lanczosplusplus_tpu.cli.ed_main import run
    from lanczosplusplus_tpu.engine.thermal import ExactDiag

    per = "\n".join(
        "DegreesOfFreedom=1\nGeometryKind=chain\n"
        f"GeometryOptions=ConstantValues\nConnectors 1 {j}"
        for j in (1.1, 0.7, 0.9))
    text = (f"TotalNumberOfSites=8\nNumberOfTerms=3\n{per}\n"
            "Model=Kitaev\nSolverOptions=factored\n"
            "TemperatureOrBeta=beta\nTemperatureOrBetaStart=0.5\n"
            "TemperatureOrBetaTotal=2\nTemperatureOrBetaStep=1.5\n"
            "FTLMVectors=24\nFTLMSteps=40\n")
    inp_file = tmp_path / "kft.inp"
    inp_file.write_text(text)
    run(["-f", str(inp_file), "--ftlm"])
    out = capsys.readouterr().out
    assert "method=FTLM" in out
    inp = parse_input(text.replace("SolverOptions=factored",
                                   "SolverOptions=none"))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    exact = dict(ExactDiag(model, inp).schedule())
    got = dict((float(l.split()[0]), float(l.split()[1]))
               for l in out.splitlines() if not l.startswith("#"))
    for tb, e in exact.items():
        assert got[tb] == pytest.approx(e, abs=0.12)
