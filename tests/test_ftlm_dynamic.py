"""FTLM double-Krylov finite-temperature dynamic correlations vs the
exact two-sector Lehmann double sum."""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine.thermal import operator_matrix
from lanczosplusplus_tpu.engine.ftlm_dynamic import ftlm_dynamic

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
    src = model.create_basis((2, 2))
    dst = model.create_basis((3, 2))          # c^dagger_up sector
    ham_s = model.hamiltonian(src, dtype=np.float64)
    ham_d = model.hamiltonian(dst, dtype=np.float64)
    a = operator_matrix(model, "cdagger", 0, 0, 0, src, dst)
    bmat = a.T                                # B[t, s] = <t|c^+_0up|s>
    return ham_s, ham_d, bmat


def exact_poles(ham_s, ham_d, bmat, beta):
    es, vs = np.linalg.eigh(np.asarray(ham_s.to_dense()))
    ed, vd = np.linalg.eigh(np.asarray(ham_d.to_dense()))
    w = np.exp(-beta * (es - es.min()))
    z = w.sum()
    m = vd.T @ bmat @ vs                      # <m|B|n>
    om = ed[:, None] - es[None, :]            # (m, n)
    wt = np.abs(m) ** 2 * w[None, :] / z
    return om.ravel(), wt.ravel()


def moments(om, wt, kmax=3):
    return np.asarray([(wt * om ** k).sum() for k in range(kmax)])


def test_exact_with_complete_basis():
    """Complete orthonormal start set + full Krylov depth => the FTLM
    estimator equals the exact finite-T Lehmann double sum."""
    ham_s, ham_d, bmat = setup()
    dyn = ftlm_dynamic(ham_s, ham_d, lambda v: bmat @ v,
                       steps=ham_s.dim,
                       start_vectors=np.eye(ham_s.dim))
    for beta in (0.3, 1.0, 4.0):
        om_e, wt_e = exact_poles(ham_s, ham_d, bmat, beta)
        om_f, wt_f = dyn.poles(beta)
        np.testing.assert_allclose(moments(om_f, wt_f),
                                   moments(om_e, wt_e),
                                   rtol=1e-8, atol=1e-8)
        # broadened curves agree pointwise
        grid = np.linspace(-8, 12, 400)
        def broaden(om, wt):
            return (wt[None, :] * (0.2 / np.pi) /
                    ((grid[:, None] - om[None, :]) ** 2 + 0.04)).sum(1)
        np.testing.assert_allclose(dyn.evaluate(beta, grid, 0.2),
                                   broaden(om_e, wt_e), atol=1e-8)


def test_stochastic_estimate():
    ham_s, ham_d, bmat = setup()
    dyn = ftlm_dynamic(ham_s, ham_d, lambda v: bmat @ v,
                       num_vectors=48, steps=36, seed=9)
    beta = 1.0
    om_e, wt_e = exact_poles(ham_s, ham_d, bmat, beta)
    om_f, wt_f = dyn.poles(beta)
    me, mf = moments(om_e, wt_e), moments(om_f, wt_f)
    np.testing.assert_allclose(mf, me, rtol=0.15, atol=0.05)


def test_beta_infinity_recovers_groundstate_spectral():
    """beta -> large limit: poles reduce to the T=0 spectral function
    of op|gs> (the continued-fraction result)."""
    ham_s, ham_d, bmat = setup()
    dyn = ftlm_dynamic(ham_s, ham_d, lambda v: bmat @ v,
                       steps=ham_s.dim, start_vectors=np.eye(ham_s.dim))
    es, vs = np.linalg.eigh(np.asarray(ham_s.to_dense()))
    ed, vd = np.linalg.eigh(np.asarray(ham_d.to_dense()))
    gs = vs[:, 0]
    phi = bmat @ gs
    wts_exact = np.abs(vd.T @ phi) ** 2
    om_f, wt_f = dyn.poles(50.0)
    # integral (k=0 moment) equals <gs|c c^+|gs>
    assert wt_f.sum() == pytest.approx(wts_exact.sum(), abs=1e-6)
    mean_exact = (wts_exact * (ed - es[0])).sum()
    assert (wt_f * om_f).sum() == pytest.approx(mean_exact, abs=1e-6)


def test_engine_finite_t_local_dos_exact():
    """Engine.ftlm_local_dos with a complete start basis equals the
    exact finite-T Lehmann N_i(omega) assembled from dense
    diagonalization of all three sectors."""
    from lanczosplusplus_tpu.engine import Engine

    inp = parse_input(HUB)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    beta, delta = 1.2, 0.15
    grid = np.linspace(-10, 12, 300)
    dim = eng.basis.size
    got = eng.ftlm_local_dos("c", 0, beta, grid, delta=delta,
                             steps=dim, start_vectors=np.eye(dim))

    src = eng.basis
    es, vs = np.linalg.eigh(np.asarray(eng.hamiltonian.to_dense()))
    w = np.exp(-beta * (es - es.min()))
    z = w.sum()
    expect = np.zeros_like(grid)
    for op_name, parts, sign in (("cdagger", (3, 2), +1),
                                 ("c", (1, 2), -1)):
        dst = model.create_basis(parts)
        hd = model.hamiltonian(dst, dtype=np.float64)
        ed, vd = np.linalg.eigh(np.asarray(hd.to_dense()))
        bmat = operator_matrix(model, op_name, 0, 0, 0, src, dst).T
        m = vd.T @ bmat @ vs
        om = sign * (ed[:, None] - es[None, :])
        wt = np.abs(m) ** 2 * w[None, :] / z
        expect += (wt.ravel()[None, :] * (delta / np.pi) /
                   ((grid[:, None] - om.ravel()[None, :]) ** 2 +
                    delta ** 2)).sum(1)
    np.testing.assert_allclose(got, expect, atol=1e-7)


def test_cli_ftlm_dos_output(tmp_path, monkeypatch):
    from lanczosplusplus_tpu.cli.lanczos_main import run
    text = HUB + "TSPSites 1 0\nFTLMOmegaBegin=-10\nFTLMOmegaStep=0.05\n" \
        "FTLMOmegaTotal=441\nFTLMVectors=24\nFTLMSteps=36\n"
    inp_file = tmp_path / "ft.inp"
    inp_file.write_text(text)
    monkeypatch.chdir(tmp_path)
    run(["-f", str(inp_file), "-g", "c", "--ftlm-dos", "1.0"])
    data = np.loadtxt(tmp_path / "ft.inp0.ftlmdos")
    assert np.trapezoid(data[:, 1], data[:, 0]) == pytest.approx(
        1.0, abs=0.06)


HEIS6 = """
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
HeisenbergTwiceS=1
TargetSzPlusConst=3
SolverOptions=none
IsPeriodicX=1
"""


def test_ftlm_sq_omega_exact():
    """Complete start basis + full depth: finite-T S(q, omega) equals
    the exact Lehmann double sum with B_q = sum_j e^{iq r_j} sz_j."""
    from lanczosplusplus_tpu.engine import Engine
    from lanczosplusplus_tpu.engine.thermal import operator_matrix

    inp = parse_input(HEIS6)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    dim = eng.basis.size
    beta, delta = 0.8, 0.2
    grid = np.linspace(-6, 6, 241)
    qs, got = eng.ftlm_sq_omega("sz", beta, grid, delta=delta,
                                steps=dim, start_vectors=np.eye(dim))

    es, vs = np.linalg.eigh(np.asarray(eng.hamiltonian.to_dense()))
    w = np.exp(-beta * (es - es.min()))
    z = w.sum()
    n = 6
    szs = [operator_matrix(model, "sz", j, 0, 0, eng.basis,
                           eng.basis).T for j in range(n)]
    for iq in (0, 1, 3):
        q = qs[iq]
        bq = sum(np.exp(1j * q * j) * szs[j] for j in range(n))
        m = np.conj(vs.T) @ bq @ vs              # m[a, b] = <a|B_q|b>
        om = es[:, None] - es[None, :]           # om[a, b] = E_a - E_b
        wt = np.abs(m) ** 2 * w[None, :] / z     # Boltzmann on state b
        expect = (wt.ravel()[None, :] * (delta / np.pi) /
                  ((grid[:, None] - om.ravel()[None, :]) ** 2 +
                   delta ** 2)).sum(1)
        np.testing.assert_allclose(got[iq], expect, atol=1e-7)


def test_cli_sqomega_finite_t(capsys):
    from lanczosplusplus_tpu.cli.sqomega_main import run
    import tempfile, os
    text = HEIS6 + "FTLMVectors=8\nFTLMSteps=20\n"
    with tempfile.NamedTemporaryFile("w", suffix=".inp",
                                     delete=False) as f:
        f.write(text)
        path = f.name
    try:
        qs, sqw = run(["-f", path, "-g", "sz", "-b", "-4", "-e", "4",
                       "-s", "0.5", "-d", "0.2", "--beta", "1.0"])
    finally:
        os.unlink(path)
    out = capsys.readouterr().out
    assert "method=FTLM" in out
    assert sqw.shape[0] == len(qs)
    # q=0 channel of an Sz-conserving ensemble vanishes... only the
    # inelastic part: total Sz is conserved so S_{q=0}(w!=0) = 0
    assert np.abs(sqw[0]).max() < 1e-8
