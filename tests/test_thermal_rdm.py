"""Tests for RDM, ExactDiag thermal averages, grand-canonical pipeline,
and lorentzian broadening."""

import io
import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine
from lanczosplusplus_tpu.engine.rdm import ReducedDensityMatrix
from lanczosplusplus_tpu.engine.thermal import (
    ExactDiag, GrandCanonical, full_spectrum)
from lanczosplusplus_tpu.engine.broadening import lorentzian_grid

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
TemperatureOrBetaStart=0.1
TemperatureOrBetaTotal=5
TemperatureOrBetaStep=0.5
"""


def hub_input(n, nup, ndown, u=4.0):
    return parse_input(HUB.format(
        n=n, n2=2 * n, us=" ".join([str(u)] * n),
        vs=" ".join(["0"] * 2 * n), nup=nup, ndown=ndown))


def test_rdm_matches_schmidt():
    inp = hub_input(4, 2, 2)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    psi = np.asarray(eng.eigenvector(0))
    rdm = ReducedDensityMatrix(eng.basis, psi, split=2)
    assert np.trace(rdm.rho) == pytest.approx(1.0, abs=1e-10)
    # independent Schmidt check: scatter psi into M and SVD
    idx = np.arange(eng.basis.size)
    up = eng.basis.words_up(idx).astype(int)
    dn = eng.basis.words_down(idx).astype(int)
    a = (up & 3) + (dn & 3) * 4
    b = (up >> 2) + (dn >> 2) * 4
    m = np.zeros((16, 16))
    np.add.at(m, (a, b), psi)
    svals = np.linalg.svd(m, compute_uv=False)
    probs = np.sort(svals ** 2)[::-1]
    got = np.sort(rdm.eigs)[::-1]
    np.testing.assert_allclose(got[:len(probs)], probs, atol=1e-10)
    assert rdm.entanglement_entropy() > 0


def test_exact_diag_limits():
    inp = hub_input(4, 2, 2)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    ed = ExactDiag(model, inp)
    evals = ed.spectrum.evals
    # beta -> large: ground-state energy
    assert ed.energy_at(200.0) == pytest.approx(evals[0], abs=1e-6)
    sched = ed.schedule()
    assert len(sched) == 5
    out = io.StringIO()
    ed.print_energies(out)
    assert "#tb=beta" in out.getvalue()


def test_exact_diag_infinite_temperature():
    inp = hub_input(4, 2, 2)
    inp.entries["TemperatureOrBeta"] = ["temperature"]
    geom = Geometry(inp)
    model = build_model(inp, geom)
    ed = ExactDiag(model, inp)
    # T -> infinity: mean of all eigenvalues
    assert ed.energy_at(1e8) == pytest.approx(ed.spectrum.evals.mean(),
                                              abs=1e-5)


def test_grand_canonical_vs_direct():
    """2-site Hubbard: Z, density, energy vs explicit sector sums."""
    inp = hub_input(2, 1, 1, u=3.0)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    gc = GrandCanonical(model, nsite=2)
    beta, mu = 1.3, 0.7
    z_direct = 0.0
    e_num = 0.0
    n_num = 0.0
    for s in gc.sectors:
        ne = s.nelectrons
        w = np.exp(beta * (mu * ne - s.evals))
        z_direct += w.sum()
        e_num += (w * s.evals).sum()
        n_num += w.sum() * ne
    assert gc.partition(beta, mu) == pytest.approx(z_direct, rel=1e-10)
    assert gc.energy(beta, mu) == pytest.approx(e_num / z_direct, rel=1e-10)
    assert gc.density(beta, mu) == pytest.approx(n_num / z_direct, rel=1e-10)


def test_grand_canonical_ftlm_dense_path_exact():
    """With dense_cutoff covering every sector, GrandCanonicalFTLM's
    log-domain combination reproduces the full-spectra GrandCanonical
    exactly."""
    from lanczosplusplus_tpu.engine.thermal import GrandCanonicalFTLM

    inp = hub_input(2, 1, 1, u=3.0)
    model = build_model(inp, Geometry(inp))
    gc = GrandCanonical(model, nsite=2)
    betas = [0.4, 1.3]
    gf = GrandCanonicalFTLM(model, nsite=2, beta_grid=betas,
                            dense_cutoff=1 << 20)
    for beta in betas:
        for mu in (0.0, 0.7):
            assert gf.log_partition(beta, mu) == pytest.approx(
                np.log(gc.partition(beta, mu)), rel=1e-10)
            assert gf.energy(beta, mu) == pytest.approx(
                gc.energy(beta, mu), rel=1e-10)
            assert gf.density(beta, mu) == pytest.approx(
                gc.density(beta, mu), rel=1e-10)
            # Cv oracle straight from the full spectra:
            # beta^2 (<E^2> - <E>^2) over the grand-canonical weights
            z = e1 = e2 = 0.0
            for s in gc.sectors:
                w = np.exp(beta * (mu * s.nelectrons - s.evals))
                z += w.sum()
                e1 += (w * s.evals).sum()
                e2 += (w * s.evals ** 2).sum()
            cv = beta ** 2 * (e2 / z - (e1 / z) ** 2)
            assert gf.specific_heat(beta, mu) == pytest.approx(
                cv, rel=1e-9, abs=1e-12)
    with pytest.raises(ValueError):
        gf.energy(0.9, 0.0)  # beta off the construction grid


def test_grand_canonical_ftlm_estimator_tracks_exact():
    """4-site Hubbard with the larger sectors estimated by FTLM: the
    grand-canonical observables track the full-spectra oracle within
    the stochastic tolerance."""
    from lanczosplusplus_tpu.engine.thermal import GrandCanonicalFTLM

    inp = hub_input(4, 2, 2, u=4.0)
    model = build_model(inp, Geometry(inp))
    gc = GrandCanonical(model, nsite=4)
    betas = [0.5, 2.0]
    gf = GrandCanonicalFTLM(model, nsite=4, beta_grid=betas,
                            dense_cutoff=8, num_vectors=64, steps=36)
    for beta in betas:
        for mu in (0.0, 1.0):
            assert gf.energy(beta, mu) == pytest.approx(
                gc.energy(beta, mu), abs=0.2)
            assert gf.density(beta, mu) == pytest.approx(
                gc.density(beta, mu), abs=0.1)
            assert gf.log_partition(beta, mu) == pytest.approx(
                np.log(gc.partition(beta, mu)), abs=0.1)


def test_grand_canonical_ftlm_factored_heisenberg():
    """kind=heisenberg sweep with SolverOptions=factored routing: the
    per-sector FTLM runs on the block-factorized forms (block layout,
    no perm-gather wrap) and tracks the full-spectra oracle."""
    from lanczosplusplus_tpu.engine.thermal import (GrandCanonical,
                                                    GrandCanonicalFTLM)

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
    model = build_model(inp, Geometry(inp))
    gc = GrandCanonical(model, nsite=n, kind="heisenberg")
    betas = [0.5, 2.0]
    gf = GrandCanonicalFTLM(model, nsite=n, beta_grid=betas,
                            kind="heisenberg", dense_cutoff=8,
                            num_vectors=24, steps=40, factored=True)
    for beta in betas:
        for mu in (0.0, 0.5):
            assert gf.energy(beta, mu) == pytest.approx(
                gc.energy(beta, mu), abs=0.2)
            assert gf.density(beta, mu) == pytest.approx(
                gc.density(beta, mu), abs=0.15)


def test_grand_canonical_correlation_sum_rule():
    """sum of <c^dag_i c_i> pole weights == thermal <n_i_up>."""
    inp = hub_input(2, 1, 1, u=2.0)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    gc = GrandCanonical(model, nsite=2)
    beta, mu = 2.0, 0.4
    poles, total = gc.correlation_poles("c", (0, 0), 0, beta, mu)
    # direct thermal <n_0_up>
    from lanczosplusplus_tpu.core import bits as B
    num = 0.0
    z = 0.0
    for parts, basis in gc._bases.items():
        s = next(t for t in gc.sectors if t.parts == parts)
        w = np.exp(beta * (mu * s.nelectrons - s.evals))
        n0 = B.get_bit(basis.words_up(np.arange(basis.size)), 0)
        # diagonal of U^dag diag(n0) U
        occ = np.einsum("sn,s,sn->n", s.evecs.conj(), n0.astype(float),
                        s.evecs)
        num += (w * occ).sum()
        z += w.sum()
    assert total == pytest.approx(num / z, abs=1e-10)


def test_lorentzian_modes():
    e = np.array([-1.0, 0.5, 2.0])
    w = np.array([0.5, 1.0, 0.25])
    om, g = lorentzian_grid(e, w, total=50, mode="real", eps=0.05)
    # peak near each pole in -Im G
    peak = om[np.argmax(-g.imag)]
    assert abs(peak - 0.5) < 0.15
    om_m, g_m = lorentzian_grid(e, w, total=20, mode="matsubara",
                                eps=0.0, beta=5.0)
    assert len(om_m) == 20
    assert np.isfinite(g_m).all()


def test_grand_canonical_heisenberg():
    """Heisenberg sector sweep: Z over all szPlusConst sectors equals
    the full 2^n partition function."""
    text = """
TotalNumberOfSites=4
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
SolverOptions=none
TargetSzPlusConst=2
IsPeriodicX=1
"""
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    from lanczosplusplus_tpu.engine.thermal import GrandCanonical
    gc = GrandCanonical(model, nsite=4, kind="heisenberg")
    assert sum(s.evals.size for s in gc.sectors) == 16  # full 2^4
    beta = 0.7
    z = gc.partition(beta, mu=0.0)
    # direct: all sectors
    z_direct = sum(np.exp(-beta * s.evals).sum() for s in gc.sectors)
    assert z == pytest.approx(z_direct, rel=1e-10)
