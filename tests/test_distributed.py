"""Distributed row-partitioned Lanczos on the virtual 8-device CPU mesh
(the multi-host validation strategy: SURVEY.md section 4)."""

import numpy as np
import pytest
import jax

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.parallel import mesh as pmesh
from lanczosplusplus_tpu.solver import lanczos as lz


def build_ham(nsite=8):
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
    geom = Geometry(inp)
    model = build_model(inp, geom)
    return model.hamiltonian(model.create_basis((nsite // 2, nsite // 2)))


@pytest.mark.parametrize("ndev", [2, 8])
def test_distributed_matvec_matches(ndev):
    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:ndev])
    sham = pmesh.shard_hamiltonian(ham, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(ham.dim)
    xp = np.concatenate([x, np.zeros(sham.dim - ham.dim)])
    y_single = np.asarray(ham.matvec(x))
    y_dist = np.asarray(sham.matvec(pmesh.sharded_vector(xp, mesh)))
    np.testing.assert_allclose(y_dist[:ham.dim], y_single, atol=1e-10)


def test_distributed_lowest_states_matches():
    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    evals_d, vecs_d = pmesh.distributed_lowest_states(ham, mesh,
                                                      max_steps=120)
    evals_s, vecs_s = lz.lowest_states(ham, max_steps=120)
    assert evals_d[0] == pytest.approx(evals_s[0], abs=1e-9)
    # same state up to sign
    ov = abs(np.vdot(vecs_d[0], np.asarray(vecs_s[0])))
    assert ov == pytest.approx(1.0, abs=1e-7)


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_halo_matvec_matches(ndev):
    from lanczosplusplus_tpu.parallel.halo import HaloPlan
    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:ndev])
    plan = HaloPlan(ham, ndev)
    assert plan.halo_fraction < 1.0
    arrays = plan.device_arrays(mesh)
    mv = plan.matvec_fn(mesh)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(ham.dim)
    xp = np.concatenate([x, np.zeros(plan.dim - ham.dim)])
    xs = pmesh.sharded_vector(xp, mesh)
    y = np.asarray(mv(arrays["diag"], arrays["cols"], arrays["vals"],
                      arrays["send_idx"], xs))
    expect = np.asarray(ham.matvec(x))
    np.testing.assert_allclose(y[:ham.dim], expect, atol=1e-10)


def test_halo_lowest_states_matches():
    from lanczosplusplus_tpu.parallel.halo import halo_lowest_states
    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    evals_h, vecs_h = halo_lowest_states(ham, mesh, max_steps=120)
    evals_s, vecs_s = lz.lowest_states(ham, max_steps=120)
    assert evals_h[0] == pytest.approx(evals_s[0], abs=1e-9)
    ov = abs(np.vdot(vecs_h[0], np.asarray(vecs_s[0])))
    assert ov == pytest.approx(1.0, abs=1e-7)


def test_halo_plain_tridiagonalize_matches():
    """Distributed continued-fraction ingredients: the memory-light
    (alpha, beta) recurrence over the halo-exchange Hamiltonian equals
    the single-device one (same start vector), so spectral functions
    can run sharded."""
    from lanczosplusplus_tpu.parallel.halo import HaloPlan
    from lanczosplusplus_tpu.solver.lanczos import tridiagonalize_plain

    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    plan = HaloPlan(ham, 8)
    sham = plan.hamiltonian(mesh)
    rng = np.random.default_rng(5)
    v0 = rng.standard_normal(ham.dim)
    v0 /= np.linalg.norm(v0)
    v0p = np.concatenate([v0, np.zeros(plan.dim - ham.dim)])
    res_d = tridiagonalize_plain(
        sham, pmesh.sharded_vector(v0p, mesh), 60)
    import jax.numpy as jnp
    res_s = tridiagonalize_plain(ham, jnp.asarray(v0), 60)
    m = min(res_d.m, res_s.m)
    np.testing.assert_allclose(res_d.alphas[:m], res_s.alphas[:m],
                               atol=1e-8)
    np.testing.assert_allclose(res_d.betas[:m - 1], res_s.betas[:m - 1],
                               atol=1e-8)


def test_distributed_ftlm_matches_single():
    """Same seed => same random start block => identical estimates up
    to padding (padded rows carry zero amplitude)."""
    from lanczosplusplus_tpu.engine.ftlm import ftlm

    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    betas = np.asarray([0.3, 1.0, 4.0])
    idx = np.arange(ham.dim)
    docc = np.ones(ham.dim)  # trivial diagonal operator (norm check)
    res_d = pmesh.distributed_ftlm(ham, mesh, betas, num_vectors=12,
                                   steps=40, seed=5,
                                   operators={"one": docc})
    res_s = ftlm(ham, betas, num_vectors=12, steps=40, seed=5,
                 operators={"one": docc})
    np.testing.assert_allclose(res_d.energy, res_s.energy,
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(res_d.log_z, res_s.log_z,
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(res_d.observables["one"], 1.0, atol=1e-8)


def test_distributed_ltlm_matches_single():
    """Same seed => same padded random start block => the sharded
    symmetric estimator reproduces the single-device ltlm."""
    from lanczosplusplus_tpu.engine.ftlm import ltlm

    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    betas = np.asarray([0.3, 1.0, 8.0])
    docc = np.linspace(0.0, 1.0, ham.dim)
    res_d = pmesh.distributed_ltlm(ham, mesh, betas,
                                   {"obs": docc, "energy": ham},
                                   num_vectors=6, steps=30, seed=5)
    res_s = ltlm(ham, betas, {"obs": docc, "energy": ham},
                 num_vectors=6, steps=30, seed=5)
    np.testing.assert_allclose(res_d["obs"], res_s["obs"],
                               rtol=1e-8, atol=1e-8)
    # matmat-style operator at the UNPADDED dimension (H itself) is
    # sharded+padded by _pad_operators
    np.testing.assert_allclose(res_d["energy"], res_s["energy"],
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(res_d["_log_z"], res_s["_log_z"],
                               rtol=1e-8, atol=1e-8)


def test_distributed_kpm_matches_single():
    from lanczosplusplus_tpu.engine.kpm import kpm_dos, spectral_bounds

    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    bounds = spectral_bounds(ham)
    res_d = pmesh.distributed_kpm_dos(ham, mesh, num_moments=32,
                                      num_vectors=8, seed=3,
                                      bounds=bounds)
    res_s = kpm_dos(ham, num_moments=32, num_vectors=8, seed=3,
                    bounds=bounds)
    np.testing.assert_allclose(res_d.moments, res_s.moments,
                               rtol=1e-8, atol=1e-6)


def test_distributed_spectral_fleet_matches():
    """Row-sharded batched CF tridiagonalization == single-device."""
    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(11)
    v0s = rng.standard_normal((3, ham.dim))
    v0s /= np.linalg.norm(v0s, axis=1, keepdims=True)
    got = pmesh.distributed_spectral_fleet(ham, mesh, v0s, steps=40)
    ref = lz.tridiagonalize_plain_batched(ham, v0s, 40)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g.m == r.m
        np.testing.assert_allclose(g.alphas, r.alphas, atol=1e-9)
        np.testing.assert_allclose(g.betas, r.betas, atol=1e-9)


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_kron_halo_matvec_matches(ndev):
    """Kronecker-structured halo (whole dn-row exchange) equals the
    single-device matvec."""
    from lanczosplusplus_tpu.parallel.halo import KronHaloPlan

    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:ndev])
    plan = KronHaloPlan(ham, ndev)
    assert plan.halo_fraction < 1.0
    sham = plan.hamiltonian(mesh)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(ham.dim)
    xp = np.concatenate([x, np.zeros(plan.dim - ham.dim)])
    xs = pmesh.sharded_vector(xp, mesh)
    y = np.asarray(jax.jit(lambda h, v: h.matvec(v))(sham, xs))
    expect = np.asarray(ham.matvec(x))
    np.testing.assert_allclose(y[:ham.dim], expect, atol=1e-10)


def build_ham_with_remainder(nsite=6):
    """SuperHubbardExtended: factorized hopping + spin-coupled S+S-
    remainder ELL — the structure of FeAs INT_PAPER33 sectors (U2/U3)
    that the kron halo must carry via its entry-wise second exchange."""
    text = f"""
TotalNumberOfSites={nsite}
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
Connectors 1 1.1
Model=SuperHubbardExtended
hubbardU {nsite} {" ".join(["3"] * nsite)}
potentialV {2 * nsite} {" ".join(["0"] * 2 * nsite)}
SolverOptions=none
TargetElectronsUp={nsite // 2}
TargetElectronsDown={nsite // 2}
IsPeriodicX=1
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    return model.hamiltonian(model.create_basis((nsite // 2, nsite // 2)))


@pytest.mark.parametrize("ndev", [2, 8])
def test_kron_halo_matvec_with_remainder(ndev):
    """A spin-coupled ELL remainder rides the kron halo's second
    (entry-wise) all-to-all and the matvec still matches."""
    from lanczosplusplus_tpu.parallel.halo import KronHaloPlan

    ham = build_ham_with_remainder()
    assert ham.ell is not None and ham.factorized is not None
    mesh = pmesh.make_mesh(jax.devices()[:ndev])
    plan = KronHaloPlan(ham, ndev)
    assert plan.rem_cols is not None
    # (no halo_fraction bound here: at toy dims the S+S- remainder
    # touches nearly every entry; the win is measured at real scale)
    sham = plan.hamiltonian(mesh)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(ham.dim)
    xp = np.concatenate([x, np.zeros(plan.dim - ham.dim)])
    xs = pmesh.sharded_vector(xp, mesh)
    y = np.asarray(jax.jit(lambda h, v: h.matvec(v))(sham, xs))
    expect = np.asarray(ham.matvec(x))
    np.testing.assert_allclose(y[:ham.dim], expect, atol=1e-10)


def test_kron_halo_lowest_states_with_remainder():
    """halo_lowest_states now routes factorized-with-remainder sectors
    through the kron halo (VERDICT r2 item 7) and matches the
    single-device solve."""
    from lanczosplusplus_tpu.parallel.halo import halo_lowest_states

    ham = build_ham_with_remainder()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    evals_h, vecs_h = halo_lowest_states(ham, mesh, max_steps=120)
    evals_s, vecs_s = lz.lowest_states(ham, max_steps=120)
    assert evals_h[0] == pytest.approx(evals_s[0], abs=1e-9)
    ov = abs(np.vdot(vecs_h[0], np.asarray(vecs_s[0])))
    assert ov == pytest.approx(1.0, abs=1e-7)


def test_kron_halo_lowest_states_matches():
    """halo_lowest_states dispatches factorized Hamiltonians to the
    Kronecker halo and still matches the single-device solve."""
    from lanczosplusplus_tpu.parallel.halo import halo_lowest_states

    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    evals_h, vecs_h = halo_lowest_states(ham, mesh, max_steps=120)
    evals_s, vecs_s = lz.lowest_states(ham, max_steps=120)
    assert evals_h[0] == pytest.approx(evals_s[0], abs=1e-9)
    ov = abs(np.vdot(vecs_h[0], np.asarray(vecs_s[0])))
    assert ov == pytest.approx(1.0, abs=1e-7)


def test_distributed_budget_forces_two_pass():
    """A Krylov budget too small for the stored basis routes the
    distributed solve through the plain two-pass path, and the energy
    still matches the single-device two-pass solve (same seed => same
    start vector => same recurrence up to shard reduction order)."""
    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    steps = 120
    budget = steps * ham.dim * 8 // 2  # half the stored-V bytes
    evals_d, vecs_d, info = pmesh.distributed_lowest_states(
        ham, mesh, max_steps=steps, krylov_budget_bytes=budget,
        return_info=True)
    assert np.isnan(info.residual)  # plain path: no stored basis
    evals_s, vecs_s = lz.lowest_states_plain(ham, max_steps=steps)
    assert evals_d[0] == pytest.approx(evals_s[0], abs=1e-9)
    ov = abs(np.vdot(vecs_d[0], np.asarray(vecs_s[0])))
    assert ov == pytest.approx(1.0, abs=1e-7)


def test_distributed_unconverged_reports_flag():
    """max_steps too small to converge: the distributed solve returns
    converged=False in its SolveInfo instead of silently succeeding."""
    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    evals, vecs, info = pmesh.distributed_lowest_states(
        ham, mesh, max_steps=2, tol=1e-14, return_info=True)
    assert not info.converged
    assert info.residual > 0
    with pytest.raises(RuntimeError, match="residual"):
        pmesh.distributed_lowest_states(ham, mesh, max_steps=2,
                                        tol=1e-14, strict=True)


def test_distributed_memory_bounded_restart():
    """When the budget admits the initial basis but blocks doubling,
    the distributed solver restarts from the Ritz vector (single
    state) and still converges."""
    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    steps = 40
    # fits the initial 40-step basis at the PADDED kron dim (rows pad
    # to a multiple of ndev) but blocks the doubling to 80 steps
    budget = int(1.5 * steps * ham.dim * 8)
    evals_d, vecs_d, info = pmesh.distributed_lowest_states(
        ham, mesh, max_steps=steps, krylov_budget_bytes=budget,
        return_info=True)
    assert not np.isnan(info.residual)  # stored-basis path, not plain
    assert info.converged
    evals_s, _ = lz.lowest_states(ham, max_steps=120)
    assert evals_d[0] == pytest.approx(evals_s[0], abs=1e-8)


def test_halo_and_kron_solvers_accept_solve_kw():
    """tol/budget/return_info thread through halo_lowest_states and
    kron_lowest_states to the shared driver."""
    from lanczosplusplus_tpu.parallel.halo import halo_lowest_states
    from lanczosplusplus_tpu.parallel.kron import kron_lowest_states

    ham = build_ham()
    mesh = pmesh.make_mesh(jax.devices()[:8])
    evals_s, _ = lz.lowest_states(ham, max_steps=120)
    e_h, _, info_h = halo_lowest_states(ham, mesh, max_steps=120,
                                        return_info=True)
    assert info_h.converged
    assert e_h[0] == pytest.approx(evals_s[0], abs=1e-9)
    e_k, _, info_k = kron_lowest_states(ham, mesh, max_steps=120,
                                        return_info=True)
    assert info_k.converged
    assert e_k[0] == pytest.approx(evals_s[0], abs=1e-9)


def test_distributed_blockkron_tj_matches_single():
    """Distributed factored t-J (column-sharded BlockKron, state
    replicated per matvec): matvec bit-match + end-to-end solve equal
    to the single-device factored solve."""
    from lanczosplusplus_tpu.models.tj_factored import build_factored_tj
    from lanczosplusplus_tpu.parallel.blockkron_dist import \
        shard_blockkron

    text = """
TotalNumberOfSites=8
NumberOfTerms=4
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.0
Model=TjMultiOrb
Orbitals=1
SolverOptions=none
TargetElectronsUp=3
TargetElectronsDown=3
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((3, 3))
    fact = build_factored_tj(model, basis)  # PermutedHamiltonian
    mesh = pmesh.make_mesh(jax.devices()[:8])

    # matvec equality on the inner block form (padded boundary)
    sham = shard_blockkron(fact.inner, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(fact.dim)
    xp = np.concatenate([x, np.zeros(sham.dim - fact.dim)])
    xs = pmesh.sharded_vector(xp, mesh)
    y = np.asarray(jax.jit(lambda h, v: h.matvec(v))(sham, xs))
    np.testing.assert_allclose(
        y[:fact.dim], np.asarray(fact.inner.matvec(x)), atol=1e-10)

    # end-to-end: distributed_lowest_states dispatches the wrapped
    # form to the blockkron path; eigenvector returns in FLAT order
    evals_d, vecs_d = pmesh.distributed_lowest_states(fact, mesh,
                                                      max_steps=120)
    evals_s, vecs_s = lz.lowest_states(fact, max_steps=120)
    assert evals_d[0] == pytest.approx(evals_s[0], abs=1e-9)
    ov = abs(np.vdot(vecs_d[0], np.asarray(vecs_s[0])))
    assert ov == pytest.approx(1.0, abs=1e-7)


def test_distributed_blockkron_rashba_halfcut_matches():
    """Distributed half-cut Rashba (perm cross terms + JW twist sign):
    solve over the CPU mesh equals the flat single-device solve."""
    from lanczosplusplus_tpu.models.rashba_halfcut import \
        build_halfcut_rashba

    text = """
TotalNumberOfSites=6
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.5
Model=HubbardOneBandRashbaSOC
hubbardU 6 4 4 4 4 4 4
potentialV 12 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsTotal=6
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis(("ne", 6))
    half = build_halfcut_rashba(model, basis, dtype=np.float64)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    evals_d, vecs_d = pmesh.distributed_lowest_states(half, mesh,
                                                      max_steps=160)
    flat = model.hamiltonian(basis, dtype=np.float64)
    evals_s, vecs_s = lz.lowest_states(flat, max_steps=160)
    assert evals_d[0] == pytest.approx(evals_s[0], abs=1e-9)
    ov = abs(np.vdot(vecs_d[0], np.asarray(vecs_s[0])))
    assert ov == pytest.approx(1.0, abs=1e-7)


def test_distributed_ftlm_and_fleet_on_factored_form():
    """distributed_ftlm / distributed_spectral_fleet accept the
    factored (PermutedHamiltonian) forms: energies/tridiagonals match
    the single-device FTLM/recurrence on the same form."""
    from lanczosplusplus_tpu.engine.ftlm import ftlm
    from lanczosplusplus_tpu.models.tj_factored import build_factored_tj

    text = """
TotalNumberOfSites=8
NumberOfTerms=4
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.0
Model=TjMultiOrb
Orbitals=1
SolverOptions=none
TargetElectronsUp=3
TargetElectronsDown=3
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    basis = model.create_basis((3, 3))
    fact = build_factored_tj(model, basis)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    betas = np.asarray([0.5, 2.0])
    docc = np.arange(fact.dim, dtype=np.float64)  # flat-order diag op
    res_d = pmesh.distributed_ftlm(fact, mesh, betas, num_vectors=8,
                                   steps=30, seed=7,
                                   operators={"idx": docc})
    res_s = ftlm(fact, betas, num_vectors=8, steps=30, seed=7,
                 operators={"idx": docc})
    np.testing.assert_allclose(res_d.energy, res_s.energy,
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(res_d.observables["idx"],
                               res_s.observables["idx"],
                               rtol=1e-8, atol=1e-8)

    rng = np.random.default_rng(4)
    v0s = rng.standard_normal((2, fact.dim))
    v0s /= np.linalg.norm(v0s, axis=1, keepdims=True)
    got = pmesh.distributed_spectral_fleet(fact, mesh, v0s, steps=30)
    ref = lz.tridiagonalize_plain_batched(fact.inner,
                                          v0s[:, np.asarray(fact.perm)],
                                          30)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g.alphas[:g.m], r.alphas[:r.m],
                                   atol=1e-8)


def test_distributed_ftlm_dynamic_matches_single():
    """Row-sharded double-Krylov finite-T dynamics: same start block =>
    identical pole data vs the single-device estimator, source AND
    destination sectors sharded (VERDICT r3 item 8)."""
    from lanczosplusplus_tpu.engine.ftlm_dynamic import ftlm_dynamic
    from lanczosplusplus_tpu.engine.thermal import operator_matrix

    text = """
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
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    src = model.create_basis((2, 2))
    dst = model.create_basis((3, 2))
    ham_s = model.hamiltonian(src, dtype=np.float64)
    ham_d = model.hamiltonian(dst, dtype=np.float64)
    bmat = operator_matrix(model, "cdagger", 0, 0, 0, src, dst).T
    mesh = pmesh.make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(11)
    V0 = rng.standard_normal((ham_s.dim, 6))
    V0 /= np.linalg.norm(V0, axis=0)
    dyn_d = pmesh.distributed_ftlm_dynamic(
        ham_s, ham_d, lambda v: bmat @ v, mesh, steps=20,
        start_vectors=V0)
    dyn_s = ftlm_dynamic(ham_s, ham_d, lambda v: bmat @ v, steps=20,
                         start_vectors=V0)
    for beta in (0.5, 2.0):
        om_d, wt_d = dyn_d.poles(beta)
        om_s, wt_s = dyn_s.poles(beta)
        for k in range(3):
            assert (wt_d * om_d ** k).sum() == pytest.approx(
                (wt_s * om_s ** k).sum(), rel=1e-8, abs=1e-10)


def test_distributed_ftlm_dynamic_factored_form():
    """The sharded double-Krylov estimator unwraps PermutedHamiltonian
    sectors into block layout (flat-order apply callbacks unchanged)."""
    from lanczosplusplus_tpu.engine.ftlm_dynamic import ftlm_dynamic
    from lanczosplusplus_tpu.models import factored_hamiltonian_or_none

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
    basis = model.create_basis(model.default_parts(inp))
    fac = factored_hamiltonian_or_none(
        model, basis, model.default_parts(inp), np.float64)
    assert fac is not None and hasattr(fac, "perm")
    flat = model.hamiltonian(basis, dtype=np.float64)
    # sector-preserving "operator": a diagonal in flat order
    diag = np.linspace(-1.0, 1.0, basis.size)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(3)
    V0 = rng.standard_normal((basis.size, 4))
    V0 /= np.linalg.norm(V0, axis=0)
    dyn_d = pmesh.distributed_ftlm_dynamic(
        fac, fac, lambda v: diag * v, mesh, steps=16,
        start_vectors=V0)
    dyn_s = ftlm_dynamic(flat, flat, lambda v: diag * v, steps=16,
                         start_vectors=V0)
    for beta in (0.5, 3.0):
        om_d, wt_d = dyn_d.poles(beta)
        om_s, wt_s = dyn_s.poles(beta)
        for k in range(3):
            assert (wt_d * om_d ** k).sum() == pytest.approx(
                (wt_s * om_s ** k).sum(), rel=1e-7, abs=1e-9)


def test_grand_canonical_ftlm_mesh_matches_single():
    """GrandCanonicalFTLM(mesh=...) row-shards each large sector's FTLM
    recurrence; same seed => same estimates as the single-device sweep
    (VERDICT r3 item 8)."""
    from lanczosplusplus_tpu.engine.thermal import GrandCanonicalFTLM

    text = """
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
    inp = parse_input(text)
    model = build_model(inp, Geometry(inp))
    betas = [0.5, 2.0]
    mesh = pmesh.make_mesh(jax.devices()[:8])
    gf_d = GrandCanonicalFTLM(model, nsite=4, beta_grid=betas,
                              dense_cutoff=8, num_vectors=8, steps=24,
                              mesh=mesh)
    gf_s = GrandCanonicalFTLM(model, nsite=4, beta_grid=betas,
                              dense_cutoff=8, num_vectors=8, steps=24)
    for beta in betas:
        for mu in (0.0, 0.8):
            assert gf_d.energy(beta, mu) == pytest.approx(
                gf_s.energy(beta, mu), rel=1e-8)
            assert gf_d.density(beta, mu) == pytest.approx(
                gf_s.density(beta, mu), rel=1e-8)
            assert gf_d.log_partition(beta, mu) == pytest.approx(
                gf_s.log_partition(beta, mu), rel=1e-8)
            assert gf_d.specific_heat(beta, mu) == pytest.approx(
                gf_s.specific_heat(beta, mu), rel=1e-6, abs=1e-10)
