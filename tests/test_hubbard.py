"""Hubbard model golden tests.

Strategy mirrors the reference's built-in oracles (SURVEY.md section 4):
dense-diagonalization cross-checks (reference dumpmatrix path,
src/Engine/DefaultSymmetry.h:61-94) and analytic free-fermion values.
"""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine
from lanczosplusplus_tpu.solver import lanczos as lz

INPUT0 = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4
0 0 0 0
potentialV 8
0 0 0 0
0 0 0 0
SolverOptions=none
Version=version
OutputFile=data0
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""


def free_fermion_e0(nsite, nup, ndown, t=-1.0, periodic=False):
    """Analytic ground energy of U=0 Hubbard = filled single-particle
    levels of the hopping matrix."""
    h = np.zeros((nsite, nsite))
    for i in range(nsite - 1):
        h[i, i + 1] = h[i + 1, i] = t
    if periodic:
        h[0, nsite - 1] += t
        h[nsite - 1, 0] += t
    eps = np.linalg.eigvalsh(h)
    return eps[:nup].sum() + eps[:ndown].sum()


def make_engine(text):
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    return Engine(model, inp)


def test_input0_free_fermions():
    eng = make_engine(INPUT0)
    expect = free_fermion_e0(4, 2, 2)
    assert eng.ground_energy == pytest.approx(expect, abs=1e-10)
    assert eng.ground_energy == pytest.approx(-2 - 2 * np.sqrt(5) + 2,
                                              abs=1e-9)  # -4.472135955


def test_hamiltonian_hermitian_and_dense_oracle():
    inp = parse_input(INPUT0.replace("hubbardU 4\n0 0 0 0",
                                     "hubbardU 4\n4 4 4 4"))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    assert dense.shape == (36, 36)
    np.testing.assert_allclose(dense, dense.T.conj(), atol=1e-13)
    evals = np.linalg.eigvalsh(dense)
    # Lieb-Wu-style sanity: U>0 raises E0 above the free value
    assert evals[0] > free_fermion_e0(4, 2, 2)
    # matvec agrees with dense
    rng = np.random.default_rng(5)
    x = rng.standard_normal(36)
    np.testing.assert_allclose(np.asarray(ham.matvec(x)), dense @ x,
                               atol=1e-12)


def test_lanczos_matches_dense_medium():
    """8-site half-filled U=4 chain: Lanczos vs dense eigh."""
    text = """
TotalNumberOfSites=8
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 8
4 4 4 4 4 4 4 4
potentialV 16
0 0 0 0 0 0 0 0
0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=4
TargetElectronsDown=4
IsPeriodicX=1
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((4, 4))
    assert basis.size == 4900
    ham = model.hamiltonian(basis)
    evals, vecs = lz.lowest_states(ham, num_states=1, max_steps=120)
    dense = ham.to_dense()
    expect = np.linalg.eigvalsh(dense)[0]
    assert evals[0] == pytest.approx(expect, abs=1e-9)
    # residual of the Ritz vector
    v = np.asarray(vecs[0])
    r = np.linalg.norm(dense @ v - evals[0] * v)
    assert r < 1e-7


def test_super_hubbard_extended_dense_oracle():
    """SuperHubbardExtended: hopping + ninj + Heisenberg J, checked
    against dense diagonalization of the assembled matrix and against a
    brute-force operator construction."""
    text = """
TotalNumberOfSites=4
NumberOfTerms=3
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 0.7
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 1.3
Model=SuperHubbardExtended
hubbardU 4
2 2 2 2
potentialV 8
0.1 -0.2 0.3 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    ham = model.hamiltonian(basis)
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.T.conj(), atol=1e-13)
    brute = brute_force_hubbard(
        4, 2, 2, geom.coupling_matrix(0), np.full(4, 2.0),
        np.array([0.1, -0.2, 0.3, 0]),
        wmat=geom.coupling_matrix(1), jmat=geom.coupling_matrix(2))
    np.testing.assert_allclose(dense, brute, atol=1e-12)


def brute_force_hubbard(nsite, nup, ndown, tmat, u, v, wmat=None, jmat=None):
    """Independent O(4^n) construction in the full Fock space, projected
    onto the (nup, ndown) sector with the reference's state ordering."""
    from lanczosplusplus_tpu.core.combinatorics import enumerate_combinations

    def c_op(word, site):
        # returns (new_word, sign) or None; annihilate at site
        if not (word >> site) & 1:
            return None
        sign = (-1) ** bin(word & ((1 << site) - 1)).count("1")
        return word ^ (1 << site), sign

    def cdag_op(word, site):
        if (word >> site) & 1:
            return None
        sign = (-1) ** bin(word & ((1 << site) - 1)).count("1")
        return word ^ (1 << site), sign

    ups = list(enumerate_combinations(nsite, nup).astype(int))
    dns = list(enumerate_combinations(nsite, ndown).astype(int))
    dim = len(ups) * len(dns)
    index = {(u_, d_): k for k, (d_, u_) in
             enumerate((d_, u_) for d_ in dns for u_ in ups)}
    H = np.zeros((dim, dim))
    for (u_w, d_w), row in index.items():
        # diagonal
        diag = 0.0
        for i in range(nsite):
            nu_i = (u_w >> i) & 1
            nd_i = (d_w >> i) & 1
            diag += u[i] * nu_i * nd_i + v[i] * (nu_i + nd_i)
            for j in range(nsite):
                nu_j = (u_w >> j) & 1
                nd_j = (d_w >> j) & 1
                if wmat is not None:
                    diag += 0.5 * wmat[i, j] * (nu_i + nd_i) * (nu_j + nd_j)
                if jmat is not None:
                    diag += 0.5 * jmat[i, j] * 0.25 * (nu_i - nd_i) * \
                        (nu_j - nd_j)
        H[row, row] += diag
        # hopping: sum_ij t_ij c^dag_j c_i, both spins
        for i in range(nsite):
            for j in range(nsite):
                if tmat[i, j] == 0 or i == j:
                    continue
                r1 = c_op(u_w, i)
                if r1 is not None:
                    r2 = cdag_op(r1[0], j)
                    if r2 is not None:
                        col = index[(r2[0], d_w)]
                        H[col, row] += tmat[i, j] * r1[1] * r2[1]
                r1 = c_op(d_w, i)
                if r1 is not None:
                    r2 = cdag_op(r1[0], j)
                    if r2 is not None:
                        col = index[(u_w, r2[0])]
                        H[col, row] += tmat[i, j] * r1[1] * r2[1]
        # J exchange: (J_ij/2)(S+_i S-_j + S-_i S+_j) as fermion strings
        if jmat is not None:
            for i in range(nsite):
                for j in range(nsite):
                    if jmat[i, j] == 0 or i == j:
                        continue
                    # S+_i S-_j = c^dag_iu c_id  c^dag_jd c_ju
                    amps = 0.5 * jmat[i, j] * 0.5  # half for double count
                    r1 = c_op(u_w, j)
                    if r1 is None:
                        continue
                    r2 = cdag_op(d_w, j)
                    if r2 is None:
                        continue
                    r3 = c_op(r2[0], i)
                    if r3 is None:
                        continue
                    r4 = cdag_op(r1[0], i)
                    if r4 is None:
                        continue
                    # ordering: up string sign then down string sign
                    col = index[(r4[0], r3[0])]
                    H[col, row] += 2 * amps * r1[1] * r2[1] * r3[1] * r4[1]
    return H


def test_densified_factors_match_gather():
    inp = parse_input(INPUT0.replace("hubbardU 4\n0 0 0 0",
                                     "hubbardU 4\n4 4 4 4"))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    basis = model.create_basis((2, 2))
    ham = model.hamiltonian(basis)
    dense_ham = ham.densify_factors()
    assert dense_ham.factorized.up_dense is not None
    rng = np.random.default_rng(7)
    x = rng.standard_normal(basis.size)
    np.testing.assert_allclose(np.asarray(dense_ham.matvec(x)),
                               np.asarray(ham.matvec(x)), atol=1e-11)


def test_kane_mele_two_term_hoppings():
    """KaneMeleHubbard: hoppings are the sum of geometry terms 0 and 1
    (reference HubbardHelper.h:63-66)."""
    text = """
TotalNumberOfSites=4
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -0.25
Model=KaneMeleHubbard
hubbardU 4
2 2 2 2
potentialV 8
0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    np.testing.assert_allclose(model.hoppings,
                               geom.coupling_matrix(0) +
                               geom.coupling_matrix(1))
    eng = Engine(model, inp)
    # equivalent single-term model with t = -1.25
    text2 = INPUT0.replace("hubbardU 4\n0 0 0 0", "hubbardU 4\n2 2 2 2") \
        .replace("Connectors 1 -1.0", "Connectors 1 -1.25")
    inp2 = parse_input(text2)
    eng2 = Engine(build_model(inp2, Geometry(inp2)), inp2)
    assert eng.ground_energy == pytest.approx(eng2.ground_energy,
                                              abs=1e-10)


def test_kane_mele_complex_soc_hoppings():
    """Complex (imaginary) term-1 hoppings: hermitian H, U=0 free
    fermions match the single-particle spectrum of the complex hopping
    matrix."""
    text = """
TotalNumberOfSites=4
NumberOfTerms=2
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 (0.0,0.3)
Model=KaneMeleHubbard
hubbardU 4
0 0 0 0
potentialV 8
0 0 0 0 0 0 0 0
SolverOptions=useComplex
TargetElectronsUp=2
TargetElectronsDown=1
IsPeriodicX=0
"""
    inp = parse_input(text)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    t = model.hoppings
    assert np.iscomplexobj(t)
    np.testing.assert_allclose(t, t.conj().T, atol=1e-13)
    eng = Engine(model, inp)
    ham = eng.hamiltonian
    dense = ham.to_dense()
    np.testing.assert_allclose(dense, dense.conj().T, atol=1e-12)
    eps = np.linalg.eigvalsh(t)
    expect = eps[:2].sum() + eps[:1].sum()
    assert eng.ground_energy == pytest.approx(expect, abs=1e-9)


def test_bf16_factor_matvec_accuracy():
    """bfloat16-stored dense factors: matvec agrees with f32 to the
    bf16 quantization level and Ritz values track to ~1e-3."""
    import jax.numpy as jnp
    from lanczosplusplus_tpu.solver.lanczos import lowest_states

    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model as _bm
    text = """
TotalNumberOfSites=8
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 8 4 4 4 4 4 4 4 4
potentialV 16 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=4
TargetElectronsDown=4
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = _bm(inp, Geometry(inp))
    basis = model.create_basis((4, 4))
    ham32 = model.hamiltonian(basis, dtype=np.float32).densify_factors()
    ham16 = model.hamiltonian(basis, dtype=np.float32).densify_factors(
        factor_dtype=jnp.bfloat16)
    assert ham16.factorized.up_dense.dtype == jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ham32.dim).astype(np.float32))
    y32 = np.asarray(ham32.matvec(x))
    y16 = np.asarray(ham16.matvec(x))
    scale = np.abs(y32).max()
    assert np.abs(y16 - y32).max() < 2e-2 * scale
    # batched paths agree with single-vector bf16 path
    xb = jnp.stack([x, 2 * x], axis=1)
    np.testing.assert_allclose(np.asarray(ham16.matmat(xb))[:, 0], y16,
                               rtol=1e-6, atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(ham16.matmat_t(xb.T))[0], y16,
                               rtol=1e-6, atol=1e-6 * scale)
    e32, _ = lowest_states(ham32, max_steps=80)
    e16, _ = lowest_states(ham16, max_steps=80)
    assert abs(e16[0] - e32[0]) < 2e-3 * max(abs(e32[0]), 1.0)


def test_densified_factor_complex_state():
    """Real densified factors applied to a COMPLEX state must keep the
    imaginary part (regression: an unconditional astype in the
    mixed-precision path truncated complex -> real)."""
    import jax.numpy as jnp
    from lanczosplusplus_tpu.io_.input_parser import parse_input
    from lanczosplusplus_tpu.geometry import Geometry
    from lanczosplusplus_tpu.models import build_model as _bm
    text = """
TotalNumberOfSites=6
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 6 4 4 4 4 4 4
potentialV 12 0 0 0 0 0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=3
TargetElectronsDown=3
IsPeriodicX=1
"""
    inp = parse_input(text)
    model = _bm(inp, Geometry(inp))
    basis = model.create_basis((3, 3))
    ham = model.hamiltonian(basis, dtype=np.float64).densify_factors()
    rng = np.random.default_rng(4)
    psi = rng.standard_normal(ham.dim) + 1j * rng.standard_normal(ham.dim)
    dense = np.asarray(ham.to_dense())
    exact = dense @ psi
    got = np.asarray(ham.matvec(jnp.asarray(psi)))
    np.testing.assert_allclose(got, exact, atol=1e-10)
    got_b = np.asarray(ham.matmat(jnp.asarray(psi[:, None])))[:, 0]
    np.testing.assert_allclose(got_b, exact, atol=1e-10)
    got_t = np.asarray(ham.matmat_t(jnp.asarray(psi[None, :])))[0]
    np.testing.assert_allclose(got_t, exact, atol=1e-10)
    # time evolution through the densified Hamiltonian stays unitary
    from lanczosplusplus_tpu.engine.chebyshev_time import evolve
    psi0 = psi / np.linalg.norm(psi)
    out = evolve(ham, jnp.asarray(psi0), [1.5])
    assert np.linalg.norm(out[0]) == pytest.approx(1.0, abs=1e-9)
