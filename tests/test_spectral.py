"""Spectral-function tests vs exact Lehmann representation.

Oracle: dense diagonalization of every sector plus independently
constructed fermion-operator matrices (Jordan-Wigner: up-string within
the up word; down operators cross all up electrons), mirroring the
reference's dense-oracle strategy (SURVEY.md section 4).
"""

import numpy as np
import pytest

from lanczosplusplus_tpu.io_.input_parser import parse_input
from lanczosplusplus_tpu.geometry import Geometry
from lanczosplusplus_tpu.models import build_model
from lanczosplusplus_tpu.engine import Engine
from lanczosplusplus_tpu.core.combinatorics import enumerate_combinations

TEXT = """
TotalNumberOfSites=4
NumberOfTerms=1
DegreesOfFreedom=1
GeometryKind=chain
GeometryOptions=ConstantValues
Connectors 1 -1.0
Model=HubbardOneBand
hubbardU 4
4 4 4 4
potentialV 8
0 0 0 0 0 0 0 0
SolverOptions=none
TargetElectronsUp=2
TargetElectronsDown=2
IsPeriodicX=0
"""


def sector_states(nsite, nup, ndown):
    ups = enumerate_combinations(nsite, nup).astype(int)
    dns = enumerate_combinations(nsite, ndown).astype(int)
    states = [(u, d) for d in dns for u in ups]  # up index fastest
    index = {s: k for k, s in enumerate(states)}
    return states, index


def c_matrix(nsite, src_parts, site, spin):
    """Dense c_{site,spin}: maps (nup,ndown) -> sector with one fewer."""
    nup, ndown = src_parts
    dst_parts = (nup - 1, ndown) if spin == 0 else (nup, ndown - 1)
    if min(dst_parts) < 0:
        return None, None
    src, _ = sector_states(nsite, *src_parts)
    _, dst_index = sector_states(nsite, *dst_parts)
    m = np.zeros((len(dst_index), len(src)))
    for k, (u, d) in enumerate(src):
        if spin == 0:
            if not (u >> site) & 1:
                continue
            sign = (-1) ** bin(u & ((1 << site) - 1)).count("1")
            m[dst_index[(u ^ (1 << site), d)], k] = sign
        else:
            if not (d >> site) & 1:
                continue
            sign = (-1) ** bin(d & ((1 << site) - 1)).count("1")
            sign *= (-1) ** bin(u).count("1")  # cross the up word
            m[dst_index[(u, d ^ (1 << site))], k] = sign
    return m, dst_parts


def lehmann_g(model, nsite, parts, isite, jsite, spin, omegas, delta):
    """G_ij + G_ji (the reference's off-diagonal symmetrization; for
    i == j just G_ii) from full spectra of the N+-1 sectors."""
    basis0 = model.create_basis(parts)
    h0 = model.hamiltonian(basis0).to_dense()
    e0s, v0s = np.linalg.eigh(h0)
    gs = v0s[:, 0]
    e0 = e0s[0]
    z = omegas + 1j * delta
    total = np.zeros_like(z, dtype=np.complex128)

    # particle part: c^dag into (nup+1)
    nup, ndown = parts
    if (nup + 1 if spin == 0 else ndown + 1) <= nsite:
        dst = (nup + 1, ndown) if spin == 0 else (nup, ndown + 1)
        bas = model.create_basis(dst)
        h = model.hamiltonian(bas).to_dense()
        es, vs = np.linalg.eigh(h)
        ci, _ = c_matrix(nsite, dst, isite, spin)   # c maps dst -> src
        cj, _ = c_matrix(nsite, dst, jsite, spin)
        cdag_i = ci.T   # src -> dst
        cdag_j = cj.T
        ai = vs.T @ (cdag_i @ gs)   # <n|c^dag_i|gs>
        aj = vs.T @ (cdag_j @ gs)
        for pair in ([(isite, jsite)] if isite == jsite
                     else [(isite, jsite), (jsite, isite)]):
            a_bra = ai if pair[0] == isite else aj
            a_ket = aj if pair[1] == jsite else ai
            for n in range(len(es)):
                total += a_bra[n] * a_ket[n] / (z - (es[n] - e0))

    # hole part: c into (nup-1)
    if (nup - 1 if spin == 0 else ndown - 1) >= 0:
        dst = (nup - 1, ndown) if spin == 0 else (nup, ndown - 1)
        if dst != (0, 0):
            bas = model.create_basis(dst)
            h = model.hamiltonian(bas).to_dense()
            es, vs = np.linalg.eigh(h)
            ci, _ = c_matrix(nsite, parts, isite, spin)
            cj, _ = c_matrix(nsite, parts, jsite, spin)
            bi = vs.T @ (ci @ gs)   # <m|c_i|gs>
            bj = vs.T @ (cj @ gs)
            for pair in ([(isite, jsite)] if isite == jsite
                         else [(isite, jsite), (jsite, isite)]):
                b_bra = bi if pair[0] == isite else bj
                b_ket = bj if pair[1] == jsite else bi
                for m in range(len(es)):
                    total += b_bra[m] * b_ket[m] / (z + (es[m] - e0))
    return total


@pytest.fixture(scope="module")
def engine():
    inp = parse_input(TEXT)
    geom = Geometry(inp)
    model = build_model(inp, geom)
    return Engine(model, inp)


def test_gf_diagonal_matches_lehmann(engine):
    omegas = np.linspace(-8, 8, 101)
    delta = 0.1
    coll, labels = engine.spectral_function("c", 0, 0, spin=0)
    got = coll.evaluate(omegas, delta)
    expect = lehmann_g(engine.model, 4, (2, 2), 0, 0, 0, omegas, delta)
    np.testing.assert_allclose(got, expect, atol=1e-8)
    # sum rule: integral of the diagonal spectral function = <{c, c^dag}> = 1
    dense_w = np.trapezoid(-got.imag / np.pi, omegas)
    assert dense_w == pytest.approx(1.0, abs=0.02)


def test_gf_offdiagonal_matches_lehmann(engine):
    omegas = np.linspace(-8, 8, 81)
    delta = 0.15
    coll, labels = engine.spectral_function("c", 0, 2, spin=0)
    got = coll.evaluate(omegas, delta)
    expect = lehmann_g(engine.model, 4, (2, 2), 0, 2, 0, omegas, delta)
    np.testing.assert_allclose(got, expect, atol=1e-8)


def test_gf_spin_down_matches_lehmann(engine):
    omegas = np.linspace(-6, 6, 61)
    delta = 0.2
    coll, labels = engine.spectral_function("c", 1, 1, spin=1)
    got = coll.evaluate(omegas, delta)
    expect = lehmann_g(engine.model, 4, (2, 2), 1, 1, 1, omegas, delta)
    np.testing.assert_allclose(got, expect, atol=1e-8)


def test_gf_batched_matches_lehmann_and_serial(engine):
    """spectral_functions_batched: one batched SpMM recurrence per
    destination sector must reproduce the serial per-pair CFs."""
    omegas = np.linspace(-8, 8, 81)
    delta = 0.12
    pairs = [(0, 0), (0, 2), (1, 1), (1, 3)]
    outs = engine.spectral_functions_batched("c", pairs, spin=0)
    assert len(outs) == len(pairs)
    for (i, j), (coll, labels) in zip(pairs, outs):
        got = coll.evaluate(omegas, delta)
        expect = lehmann_g(engine.model, 4, (2, 2), i, j, 0, omegas,
                           delta)
        np.testing.assert_allclose(got, expect, atol=1e-8)
        serial_coll, serial_labels = engine.spectral_function(
            "c", i, j, spin=0)
        assert labels == serial_labels
        np.testing.assert_allclose(
            got, serial_coll.evaluate(omegas, delta), atol=1e-8)


def test_gf_batched_complex_scalar():
    """Batched fleet with a complex ground state (useComplex)."""
    inp = parse_input(TEXT.replace("SolverOptions=none",
                                   "SolverOptions=useComplex"))
    geom = Geometry(inp)
    model = build_model(inp, geom)
    eng = Engine(model, inp)
    omegas = np.linspace(-6, 6, 41)
    pairs = [(0, 1), (2, 2)]
    outs = eng.spectral_functions_batched("c", pairs, spin=0)
    for (i, j), (coll, labels) in zip(pairs, outs):
        scoll, _ = eng.spectral_function("c", i, j, spin=0)
        np.testing.assert_allclose(coll.evaluate(omegas, 0.1),
                                   scoll.evaluate(omegas, 0.1),
                                   atol=1e-8)


def test_two_point_density_density(engine):
    """<n_i n_j> via two_point with op n against dense ground state."""
    res = engine.two_point("n", spin=(0, 0))
    basis = engine.basis
    ham = engine.hamiltonian
    dense = ham.to_dense()
    evals, evecs = np.linalg.eigh(dense)
    gs = evecs[:, 0]
    from lanczosplusplus_tpu.core import bits as B
    upw = basis.words_up(np.arange(basis.size))
    for i in range(4):
        for j in range(4):
            ni = B.get_bit(upw, i)
            nj = B.get_bit(upw, j)
            expect = np.sum(np.abs(gs) ** 2 * ni * nj)
            assert res[i, j] == pytest.approx(expect, abs=1e-8)


def test_sz_sz_two_point(engine):
    """two_point('sz') = <Sz_i Sz_j> with Sz = (n_up - n_down)/2."""
    res = engine.two_point("sz")
    basis = engine.basis
    dense = engine.hamiltonian.to_dense()
    evals, evecs = np.linalg.eigh(dense)
    gs = evecs[:, 0]
    from lanczosplusplus_tpu.core import bits as B
    idx = np.arange(basis.size)
    upw = basis.words_up(idx)
    dnw = basis.words_down(idx)
    for i in range(4):
        for j in range(4):
            szi = 0.5 * (B.get_bit(upw, i) - B.get_bit(dnw, i))
            szj = 0.5 * (B.get_bit(upw, j) - B.get_bit(dnw, j))
            expect = np.sum(np.abs(gs) ** 2 * szi * szj)
            assert res[i, j] == pytest.approx(expect, abs=1e-8)


def test_many_point_splus_sminus(engine):
    """<gs| S+_0 S-_1 |gs> via many_point vs dense."""
    got = engine.many_point([1, 0], ["splus", "sminus"], [0, 0], [0, 0])
    # order: applied right-to-left? manyPoint applies sites in order,
    # first listed first: here splus at 1 then sminus at 0 acting on ket
    basis = engine.basis
    dense = engine.hamiltonian.to_dense()
    evals, evecs = np.linalg.eigh(dense)
    gs = evecs[:, 0]
    # brute force S-_0 S+_1 |gs> ... construct via spin ops on states
    states, index = sector_states(4, 2, 2)
    acc = 0.0
    for k, (u, d) in enumerate(states):
        # apply S+_1: up empty at 1, down occupied at 1
        if ((u >> 1) & 1) == 0 and ((d >> 1) & 1) == 1:
            s1 = (-1) ** bin(u & 1).count("1") * \
                 (-1) ** bin(d & 1).count("1")
            u1, d1 = u ^ 2, d ^ 2
            # now S-_0: up occupied at 0, down empty at 0
            if ((u1 >> 0) & 1) == 1 and ((d1 >> 0) & 1) == 0:
                s2 = 1  # parity below site 0 is trivial
                u2, d2 = u1 ^ 1, d1 ^ 1
                acc += gs[index[(u2, d2)]] * s1 * s2 * gs[k]
    assert got == pytest.approx(acc, abs=1e-8)


def test_two_point_c_single_particle_dm(engine):
    """two_point('c'): <gs| c^dag_j c_i |gs> equals the one-particle
    density matrix from the dense ground state."""
    res = engine.two_point("c", spin=(0, 0))
    dense = engine.hamiltonian.to_dense()
    evals, evecs = np.linalg.eigh(dense)
    gs = evecs[:, 0]
    for i in range(4):
        for j in range(4):
            ci, dst = c_matrix(4, (2, 2), i, 0)
            cj, _ = c_matrix(4, (2, 2), j, 0)
            expect = np.vdot(cj @ gs, ci @ gs)
            assert res[i, j] == pytest.approx(expect, abs=1e-9)
